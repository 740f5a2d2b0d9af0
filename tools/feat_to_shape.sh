#!/usr/bin/env bash
# ref: tools/feat_to_shape.sh — usage: feat_to_shape.sh <in-scp> <out-scp>
exec python3 "$(dirname "$0")/feat_to_shape.py" "$@"
