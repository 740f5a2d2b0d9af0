#!/usr/bin/env bash
# ref: tools/validate_data_dir.sh — forwards to the python data-dir utilities.
exec python3 "$(dirname "$0")/data_dir.py" validate "$@"
