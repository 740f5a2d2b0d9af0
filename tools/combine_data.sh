#!/usr/bin/env bash
# ref: tools/combine_data.sh — forwards to the python data-dir utilities.
exec python3 "$(dirname "$0")/data_dir.py" combine "$@"
