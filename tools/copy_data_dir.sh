#!/usr/bin/env bash
# ref: tools/copy_data_dir.sh — forwards to the python data-dir utilities.
exec python3 "$(dirname "$0")/data_dir.py" copy "$@"
