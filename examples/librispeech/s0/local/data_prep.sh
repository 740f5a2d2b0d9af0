#!/usr/bin/env bash
# CLI-parity wrapper (ref local/data_prep.sh takes <src> <dst>).
set -eo pipefail
if [ $# -ne 2 ]; then
  echo "usage: $0 <.../LibriSpeech/part> <out-data-dir>" >&2
  exit 1
fi
python3 "$(dirname "$0")/data_prep.py" "$1" "$2"
