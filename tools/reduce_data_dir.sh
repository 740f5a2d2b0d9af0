#!/usr/bin/env bash
# ref: tools/reduce_data_dir.sh <srcdir> <utt-list> <destdir>
[ $# -ne 3 ] && echo "usage: $0 <srcdir> <utt-list> <destdir>" >&2 && exit 1
exec python3 "$(dirname "$0")/data_dir.py" subset "$1" "$3" --utt_list "$2"
