#!/usr/bin/env bash
# ref: tools/subset_data_dir.sh [--first|--last|--utt-list <f>] <src> [N] <dst>
mode=""
utt_list=""
case "$1" in
  --first) mode=--first; shift ;;
  --last)  mode=--last; shift ;;
  --utt-list) utt_list=$2; shift 2 ;;
esac
if [ -n "$utt_list" ]; then
  [ $# -ne 2 ] && echo "usage: $0 --utt-list <f> <src> <dst>" >&2 && exit 1
  exec python3 "$(dirname "$0")/data_dir.py" subset "$1" "$2" --utt_list "$utt_list"
fi
[ $# -ne 3 ] && echo "usage: $0 [--first|--last] <src> <N> <dst>" >&2 && exit 1
exec python3 "$(dirname "$0")/data_dir.py" subset "$1" "$3" --n "$2" $mode
