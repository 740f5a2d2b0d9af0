#!/usr/bin/env bash
# CLI-parity wrapper (ref local/aishell_data_prep.sh takes the same two
# positional args); the work happens in aishell_data_prep.py.
# usage: aishell_data_prep.sh <wav-dir> <transcript-dir-or-file>
set -eo pipefail
if [ $# -ne 2 ]; then
  echo "usage: $0 <.../data_aishell/wav> <.../data_aishell/transcript>" >&2
  exit 1
fi
wav_dir=$1
tr=$2
[ -d "$tr" ] && tr=$tr/aishell_transcript_v0.8.txt
python3 "$(dirname "$0")/aishell_data_prep.py" "$wav_dir" "$tr"
