#!/usr/bin/env bash
# ref: tools/wav_to_duration.sh — split the wav scp, calculate duration
# in parallel with tools/wav2dur.py, merge.
nj=4
. "$(dirname "$0")/parse_options.sh" || exit 1

inscp=$1
outscp=$2
data=$(dirname "${inscp}")
if [ $# -eq 3 ]; then logdir=$3; else logdir=${data}/log; fi
mkdir -p "${logdir}"

rm -f "$logdir"/wav_*.slice "$logdir"/wav_*.shape
split --additional-suffix .slice -d -n l/$nj "$inscp" "$logdir/wav_"

for slice in "$logdir"/wav_*.slice; do
{
    name=$(basename -s .slice "$slice")
    python3 "$(dirname "$0")/wav2dur.py" "$slice" "$logdir/$name.shape" \
        > "$logdir/$name.log"
} &
done
wait
cat "$logdir"/wav_*.shape > "$outscp"
