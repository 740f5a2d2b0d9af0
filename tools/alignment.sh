#!/usr/bin/env bash
# ref: tools/alignment.sh — CTC forced alignment over a data dir.
# usage: alignment.sh --dir exp/ --set_dir data/test [--gen_praat true]
dir=exp
set_dir=data/test
config=
checkpoint=
result=ali.res
gen_praat=false
. "$(dirname "$0")/parse_options.sh" || exit 1
[ -z "$config" ] && config=$dir/train.yaml
[ -z "$checkpoint" ] && checkpoint=$dir/final

ali_format=$dir/ali_format.data
python3 "$(dirname "$0")/make_raw_list.py" \
    "$set_dir/wav.scp" "$set_dir/text" "$ali_format"
praat_flag=""
[ "$gen_praat" = true ] && praat_flag="--gen_praat"
exec python3 -m wenet_tpu.bin.alignment \
    --config "$config" --checkpoint "$checkpoint" \
    --input_file "$ali_format" --result_file "$dir/$result" $praat_flag
