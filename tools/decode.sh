#!/usr/bin/env bash
# Runtime decode + WER harness (analog of ref tools/decode.sh for the
# C++ runtime): decodes a wav.scp with the serving AsrDecoder stack
# (same code path as the servers) and scores against a reference text.
# usage: decode.sh [--simulate_streaming] [--chunk_size N] \
#        <model_dir> <wav.scp> <ref_text> <out_dir>
set -eo pipefail
extra=()
while [[ $1 == --* ]]; do extra+=("$1"); [[ $1 == --simulate_streaming ]] || { extra+=("$2"); shift; }; shift; done
model_dir=$1; scp=$2; ref=$3; out=$4
mkdir -p $out
python -m wenet_tpu.bin.decoder_main --model_dir $model_dir \
  --wav_scp $scp --result_file $out/text "${extra[@]}"
python "$(dirname "$0")/compute_wer.py" --char 1 $ref $out/text > $out/wer
tail -n 8 $out/wer
