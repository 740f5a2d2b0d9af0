#!/usr/bin/env bash
# OpenASR21 recipe (mirror of ref examples/openasr2021/s0/run.sh): low-resource constrained condition (10h per language).
# Data prep: kaldi-style data/{train,dev,test}/{wav.scp,text}
# (ref local/prepare_data.py over the NIST releases), then the shared staged flow (cmvn -> dict -> lists ->
# train -> average -> decode -> WER).
cd "$(dirname "$0")"
bash ../../librispeech/s0/run.sh --train_config conf/train_conformer_large_10h.yaml \
  --dir exp/conformer_large_10h "$@"
