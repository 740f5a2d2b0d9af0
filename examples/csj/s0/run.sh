#!/usr/bin/env bash
# CSJ recipe (mirror of ref examples/csj/s0/run.sh): ja Corpus of Spontaneous Japanese.
# Data prep: kaldi-style data/{train,dev,test}/{wav.scp,text}
# (ref local/csj_data_prep.sh), then the shared staged flow (cmvn -> dict -> lists ->
# train -> average -> decode -> WER).
cd "$(dirname "$0")"
bash ../../aishell/s0/run.sh --train_config conf/train_conformer.yaml \
  --dir exp/conformer_csj "$@"
