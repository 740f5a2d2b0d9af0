#!/usr/bin/env bash
# TIMIT recipe (mirror of ref examples/timit/s0/run.sh): phone recognition (39-phone scoring).
# Data prep: kaldi-style data/{train,dev,test}/{wav.scp,text}
# (ref local/timit_data_prep.sh + phone map), then the shared staged flow (cmvn -> dict -> lists ->
# train -> average -> decode -> WER).
cd "$(dirname "$0")"
bash ../../librispeech/s0/run.sh --tokenizer_type char \
  --train_config conf/train_conformer.yaml \
  --dir exp/conformer_timit "$@"
