#!/usr/bin/env bash
# WSJ recipe (mirror of ref examples/wsj/s0/run.sh): en read news (si284/dev93/eval92).
# Data prep: kaldi-style data/{train,dev,test}/{wav.scp,text}
# (ref local/wsj_data_prep.sh + normalization), then the shared staged flow (cmvn -> dict -> lists ->
# train -> average -> decode -> WER).
cd "$(dirname "$0")"
bash ../../librispeech/s0/run.sh --tokenizer_type char \
  --train_config conf/train_conformer.yaml \
  --dir exp/conformer_wsj "$@"
