#!/usr/bin/env bash
# CHiME-4 recipe (mirror of ref examples/chime4/s0/run.sh): en noisy/far-field ASR over WSJ reads.
# Data prep: kaldi-style data/{train,dev,test}/{wav.scp,text}
# (ref local/*_data_prep.sh beamformed channel), then the shared staged flow (cmvn -> dict -> lists ->
# train -> average -> decode -> WER).
cd "$(dirname "$0")"
bash ../../librispeech/s0/run.sh --tokenizer_type char \
  --train_config conf/train_conformer.yaml \
  --dir exp/conformer_chime4 "$@"
