#!/usr/bin/env bash
# Switchboard recipe (mirror of ref examples/swbd/s0/run.sh): en conversational telephony (8k upsampled to 16k).
# Data prep: kaldi-style data/{train,dev,test}/{wav.scp,text}
# (ref local/swbd1_data_prep.sh + eval2000), then the shared staged flow (cmvn -> dict -> lists ->
# train -> average -> decode -> WER).
cd "$(dirname "$0")"
bash ../../librispeech/s0/run.sh --tokenizer_type char \
  --train_config conf/train_conformer.yaml \
  --dir exp/conformer_swbd "$@"
