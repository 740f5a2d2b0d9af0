#!/usr/bin/env bash
# VKW2021 recipe (mirror of ref examples/vkw2021/s0/run.sh): zh video keyword search: ASR training + keyword FST scoring.
# Data prep: kaldi-style data/{train,dev,test}/{wav.scp,text}
# (ref local/make_list.py over lgv/liv/stv sets), then the shared staged flow (cmvn -> dict -> lists ->
# train -> average -> decode -> WER -> keyword search via tools/fst + runtime wfst decoder).
cd "$(dirname "$0")"
bash ../../aishell/s0/run.sh --train_config conf/train_bidirect_conformer.yaml \
  --dir exp/bidirect_conformer_vkw "$@"
