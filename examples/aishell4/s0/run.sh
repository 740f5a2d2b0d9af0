#!/usr/bin/env bash
# AIShell-4 recipe (mirror of ref examples/aishell4/s0/run.sh): zh meeting ASR (8-mic far field, headset train channel).
# Data prep: kaldi-style data/{train,dev,test}/{wav.scp,text}
# (ref local/aishell4_*_data_prep.sh), then the shared staged flow (cmvn -> dict -> lists ->
# train -> average -> decode -> WER).
cd "$(dirname "$0")"
bash ../../aishell/s0/run.sh --train_config conf/train_u2pp_conformer.yaml \
  --dir exp/u2pp_conformer_aishell4 "$@"
