#!/usr/bin/env bash
# aishell2 recipe (mirror of ref examples/aishell2/*/run.sh): same stage
# flow as examples/aishell/s0/run.sh — prepare kaldi-style
# data/{train,dev,test}/{wav.scp,text} for aishell2, then train the
# U2++ conformer (char for zh corpora, BPE flow from
# examples/librispeech/s0 for latin-script corpora).
cd "$(dirname "$0")"
bash ../../aishell/s0/run.sh --train_config ../../aishell/s0/conf/train_u2pp_conformer.yaml \
  --dir exp/u2pp_conformer_aishell2 "$@"
