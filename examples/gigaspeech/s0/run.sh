#!/usr/bin/env bash
# GigaSpeech recipe (mirror of ref examples/gigaspeech/s0/run.sh):
# BPE english flow, shard-mode UIO; stages as examples/librispeech/s0.
cd "$(dirname "$0")"
bash ../../librispeech/s0/run.sh --data_type shard \
  --train_config conf/train_conformer_bpe.yaml \
  --dir exp/conformer_bpe_gigaspeech "$@"
