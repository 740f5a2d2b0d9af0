#!/usr/bin/env bash
# WenetSpeech recipe (mirror of ref examples/wenetspeech/s0/run.sh):
# shard-mode UIO is mandatory at this scale (10k+ h); same stage flow
# as examples/aishell/s0/run.sh.
cd "$(dirname "$0")"
bash ../../aishell/s0/run.sh --data_type shard \
  --train_config conf/train_u2pp_conformer.yaml \
  --dir exp/u2pp_conformer_wenetspeech "$@"
