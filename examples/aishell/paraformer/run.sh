#!/usr/bin/env bash
# Paraformer AIShell-1 recipe: same stage flow as ../s0/run.sh with
# train_config=conf/train_paraformer.yaml (see that script for stages).
cd "$(dirname "$0")"
bash ../s0/run.sh --train_config conf/train_paraformer.yaml \
  --dir exp/paraformer --decode_modes "paraformer_greedy_search" "$@"
