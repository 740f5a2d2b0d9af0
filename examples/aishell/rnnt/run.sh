#!/usr/bin/env bash
# Transducer AIShell-1 recipe (mirror of ref examples/aishell/rnnt/run.sh).
cd "$(dirname "$0")"
bash ../s0/run.sh --train_config conf/train_u2pp_transducer.yaml \
  --dir exp/u2pp_transducer \
  --decode_modes "rnnt_greedy_search ctc_greedy_search attention_rescoring" "$@"
