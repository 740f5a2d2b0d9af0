#!/usr/bin/env bash
# Whisper LoRA finetune on AIShell-1
# (mirror of ref examples/aishell/whisper/run.sh). Convert weights first:
#   python -m wenet_tpu.models.whisper.convert --whisper_ckpt large-v3.pt \
#       --output_dir exp/whisper_init
cd "$(dirname "$0")"
bash ../s0/run.sh --train_config conf/finetune_whisper_largev3.yaml \
  --dir exp/whisper_ft --checkpoint exp/whisper_init/wenet_whisper \
  --decode_modes "attention" "$@"
