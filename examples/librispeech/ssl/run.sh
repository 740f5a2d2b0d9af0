#!/usr/bin/env bash
# BEST-RQ self-supervised pretraining from UNTRANSCRIBED audio.
# Analog of the reference ssl flow (wenet/models/ssl/init_dataset.py):
# data.list entries need only {key, wav} — no transcripts, no tokenizer.
set -eo pipefail

WENET_DIR=$(cd "$(dirname "$0")/../../.." && pwd)
export PYTHONPATH=$WENET_DIR${PYTHONPATH:+:$PYTHONPATH}

stage=0
stop_stage=2
data=/export/data/LibriSpeech      # any directory tree of wav/flac
train_config=conf/train_bestrq.yaml
dir=exp/bestrq
mesh="data=-1"

. $WENET_DIR/tools/parse_options.sh

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "stage 0: wav-only data.list (no transcripts needed)"
  mkdir -p data/train_ssl data/dev_ssl
  # wav.scp -> {"key":..., "wav":...} json lines; text is NOT required
  python $WENET_DIR/tools/make_raw_list.py --wav_only \
    data/train_ssl/wav.scp data/train_ssl/data.list
  python $WENET_DIR/tools/make_raw_list.py --wav_only \
    data/dev_ssl/wav.scp data/dev_ssl/data.list
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: BEST-RQ pretraining"
  mkdir -p $dir
  python $WENET_DIR/wenet_tpu/bin/train.py \
    --config $train_config \
    --data_type raw \
    --train_data data/train_ssl/data.list \
    --cv_data data/dev_ssl/data.list \
    --model_dir $dir \
    --mesh $mesh
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "stage 2: fine-tune an ASR model from the pretrained encoder"
  echo "  (use --checkpoint $dir/final with an asr train config whose"
  echo "   encoder matches; encoder weights transfer by name)"
fi
