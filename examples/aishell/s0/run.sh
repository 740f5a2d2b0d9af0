#!/usr/bin/env bash
# AIShell-1 recipe (wenet_tpu). Mirror of ref examples/aishell/s0/run.sh.
# Stages: data prep -> cmvn -> dict -> lists -> train -> average ->
#         decode -> score
set -eo pipefail

# repo root: tools and the wenet_tpu package are resolved from here, so
# the recipe runs from any cwd
WENET_DIR=$(cd "$(dirname "$0")/../../.." && pwd)
export PYTHONPATH=$WENET_DIR${PYTHONPATH:+:$PYTHONPATH}

stage=0
stop_stage=5
data=/export/data/asr-data/OpenSLR/33/
data_type=raw              # raw or shard
train_set=train
dev_set=dev
test_sets=test
train_config=conf/train_u2pp_conformer.yaml
dir=exp/u2pp_conformer
checkpoint=
mesh="data=-1"             # all local devices on the data axis
average_num=30
decode_modes="ctc_greedy_search ctc_prefix_beam_search attention attention_rescoring"

. $WENET_DIR/tools/parse_options.sh

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "stage 0: data preparation (expects kaldi-style wav.scp/text per set)"
  for x in ${train_set} ${dev_set} ${test_sets}; do
    [ -f data/$x/wav.scp ] || { echo "missing data/$x/wav.scp"; exit 1; }
  done
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: compute global cmvn"
  python $WENET_DIR/tools/compute_cmvn_stats.py --num_workers 8 \
    --train_config $train_config \
    --in_scp data/${train_set}/wav.scp \
    --out_cmvn data/${train_set}/global_cmvn
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "stage 2: make dict"
  mkdir -p data/dict
  python $WENET_DIR/tools/text2token.py -s 1 -n 1 data/${train_set}/text \
    | cut -f 2- -d" " | tr " " "\n" | sort | uniq | grep -a -v -e '^\s*$' \
    | awk '{print $0 " " NR+1}' > data/dict/lang_char_tmp.txt
  { echo "<blank> 0"; echo "<unk> 1"; cat data/dict/lang_char_tmp.txt; \
    echo "<sos/eos> $(( $(wc -l < data/dict/lang_char_tmp.txt) + 2 ))"; } \
    > data/dict/lang_char.txt
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "stage 3: prepare data lists"
  for x in ${train_set} ${dev_set} ${test_sets}; do
    if [ $data_type == "shard" ] && [ $x == "${train_set}" ]; then
      python $WENET_DIR/tools/make_shard_list.py --num_utts_per_shard 1000 \
        --num_threads 16 data/$x/wav.scp data/$x/text \
        $(realpath data/$x/shards) data/$x/data.list
    else
      python $WENET_DIR/tools/make_raw_list.py data/$x/wav.scp data/$x/text \
        data/$x/data.list
    fi
  done
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "stage 4: train"
  mkdir -p $dir
  python -m wenet_tpu.bin.train \
    --config $train_config \
    --data_type $data_type \
    --train_data data/${train_set}/data.list \
    --cv_data data/${dev_set}/data.list \
    ${checkpoint:+--checkpoint $checkpoint} \
    --model_dir $dir \
    --mesh $mesh
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "stage 5: average + decode + score"
  python -m wenet_tpu.bin.average_model \
    --dst_model $dir/avg_${average_num} \
    --src_path $dir --num ${average_num} --val_best
  for test in ${test_sets}; do
    python -m wenet_tpu.bin.recognize \
      --config $dir/train.yaml \
      --data_type raw \
      --test_data data/$test/data.list \
      --checkpoint $dir/avg_${average_num} \
      --beam_size 10 --batch_size 16 \
      --ctc_weight 0.3 --reverse_weight 0.5 \
      --result_dir $dir/$test \
      --modes $decode_modes
    for mode in $decode_modes; do
      python $WENET_DIR/tools/compute_wer.py --char=1 --v=1 \
        data/$test/text $dir/$test/$mode/text \
        > $dir/$test/$mode/wer
    done
  done
fi
