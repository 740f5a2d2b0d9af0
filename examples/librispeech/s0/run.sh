#!/usr/bin/env bash
# LibriSpeech recipe (wenet_tpu). Mirror of ref examples/librispeech/s0/run.sh.
# BPE english flow: spm train/encode -> lists -> train -> decode -> WER.
set -eo pipefail

# repo root: tools and the wenet_tpu package are resolved from here, so
# the recipe runs from any cwd
WENET_DIR=$(cd "$(dirname "$0")/../../.." && pwd)
export PYTHONPATH=$WENET_DIR${PYTHONPATH:+:$PYTHONPATH}

stage=0
stop_stage=5
data=/export/data/LibriSpeech
data_type=raw
train_set=train_960
dev_set=dev
test_sets="test_clean test_other"
train_config=conf/train_conformer_bpe.yaml
dir=exp/conformer_bpe
bpe_size=5000
tokenizer_type=bpe         # bpe | char (char-dict corpora: wsj/chime4/...)
average_num=30
decode_modes="ctc_greedy_search ctc_prefix_beam_search attention attention_rescoring"

. $WENET_DIR/tools/parse_options.sh
LOCAL_DIR=$(cd "$(dirname "$0")/local" && pwd)
data_url=https://www.openslr.org/resources/12

if [ ${stage} -le -1 ] && [ ${stop_stage} -ge -1 ]; then
  echo "stage -1: download LibriSpeech parts"
  mkdir -p $data
  for part in dev-clean test-clean dev-other test-other \
              train-clean-100 train-clean-360 train-other-500; do
    $LOCAL_DIR/download_and_untar.sh $data $data_url $part
  done
fi

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "stage 0: data preparation (flac is decoded natively — no"
  echo "         conversion pass; runtime/cpp/flac_decoder.cc)"
  if [ -d $data/LibriSpeech ]; then
    for part in $(ls $data/LibriSpeech | grep -v '\.'); do
      [ -d $data/LibriSpeech/$part ] && \
        $LOCAL_DIR/data_prep.sh $data/LibriSpeech/$part \
          data/$(echo $part | tr '-' '_')
    done
    # train_960 = the three train parts; dev = dev_clean + dev_other
    if [ -f data/train_clean_100/wav.scp ] && \
       [ -f data/train_clean_360/wav.scp ] && \
       [ -f data/train_other_500/wav.scp ]; then
      mkdir -p data/${train_set}
      for f in wav.scp text; do
        cat data/train_clean_100/$f data/train_clean_360/$f \
          data/train_other_500/$f | sort > data/${train_set}/$f
      done
    fi
    if [ -f data/dev_clean/wav.scp ] && [ -f data/dev_other/wav.scp ]
    then
      mkdir -p data/${dev_set}
      for f in wav.scp text; do
        cat data/dev_clean/$f data/dev_other/$f | sort \
          > data/${dev_set}/$f
      done
    fi
  fi
  for x in ${train_set} ${dev_set} ${test_sets}; do
    [ -f data/$x/wav.scp ] || { echo "missing data/$x/wav.scp (run \
stage -1, or place kaldi-style files)"; exit 1; }
  done
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: global cmvn"
  python $WENET_DIR/tools/compute_cmvn_stats.py --num_workers 8 \
    --train_config $train_config \
    --in_scp data/${train_set}/wav.scp \
    --out_cmvn data/${train_set}/global_cmvn
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ] && \
   [ "$tokenizer_type" = "char" ]; then
  echo "stage 2: make char dict"
  mkdir -p data/dict
  python $WENET_DIR/tools/text2token.py -s 1 -n 1 data/${train_set}/text \
    | cut -f 2- -d" " | tr " " "\n" | sort | uniq \
    | grep -a -v -e '^\s*$' \
    | awk '{print $0 " " NR+1}' > data/dict/lang_char_tmp.txt
  { echo "<blank> 0"; echo "<unk> 1"; cat data/dict/lang_char_tmp.txt; \
    echo "<sos/eos> $(( $(wc -l < data/dict/lang_char_tmp.txt) + 2 ))"; } \
    > data/dict/lang_char.txt
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ] && \
   [ "$tokenizer_type" = "bpe" ]; then
  echo "stage 2: train BPE model + units"
  mkdir -p data/lang_char
  cut -f 2- -d" " data/${train_set}/text > data/lang_char/input.txt
  python $WENET_DIR/tools/spm_train.py --input=data/lang_char/input.txt \
    --vocab_size=${bpe_size} --model_type=unigram \
    --model_prefix=data/lang_char/train_960_unigram${bpe_size} \
    --input_sentence_size=100000000
  python $WENET_DIR/tools/spm_encode.py \
    --model=data/lang_char/train_960_unigram${bpe_size}.model \
    --output_format=piece < data/lang_char/input.txt | tr ' ' '\n' | \
    sort | uniq | grep -a -v -e '^\s*$' \
    | awk '{print $0 " " NR+1}' \
    > data/lang_char/units_tmp.txt
  { echo "<blank> 0"; echo "<unk> 1"; cat data/lang_char/units_tmp.txt; \
    echo "<sos/eos> $(( $(wc -l < data/lang_char/units_tmp.txt) + 2 ))"; } \
    > data/lang_char/train_960_unigram${bpe_size}_units.txt
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "stage 3: data lists"
  for x in ${train_set} ${dev_set} ${test_sets}; do
    if [ $data_type == "shard" ] && [ $x == "${train_set}" ]; then
      python $WENET_DIR/tools/make_shard_list.py --num_utts_per_shard 1000 \
        --num_threads 16 data/$x/wav.scp data/$x/text \
        $(realpath data/$x/shards) data/$x/data.list
    else
      python $WENET_DIR/tools/make_raw_list.py data/$x/wav.scp \
        data/$x/text data/$x/data.list
    fi
  done
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "stage 4: train"
  mkdir -p $dir
  python -m wenet_tpu.bin.train --config $train_config \
    --data_type $data_type \
    --train_data data/${train_set}/data.list \
    --cv_data data/${dev_set}/data.list \
    --model_dir $dir --mesh "data=-1"
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "stage 5: average + decode + WER"
  python -m wenet_tpu.bin.average_model --dst_model $dir/avg_${average_num} \
    --src_path $dir --num ${average_num} --val_best
  for t in ${test_sets}; do
    python -m wenet_tpu.bin.recognize --config $dir/train.yaml \
      --checkpoint $dir/avg_${average_num} \
      --test_data data/$t/data.list \
      --modes ${decode_modes} --result_dir $dir/$t
    for mode in ${decode_modes}; do
      python $WENET_DIR/tools/compute_wer.py --char=0 data/$t/text \
        $dir/$t/$mode/text > $dir/$t/$mode/wer
    done
  done
fi
