#!/usr/bin/env bash
# AIShell-1 recipe (wenet_tpu). Mirror of ref examples/aishell/s0/run.sh.
# Stages: -1 download -> 0 data prep -> 1 cmvn -> 2 dict -> 3 lists ->
#         4 train -> 5 average+decode+score -> 6 export ->
#         7 LM+TLG+runtime decode -> 8 k2 HLG decode -> 9 LF-MMI prep
set -eo pipefail

# repo root: tools and the wenet_tpu package are resolved from here, so
# the recipe runs from any cwd
WENET_DIR=$(cd "$(dirname "$0")/../../.." && pwd)
LOCAL_DIR=$(cd "$(dirname "$0")/local" && pwd)
export PYTHONPATH=$WENET_DIR${PYTHONPATH:+:$PYTHONPATH}

stage=0
stop_stage=5
data=/export/data/asr-data/OpenSLR/33/
data_url=https://www.openslr.org/resources/33
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
dict=data/dict/lang_char.txt

. $WENET_DIR/tools/parse_options.sh

if [ ${stage} -le -1 ] && [ ${stop_stage} -ge -1 ]; then
  echo "stage -1: download corpus (ref run.sh:58-63)"
  mkdir -p $data
  $LOCAL_DIR/download_and_untar.sh $data $data_url data_aishell
  $LOCAL_DIR/download_and_untar.sh $data $data_url resource_aishell
fi

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "stage 0: data preparation"
  if [ -d $data/data_aishell/wav ]; then
    $LOCAL_DIR/aishell_data_prep.sh $data/data_aishell/wav \
      $data/data_aishell/transcript
  fi
  for x in ${train_set} ${dev_set} ${test_sets}; do
    [ -f data/$x/wav.scp ] || { echo "missing data/$x/wav.scp (run \
stage -1 with a corpus mirror, or place kaldi-style files)"; exit 1; }
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

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  echo "stage 6: export the averaged model (ref run.sh:216-223)"
  python -m wenet_tpu.bin.export_model \
    --config $dir/train.yaml \
    --checkpoint $dir/avg_${average_num} \
    --output_dir $dir/export
  # the serving stack (decoder_main/servers, stage 7.4) loads
  # $dir/final — point it at the averaged model, the analog of the
  # ref's exported final.zip being the averaged checkpoint
  ln -sfn avg_${average_num} $dir/final
fi

# Optionally, add a word LM and decode through the serving runtime
# with TLG (ref run.sh:226-255).
if [ ${stage} -le 7 ] && [ ${stop_stage} -ge 7 ]; then
  echo "stage 7: LM + TLG + runtime WFST decode"
  # 7.1 prepare dict: model units + word lexicon over those units
  mkdir -p data/local/dict
  cp $dict data/local/dict/units.txt
  lexicon=$data/resource_aishell/lexicon.txt
  # without the OpenSLR resource tarball, fall back to the corpus
  # vocabulary with char spellings (every aishell word is spellable
  # in model units)
  if [ ! -f $lexicon ]; then
    echo "  (no resource_aishell/lexicon.txt; deriving a char-spelled"
    echo "   lexicon from the training transcripts)"
    lexicon=data/local/dict/raw_lexicon.txt
    python3 -c "
import sys
words = set()
with open('data/${train_set}/text', encoding='utf-8') as f:
    for line in f:
        words.update(line.split()[1:])
with open('$lexicon', 'w', encoding='utf-8') as f:
    for w in sorted(words):
        f.write(w + ' ' + ' '.join(w) + '\n')
"
  fi
  python $WENET_DIR/tools/fst/prepare_dict.py data/local/dict/units.txt \
    $lexicon data/local/dict/lexicon.txt
  # 7.2 train the word 3-gram on the training transcripts
  mkdir -p data/local/lm
  cp data/${train_set}/text data/local/lm/text
  $LOCAL_DIR/aishell_train_lms.sh data/local/lm/text \
    data/local/dict/lexicon.txt
  # 7.3 build the decoding TLG
  $WENET_DIR/tools/fst/make_tlg.sh data/local/dict \
    data/local/lm/lm.arpa data/lang_test
  cp data/local/dict/units.txt data/lang_test/
  # 7.4 decode with the serving runtime (same stack as the servers)
  $WENET_DIR/tools/decode.sh \
    --fst_path data/lang_test/TLG.txt \
    --dict_path data/lang_test/words.txt \
    --beam_size 10 \
    $dir data/test/wav.scp data/test/text $dir/lm_with_runtime
  tail -n 3 $dir/lm_with_runtime/wer || true
fi

# Optionally, decode with k2-style HLG (ref run.sh:257-302).
if [ ${stage} -le 8 ] && [ ${stop_stage} -ge 8 ]; then
  echo "stage 8: HLG build + hlg_onebest / hlg_rescore decode"
  if [ ! -f data/local/lm/lm.arpa ]; then
    echo "run stage 7 first (dict + lm)"; exit 1
  fi
  if [ ! -f data/local/hlg/HLG.txt ]; then
    $WENET_DIR/tools/k2/make_hlg.sh data/local/dict \
      data/local/lm/lm.arpa data/local/hlg
  fi
  lm_scale=0.7
  decoder_scale=0.1
  r_decoder_scale=0.7
  for test in ${test_sets}; do
    python -m wenet_tpu.bin.recognize \
      --config $dir/train.yaml \
      --data_type raw \
      --test_data data/$test/data.list \
      --checkpoint $dir/avg_${average_num} \
      --beam_size 10 --batch_size 16 \
      --hlg data/local/hlg/HLG.txt \
      --word data/local/hlg/words.txt \
      --lm_scale $lm_scale --decoder_scale $decoder_scale \
      --r_decoder_scale $r_decoder_scale \
      --result_dir $dir/$test \
      --modes hlg_onebest hlg_rescore
    for mode in hlg_onebest hlg_rescore; do
      python $WENET_DIR/tools/compute_wer.py --char=1 --v=1 \
        data/$test/text $dir/$test/$mode/text \
        > $dir/$test/$mode/wer
    done
  done
fi

# Optionally, prepare LF-MMI training with the k2-analog pipeline
# (ref run.sh:304-314).
if [ ${stage} -le 9 ] && [ ${stop_stage} -ge 9 ]; then
  echo "stage 9: LF-MMI preparation"
  # 9.1 token-level denominator graph from the training transcripts
  python $WENET_DIR/tools/k2/prepare_mmi.py $dict \
    data/${train_set}/text data/local/lfmmi
  # 9.2 LF-MMI training = stage 4 with the k2 model config:
  #   --override_config model=k2_model \
  #   --override_config model_conf.lfmmi_dir=data/local/lfmmi
  # 9.3 decode via the stage-8 HLG flow
  echo "  wrote data/local/lfmmi; re-run stage 4 with"
  echo "  model=k2_model model_conf.lfmmi_dir=data/local/lfmmi"
fi
