#!/usr/bin/env bash
# Noisy-student training loop (analog of ref examples/aishell/NST/run_nst.sh):
#   teacher decodes unlabeled wavs twice (ctc greedy + attn rescoring),
#   agreement-filtered pseudo labels join the supervised list, student
#   retrains; iterate.
set -eo pipefail

# repo root: tools and the wenet_tpu package are resolved from here, so
# the recipe runs from any cwd
WENET_DIR=$(cd "$(dirname "$0")/../../.." && pwd)
export PYTHONPATH=$WENET_DIR${PYTHONPATH:+:$PYTHONPATH}
cd "$(dirname "$0")"

iterations=3
teacher_dir=exp/u2pp_conformer         # initial supervised model
unsup_scp=data/unsup/wav.scp
sup_list=data/train/data.list
train_config=../s0/conf/train_u2pp_conformer.yaml
max_cer=0.1

for it in $(seq 1 $iterations); do
  out=exp/nst_iter${it}
  mkdir -p $out/pseudo
  echo "NST iter $it: pseudo-label with $teacher_dir"
  python -m wenet_tpu.bin.recognize --config $teacher_dir/train.yaml \
    --checkpoint $teacher_dir/final \
    --test_data <(python $WENET_DIR/tools/make_raw_list.py $unsup_scp \
                  /dev/null /dev/stdout) \
    --modes ctc_greedy_search attention_rescoring \
    --result_dir $out/pseudo
  python $WENET_DIR/tools/nst/filter_pseudo_labels.py \
    --hyp_a $out/pseudo/ctc_greedy_search/text \
    --hyp_b $out/pseudo/attention_rescoring/text \
    --wav_scp $unsup_scp --max_cer $max_cer \
    --out_list $out/pseudo/data.list
  cat $sup_list $out/pseudo/data.list | shuf > $out/train.list
  echo "NST iter $it: train student"
  python -m wenet_tpu.bin.train --config $train_config \
    --train_data $out/train.list --cv_data data/dev/data.list \
    --model_dir $out --mesh "data=-1"
  teacher_dir=$out
done
