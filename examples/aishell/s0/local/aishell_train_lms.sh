#!/usr/bin/env bash
# Train the word 3-gram for TLG decoding.  Analog of ref
# local/aishell_train_lms.sh (kaldi_lm train_lm.sh there); here the
# from-scratch trainer tools/train_lm.py (interpolated Witten-Bell ->
# backoff ARPA) does the estimation — no kaldi_lm.
#
# inputs:  data/local/lm/text          (utt-id + word-segmented text)
#          data/local/dict/lexicon.txt (vocabulary: first column)
# outputs: data/local/lm/lm.arpa
set -eo pipefail

text=${1:-data/local/lm/text}
lexicon=${2:-data/local/dict/lexicon.txt}
dir=$(dirname $text)
[ -f $text ] || { echo "$0: no such file $text" >&2; exit 1; }
[ -f $lexicon ] || { echo "$0: no such file $lexicon" >&2; exit 1; }

WENET_DIR=$(cd "$(dirname "$0")/../../../.." && pwd)
python3 $WENET_DIR/tools/train_lm.py \
  --text $text --vocab $lexicon --order 3 --out $dir/lm.arpa
echo "$0: wrote $dir/lm.arpa"
