#!/usr/bin/env bash
# LibriSpeech RNN-T recipe (mirror of ref examples/librispeech/rnnt/run.sh): conformer transducer with attention/ctc auxiliary losses.
# Data prep: kaldi-style data/{train,dev,test}/{wav.scp,text}
# (same prep as examples/librispeech/s0), then the shared staged flow (cmvn -> dict -> lists ->
# train -> average -> decode -> WER).
cd "$(dirname "$0")"
bash ../s0/run.sh --train_config conf/conformer_rnnt.yaml \
  --dir exp/conformer_rnnt "$@"
