#!/usr/bin/env python3
"""Compute kaldi-compatible fbank features for a wav.scp and write them
as a kaldi ark/scp pair.

ref: tools/compute_fbank_feats.py (torchaudio.compliance.kaldi.fbank →
kaldi_io ark/scp); here the features come from wenet_tpu.ops.fbank (the
same numerics the training pipeline uses) and the ark/scp writer is
wenet_tpu.dataset.kaldi_io.write_ark_scp.

Usage:
    python tools/compute_fbank_feats.py --num_mel_bins 80 \
        wav.scp feats.ark feats.scp
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description='compute fbank features')
    parser.add_argument('--num_mel_bins', type=int, default=80)
    parser.add_argument('--frame_length', type=float, default=25.0)
    parser.add_argument('--frame_shift', type=float, default=10.0)
    parser.add_argument('--dither', type=float, default=0.0)
    parser.add_argument('--resample_rate', type=int, default=16000)
    parser.add_argument('wav_scp')
    parser.add_argument('out_ark')
    parser.add_argument('out_scp')
    args = parser.parse_args()

    import numpy as np

    from wenet_tpu.dataset.audio import read_wav, resample
    from wenet_tpu.dataset.kaldi_io import write_ark_scp
    from wenet_tpu.ops.fbank import compute_fbank_np

    def feats():
        with open(args.wav_scp, encoding='utf8') as f:
            for line in f:
                arr = line.strip().split()
                if len(arr) != 2:
                    continue
                key, path = arr
                wav, sr = read_wav(path)
                if sr != args.resample_rate:
                    wav = resample(wav, sr, args.resample_rate)
                feat = compute_fbank_np(
                    wav[0] * (1 << 15),
                    num_mel_bins=args.num_mel_bins,
                    frame_length_ms=args.frame_length,
                    frame_shift_ms=args.frame_shift,
                    dither=args.dither,
                    sample_rate=args.resample_rate)
                yield key, np.asarray(feat, np.float32)

    n = write_ark_scp(args.out_ark, feats(), args.out_scp)
    print(f'wrote {n} utts to {args.out_ark} / {args.out_scp}')


if __name__ == '__main__':
    main()
