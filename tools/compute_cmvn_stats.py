#!/usr/bin/env python3
"""Global CMVN statistics over fbank features. ref: tools/compute_cmvn_stats.py
(json output consumed by utils/cmvn.load_cmvn)."""

import argparse
import json

import numpy as np
import yaml


def main():
    parser = argparse.ArgumentParser(description='compute cmvn stats')
    parser.add_argument('--num_workers', type=int, default=1)
    parser.add_argument('--train_config', default='')
    parser.add_argument('--in_scp', required=True)
    parser.add_argument('--out_cmvn', default='global_cmvn')
    parser.add_argument('--log_interval', type=int, default=1000)
    args = parser.parse_args()

    feat_dim = 80
    resample_rate = 16000
    if args.train_config:
        with open(args.train_config) as f:
            conf = yaml.safe_load(f)
        dc = conf.get('dataset_conf', {})
        feat_dim = dc.get('fbank_conf', {}).get('num_mel_bins', 80)
        resample_rate = dc.get('resample_conf',
                               {}).get('resample_rate', 16000)

    from wenet_tpu.dataset.audio import read_wav, resample
    from wenet_tpu.ops.fbank import compute_fbank_np

    mean_stat = np.zeros(feat_dim, np.float64)
    var_stat = np.zeros(feat_dim, np.float64)
    frames = 0
    with open(args.in_scp, encoding='utf8') as f:
        for i, line in enumerate(f):
            arr = line.strip().split()
            if len(arr) != 2:
                continue
            wav, sr = read_wav(arr[1])
            if sr != resample_rate:
                wav = resample(wav, sr, resample_rate)
            feat = compute_fbank_np(wav[0] * (1 << 15),
                                    num_mel_bins=feat_dim,
                                    sample_rate=resample_rate)
            mean_stat += feat.sum(0)
            var_stat += (feat**2).sum(0)
            frames += feat.shape[0]
            if (i + 1) % args.log_interval == 0:
                print(f'processed {i + 1} utts, {frames} frames')
    with open(args.out_cmvn, 'w') as f:
        json.dump({'mean_stat': mean_stat.tolist(),
                   'var_stat': var_stat.tolist(),
                   'frame_num': frames}, f)


if __name__ == '__main__':
    main()
