#!/usr/bin/env python3
"""Global CMVN statistics computed directly over UIO tar shards.

ref: tools/compute_shard_cmvn_stats.py (same role: cmvn without
un-tarring the dataset first). Streams every audio member of every
shard in the list, computes fbank with wenet_tpu.ops.fbank and writes
the JSON consumed by utils/cmvn.load_cmvn.

Usage:
    python tools/compute_shard_cmvn_stats.py --num_mel_bins 80 \
        --shard_list data/train/data.list --out_cmvn global_cmvn
"""

import argparse
import json
import multiprocessing
import os
import tarfile

import numpy as np

AUDIO_EXTS = ('.wav', '.flac')


def _shard_stats(job):
    tar_path, num_mel_bins, resample_rate = job
    from wenet_tpu.dataset.audio import read_wav, resample
    from wenet_tpu.ops.fbank import compute_fbank_np
    mean = np.zeros(num_mel_bins, np.float64)
    var = np.zeros(num_mel_bins, np.float64)
    frames = 0
    try:
        with tarfile.open(tar_path) as tar:
            for member in tar:
                if os.path.splitext(member.name)[1] not in AUDIO_EXTS:
                    continue
                data = tar.extractfile(member).read()
                try:
                    wav, sr = read_wav(data)
                except Exception:  # noqa: BLE001
                    continue
                if sr != resample_rate:
                    wav = resample(wav, sr, resample_rate)
                feat = compute_fbank_np(wav[0] * (1 << 15),
                                        num_mel_bins=num_mel_bins,
                                        sample_rate=resample_rate)
                mean += feat.sum(0)
                var += (feat**2).sum(0)
                frames += feat.shape[0]
    except (tarfile.TarError, OSError) as e:
        print(f'skip bad shard {tar_path}: {e}')
    return mean, var, frames


def main():
    parser = argparse.ArgumentParser(description='shard cmvn stats')
    parser.add_argument('--num_mel_bins', type=int, default=80)
    parser.add_argument('--resample_rate', type=int, default=16000)
    parser.add_argument('--num_workers', type=int, default=4)
    parser.add_argument('--shard_list', required=True)
    parser.add_argument('--out_cmvn', default='global_cmvn')
    args = parser.parse_args()

    with open(args.shard_list, encoding='utf8') as f:
        shards = [x.strip() for x in f if x.strip()]
    jobs = [(s, args.num_mel_bins, args.resample_rate) for s in shards]
    with multiprocessing.Pool(args.num_workers) as pool:
        results = pool.map(_shard_stats, jobs)

    mean = np.zeros(args.num_mel_bins, np.float64)
    var = np.zeros(args.num_mel_bins, np.float64)
    frames = 0
    for m, v, n in results:
        mean += m
        var += v
        frames += n
    with open(args.out_cmvn, 'w') as f:
        json.dump({'mean_stat': mean.tolist(), 'var_stat': var.tolist(),
                   'frame_num': frames}, f)
    print(f'{frames} frames from {len(shards)} shards -> {args.out_cmvn}')


if __name__ == '__main__':
    main()
