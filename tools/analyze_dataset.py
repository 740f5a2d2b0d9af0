#!/usr/bin/env python3
"""Dataset analysis: duration / text-length / speed statistics.

ref: tools/analyze_dataset.py (same report surface — per-utt duration,
text length, chars-per-second "speed" + percentile tables written to
--output_dir) without the librosa/torchaudio dependencies: wav durations
come from RIFF headers (dataset/audio.wav_info) for raw lists and from
sample counts while streaming tar members for shards.

Usage:
    python tools/analyze_dataset.py --data_type raw \
        --data_list data/train/data.list --output_dir exp/analyze
"""

import argparse
import io
import json
import multiprocessing
import os
import tarfile

import numpy as np


def _percentiles(arr):
    arr = np.asarray(arr, np.float64)
    if arr.size == 0:
        return {}
    out = {'num': int(arr.size), 'mean': float(arr.mean()),
           'std': float(arr.std()), 'min': float(arr.min()),
           'max': float(arr.max())}
    for p in (1, 5, 25, 50, 75, 95, 99):
        out[f'p{p}'] = float(np.percentile(arr, p))
    return out


def _analyze_raw_line(line):
    from wenet_tpu.dataset.audio import wav_info
    obj = json.loads(line)
    txt = obj.get('txt', '')
    try:
        rate, frames, _ = wav_info(obj['wav'])
        dur = frames / rate
    except Exception:  # noqa: BLE001 - unreadable wav: report text only
        dur = None
    return obj.get('key', ''), dur, len(txt)


def _analyze_shard(tar_path):
    from wenet_tpu.dataset.audio import read_wav
    rows = []
    try:
        with tarfile.open(tar_path) as tar:
            cur_key, cur_dur, cur_txt = None, None, None
            for member in tar:
                name = member.name
                key, ext = os.path.splitext(name)
                if key != cur_key:
                    if cur_key is not None:
                        rows.append((cur_key, cur_dur, cur_txt or 0))
                    cur_key, cur_dur, cur_txt = key, None, None
                data = tar.extractfile(member).read()
                if ext == '.txt':
                    cur_txt = len(data.decode('utf8').strip())
                elif ext in ('.wav', '.flac'):
                    try:
                        wav, sr = read_wav(data)
                        cur_dur = wav.shape[-1] / sr
                    except Exception:  # noqa: BLE001
                        cur_dur = None
            if cur_key is not None:
                rows.append((cur_key, cur_dur, cur_txt or 0))
    except (tarfile.TarError, OSError) as e:
        print(f'skip bad shard {tar_path}: {e}')
    return rows


def main():
    parser = argparse.ArgumentParser(description='analyze dataset')
    parser.add_argument('--data_type', default='raw',
                        choices=['raw', 'shard'])
    parser.add_argument('--data_list', required=True)
    parser.add_argument('--output_dir', required=True)
    parser.add_argument('--num_thread', type=int, default=4)
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    with open(args.data_list, encoding='utf8') as f:
        lines = [x.strip() for x in f if x.strip()]

    with multiprocessing.Pool(args.num_thread) as pool:
        if args.data_type == 'raw':
            rows = pool.map(_analyze_raw_line, lines)
        else:
            rows = [r for rs in pool.map(_analyze_shard, lines) for r in rs]

    durs = [d for _, d, _ in rows if d is not None]
    tlens = [t for _, _, t in rows]
    speeds = [t / d for _, d, t in rows if d]

    with open(os.path.join(args.output_dir, 'utt2dur'), 'w') as f:
        for key, dur, _ in rows:
            if dur is not None:
                f.write(f'{key} {dur:.4f}\n')
    with open(os.path.join(args.output_dir, 'utt2textlen'), 'w') as f:
        for key, _, tlen in rows:
            f.write(f'{key} {tlen}\n')
    summary = {'duration_sec': _percentiles(durs),
               'text_len': _percentiles(tlens),
               'chars_per_sec': _percentiles(speeds),
               'total_hours': float(np.sum(durs) / 3600.0) if durs else 0.0}
    with open(os.path.join(args.output_dir, 'summary.json'), 'w') as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == '__main__':
    main()
