#!/usr/bin/env python3
"""Pack raw lists into UIO tar shards. ref: tools/make_shard_list.py
(torchaudio resave replaced by our numpy wav IO)."""

import argparse
import io
import json
import logging
import multiprocessing
import os
import tarfile


def write_tar_file(data_list, tar_file, resample, index, total):
    import numpy as np
    from wenet_tpu.dataset.audio import read_wav, resample as do_resample
    import struct
    logging.info('Processing %s %d/%d', tar_file, index, total)
    with tarfile.open(tar_file, 'w') as tar:
        for item in data_list:
            key, txt, wav_path = item['key'], item['txt'], item['wav']
            if 'start' in item:
                # slice at the file's REAL rate (8k corpora exist)
                from wenet_tpu.dataset.audio import wav_info
                rate0, _, _ = wav_info(wav_path)
                start = int(item['start'] * rate0)
                nframes = int((item['end'] - item['start']) * rate0)
                wav, sr = read_wav(wav_path, start, nframes)
            else:
                wav, sr = read_wav(wav_path)
            if sr != resample:
                wav = do_resample(wav, sr, resample)
                sr = resample
            pcm = np.clip(wav.T * 32768.0, -32768, 32767).astype('<i2')
            data = pcm.tobytes()
            C = wav.shape[0]
            buf = io.BytesIO()
            buf.write(struct.pack('<4sI4s', b'RIFF', 36 + len(data),
                                  b'WAVE'))
            buf.write(struct.pack('<4sIHHIIHH', b'fmt ', 16, 1, C, sr,
                                  sr * C * 2, C * 2, 16))
            buf.write(struct.pack('<4sI', b'data', len(data)))
            buf.write(data)
            wav_bytes = buf.getvalue()

            def add(name, payload):
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                tar.addfile(info, io.BytesIO(payload))

            add(key + '.txt', txt.encode('utf8'))
            add(key + '.wav', wav_bytes)


def main():
    parser = argparse.ArgumentParser(description='make shard list')
    parser.add_argument('--num_utts_per_shard', type=int, default=1000)
    parser.add_argument('--num_threads', type=int, default=1)
    parser.add_argument('--prefix', default='shards')
    parser.add_argument('--resample', type=int, default=16000)
    parser.add_argument('--segments', default=None)
    parser.add_argument('wav_file')
    parser.add_argument('text_file')
    parser.add_argument('shards_dir')
    parser.add_argument('shards_list')
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    wav_table = {}
    with open(args.wav_file, encoding='utf8') as f:
        for line in f:
            arr = line.strip().split()
            if len(arr) == 2:
                wav_table[arr[0]] = arr[1]
    texts = {}
    with open(args.text_file, encoding='utf8') as f:
        for line in f:
            arr = line.strip().split(maxsplit=1)
            if arr:
                texts[arr[0]] = arr[1] if len(arr) > 1 else ''
    data = []
    if args.segments is not None:
        # segments: `seg-id recording-id start end` — one entry per
        # SEGMENT, audio sliced in write_tar_file
        with open(args.segments, encoding='utf8') as f:
            for line in f:
                arr = line.split()
                if len(arr) < 4 or arr[1] not in wav_table:
                    continue
                seg = arr[0]
                if seg not in texts:
                    continue
                data.append({'key': seg, 'txt': texts[seg],
                             'wav': wav_table[arr[1]],
                             'start': float(arr[2]),
                             'end': float(arr[3])})
    else:
        for key, txt in texts.items():
            if key in wav_table:
                data.append({'key': key, 'txt': txt,
                             'wav': wav_table[key]})
    os.makedirs(args.shards_dir, exist_ok=True)
    chunks = [data[i:i + args.num_utts_per_shard]
              for i in range(0, len(data), args.num_utts_per_shard)]
    shard_files = []
    pool = multiprocessing.Pool(args.num_threads)
    jobs = []
    for i, chunk in enumerate(chunks):
        tar_file = os.path.join(args.shards_dir,
                                f'{args.prefix}_{i:09d}.tar')
        shard_files.append(tar_file)
        jobs.append(pool.apply_async(
            write_tar_file, (chunk, tar_file, args.resample, i,
                             len(chunks))))
    pool.close()
    for j in jobs:
        j.get()
    pool.join()
    with open(args.shards_list, 'w') as f:
        for p in shard_files:
            f.write(os.path.abspath(p) + '\n')


if __name__ == '__main__':
    main()
