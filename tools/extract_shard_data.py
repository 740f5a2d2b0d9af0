#!/usr/bin/env python3
"""Extract UIO tar shards back into raw files + wav.scp/text.

ref: tools/extract_shard_data.py (the inverse of make_shard_list.py).
Every shard in the list is untarred under --output_dir/<shard-stem>/ and
a combined wav.scp + text (+ raw data.list) is regenerated, so a shard
dataset can be turned back into a raw one.

Usage:
    python tools/extract_shard_data.py --shard_list data.list \
        --output_dir exp/raw
"""

import argparse
import json
import multiprocessing
import os
import tarfile

AUDIO_EXTS = ('.wav', '.flac')


def _extract(job):
    tar_path, out_dir = job
    stem = os.path.splitext(os.path.basename(tar_path))[0]
    dst = os.path.join(out_dir, stem)
    os.makedirs(dst, exist_ok=True)
    rows = []
    with tarfile.open(tar_path) as tar:
        wavs, txts = {}, {}
        for member in tar:
            if not member.isfile():
                continue
            key, ext = os.path.splitext(member.name)
            data = tar.extractfile(member).read()
            if ext == '.txt':
                txts[key] = data.decode('utf8').strip()
            elif ext in AUDIO_EXTS:
                path = os.path.join(dst, os.path.basename(member.name))
                with open(path, 'wb') as f:
                    f.write(data)
                wavs[key] = path
        for key in sorted(wavs):
            rows.append((key, wavs[key], txts.get(key, '')))
    return rows


def main():
    parser = argparse.ArgumentParser(description='extract shard data')
    parser.add_argument('--num_workers', type=int, default=4)
    parser.add_argument('--shard_list', required=True)
    parser.add_argument('--output_dir', required=True)
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    with open(args.shard_list, encoding='utf8') as f:
        shards = [x.strip() for x in f if x.strip()]
    with multiprocessing.Pool(args.num_workers) as pool:
        results = pool.map(_extract,
                           [(s, args.output_dir) for s in shards])

    with open(os.path.join(args.output_dir, 'wav.scp'), 'w') as fwav, \
            open(os.path.join(args.output_dir, 'text'), 'w') as ftxt, \
            open(os.path.join(args.output_dir, 'data.list'), 'w') as flist:
        n = 0
        for rows in results:
            for key, wav, txt in rows:
                fwav.write(f'{key} {wav}\n')
                ftxt.write(f'{key} {txt}\n')
                flist.write(json.dumps(
                    {'key': key, 'wav': wav, 'txt': txt},
                    ensure_ascii=False) + '\n')
                n += 1
    print(f'extracted {n} utts from {len(shards)} shards '
          f'-> {args.output_dir}')


if __name__ == '__main__':
    main()
