#!/usr/bin/env python3
"""Generate a segmented wav.scp from a kaldi `segments` file.

ref: tools/segment.py — each segments line `seg-id utt-id start end`
becomes `seg-id wav-path,start,end`, the comma form understood by the
data pipeline's wav reader (dataset/processor decode_wav start/end).
"""

import argparse

if __name__ == '__main__':
    parser = argparse.ArgumentParser(description='generate segmented wav.scp')
    parser.add_argument('--segments', required=True, help='segments file')
    parser.add_argument('--input', required=True,
                        help='origin wav.scp that is not segmented')
    parser.add_argument('--output', required=True,
                        help='output segmented wav.scp')
    args = parser.parse_args()

    wav_dic = {}
    with open(args.input, encoding='utf8') as ori:
        for line in ori:
            item = line.strip().split()
            if len(item) >= 2:
                wav_dic[item[0]] = item[1]
    with open(args.output, 'w', encoding='utf8') as f, \
            open(args.segments, encoding='utf8') as segments:
        for line in segments:
            item = line.strip().split()
            if len(item) < 4 or item[1] not in wav_dic:
                continue
            f.write(f'{item[0]} {wav_dic[item[1]]},{item[2]},{item[3]}\n')
