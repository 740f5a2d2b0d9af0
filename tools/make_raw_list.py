#!/usr/bin/env python3
"""wav.scp + text -> json-lines data.list. ref: tools/make_raw_list.py."""

import argparse
import json


def main():
    parser = argparse.ArgumentParser(description='make raw list')
    parser.add_argument('--segments', default=None)
    parser.add_argument('--wav_only', action='store_true',
                        help='untranscribed-audio mode (ssl '
                             'pretraining): args are wav.scp and '
                             'output_file; entries carry no txt')
    parser.add_argument('wav_file')
    parser.add_argument('text_file')
    parser.add_argument('output_file', nargs='?')
    args = parser.parse_args()
    if args.wav_only:
        if args.output_file is not None:
            parser.error('--wav_only takes exactly two positional '
                         'args: wav.scp output.list')
        # wav_only: (wav.scp, data.list) two-arg form
        args.output_file = args.text_file
        args.text_file = None
    elif args.output_file is None:
        parser.error('output_file is required '
                     '(usage: wav.scp text output.list)')

    wav_table = {}
    with open(args.wav_file, encoding='utf8') as f:
        for line in f:
            arr = line.strip().split()
            if len(arr) == 2:
                wav_table[arr[0]] = arr[1]

    segments = None
    if args.segments is not None:
        segments = []
        with open(args.segments, encoding='utf8') as f:
            for line in f:
                arr = line.strip().split()
                segments.append((arr[0], arr[1], float(arr[2]),
                                 float(arr[3])))

    if args.wav_only:
        with open(args.output_file, 'w', encoding='utf8') as fout:
            for key, wav in wav_table.items():
                fout.write(json.dumps({'key': key, 'wav': wav},
                                      ensure_ascii=False) + '\n')
        return
    with open(args.text_file, encoding='utf8') as fin, \
            open(args.output_file, 'w', encoding='utf8') as fout:
        texts = {}
        for line in fin:
            arr = line.strip().split(maxsplit=1)
            texts[arr[0]] = arr[1] if len(arr) > 1 else ''
        if segments is None:
            # iterate the wav table so label-less lists work too (NST
            # pseudo-labeling passes an empty text file and expects
            # every wav to appear with txt '')
            for key, wav in wav_table.items():
                if texts and key not in texts:
                    continue
                fout.write(json.dumps(
                    {'key': key, 'wav': wav,
                     'txt': texts.get(key, '')},
                    ensure_ascii=False) + '\n')
        else:
            for key, wav_key, start, end in segments:
                if key not in texts or wav_key not in wav_table:
                    continue
                fout.write(json.dumps(
                    {'key': key, 'wav': wav_table[wav_key],
                     'txt': texts[key], 'start': start, 'end': end},
                    ensure_ascii=False) + '\n')


if __name__ == '__main__':
    main()
