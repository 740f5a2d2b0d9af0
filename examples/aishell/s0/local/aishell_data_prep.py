#!/usr/bin/env python3
"""AIShell-1 corpus preparation: raw corpus tree -> kaldi-style
data/{train,dev,test}/{wav.scp,text}.

Analog of ref examples/aishell/s0/local/aishell_data_prep.sh (shell +
perl there); same inputs and outputs:

  wav_dir:    .../data_aishell/wav          (train/ dev/ test/ under it,
              one speaker dir each, utt wavs BAC009S....wav inside)
  transcript: .../data_aishell/transcript/aishell_transcript_v0.8.txt
              lines `BAC009S0002W0122 word1 word2 ...`

Utterances without a transcript line are dropped (the real corpus has
a handful); the counts per set are printed so silently-empty sets are
visible.  Output `text` keeps the transcript's word segmentation
(stage 2 char-tokenizes for the dict; stage 7's LM trainer uses the
words as-is).
"""

import argparse
import os
import sys


def read_transcript(path):
    table = {}
    with open(path, encoding='utf-8') as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                table[parts[0]] = ' '.join(parts[1:])
    return table


def prepare_set(wav_root, subset, transcript, out_dir):
    sub_dir = os.path.join(wav_root, subset)
    if not os.path.isdir(sub_dir):
        raise SystemExit(f'missing corpus subset dir {sub_dir}')
    utts = []
    n_missing = 0
    for root, _, files in os.walk(sub_dir):
        for name in sorted(files):
            if not name.endswith('.wav'):
                continue
            utt = name[:-4]
            if utt not in transcript:
                n_missing += 1
                continue
            utts.append((utt, os.path.abspath(os.path.join(root, name))))
    utts.sort()
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, 'wav.scp'), 'w',
              encoding='utf-8') as f:
        for utt, path in utts:
            f.write(f'{utt} {path}\n')
    with open(os.path.join(out_dir, 'text'), 'w',
              encoding='utf-8') as f:
        for utt, _ in utts:
            f.write(f'{utt} {transcript[utt]}\n')
    print(f'{subset}: {len(utts)} utts '
          f'({n_missing} dropped without transcript)')
    return len(utts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('wav_dir', help='.../data_aishell/wav')
    ap.add_argument('transcript_path',
                    help='.../aishell_transcript_v0.8.txt')
    ap.add_argument('--out', default='data',
                    help='output root (data/{train,dev,test})')
    args = ap.parse_args()

    transcript = read_transcript(args.transcript_path)
    if not transcript:
        raise SystemExit(f'empty transcript {args.transcript_path}')
    total = 0
    for subset in ('train', 'dev', 'test'):
        total += prepare_set(args.wav_dir, subset, transcript,
                             os.path.join(args.out, subset))
    if total == 0:
        sys.exit('no utterances prepared — wrong --wav_dir?')


if __name__ == '__main__':
    main()
