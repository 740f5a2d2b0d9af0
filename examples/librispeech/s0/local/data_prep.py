#!/usr/bin/env python3
"""LibriSpeech corpus preparation: one corpus part -> kaldi-style
wav.scp/text (analog of ref examples/librispeech/s0/local/data_prep.sh).

  src:  .../LibriSpeech/<part>   (e.g. train-clean-100) with
        <spk>/<chapter>/<spk>-<chapter>-<utt>.flac and
        <spk>-<chapter>.trans.txt (`<utt-id> THE TEXT` per line)
  dst:  data/<name>/{wav.scp,text}

wav.scp references the .flac files directly — the data pipeline
decodes flac natively (runtime/cpp/flac_decoder.cc), so no conversion
pass is needed (the reference reads flac through torchaudio the same
way).
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('src', help='.../LibriSpeech/<part>')
    ap.add_argument('dst', help='output dir (e.g. data/train_clean_100)')
    args = ap.parse_args()

    if not os.path.isdir(args.src):
        raise SystemExit(f'no such corpus dir {args.src}')
    utts = {}
    texts = {}
    for root, _, files in os.walk(args.src):
        for name in sorted(files):
            path = os.path.join(root, name)
            if name.endswith('.flac'):
                utts[name[:-5]] = os.path.abspath(path)
            elif name.endswith('.trans.txt'):
                with open(path, encoding='utf-8') as f:
                    for line in f:
                        parts = line.split(maxsplit=1)
                        if len(parts) == 2:
                            texts[parts[0]] = parts[1].strip()
    pairs = sorted(u for u in utts if u in texts)
    if not pairs:
        raise SystemExit(f'no (flac, transcript) pairs under {args.src}')
    os.makedirs(args.dst, exist_ok=True)
    with open(os.path.join(args.dst, 'wav.scp'), 'w',
              encoding='utf-8') as f:
        for u in pairs:
            f.write(f'{u} {utts[u]}\n')
    with open(os.path.join(args.dst, 'text'), 'w',
              encoding='utf-8') as f:
        for u in pairs:
            f.write(f'{u} {texts[u]}\n')
    dropped = len(utts) - len(pairs)
    print(f'{args.dst}: {len(pairs)} utts '
          f'({dropped} flacs without transcript)')


if __name__ == '__main__':
    main()
