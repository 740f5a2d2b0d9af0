#!/usr/bin/env python3
"""sentencepiece encoding wrapper (analog of ref tools/spm_encode).

Reads lines on stdin, writes encoded pieces/ids on stdout."""
import argparse
import sys

try:
    import sentencepiece as spm
except ImportError as e:
    raise SystemExit('sentencepiece is required for BPE training/'
                     'encoding (pip install sentencepiece); the BPE '
                     'tokenizer in wenet_tpu/text also accepts a '
                     'pre-built units file without it') from e


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model', required=True)
    p.add_argument('--output_format', choices=['piece', 'id'],
                   default='piece')
    args = p.parse_args()
    sp = spm.SentencePieceProcessor()
    sp.Load(args.model)
    for line in sys.stdin:
        if args.output_format == 'piece':
            out = sp.EncodeAsPieces(line.strip())
        else:
            out = map(str, sp.EncodeAsIds(line.strip()))
        sys.stdout.write(' '.join(out) + '\n')


if __name__ == '__main__':
    main()
