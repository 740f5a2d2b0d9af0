#!/usr/bin/env python3
"""Decode sentencepiece pieces/ids back to text.

ref: tools/spm_decode (fairseq-style). Reads token lines from --input
(or stdin) and prints the detokenized text.
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', required=True,
                        help='sentencepiece model file')
    parser.add_argument('--input', default=None,
                        help='input file (default: stdin)')
    parser.add_argument('--input_format', default='piece',
                        choices=['piece', 'id'])
    args = parser.parse_args()

    import sentencepiece as spm
    sp = spm.SentencePieceProcessor()
    sp.Load(args.model)

    if args.input_format == 'piece':
        def decode(toks):
            return sp.DecodePieces(toks)
    else:
        def decode(toks):
            return sp.DecodeIds(list(map(int, toks)))

    fin = open(args.input, encoding='utf8') if args.input else sys.stdin
    for line in fin:
        print(decode(line.rstrip('\n').split()))


if __name__ == '__main__':
    main()
