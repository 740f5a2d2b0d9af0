#!/usr/bin/env python3
"""Tokenize transcript text. ref: tools/text2token.py."""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser(description='text to tokens')
    parser.add_argument('--skip-ncols', '-s', type=int, default=0)
    parser.add_argument('--space', default='<space>')
    parser.add_argument('--nchar', '-n', type=int, default=1)
    parser.add_argument('text', nargs='?', default=None)
    args = parser.parse_args()
    f = open(args.text, encoding='utf8') if args.text else sys.stdin
    for line in f:
        x = line.strip().split()
        print(' '.join(x[:args.skip_ncols]), end=' ' if args.skip_ncols
              else '')
        a = ' '.join(x[args.skip_ncols:])
        chars = [c if c != ' ' else args.space for c in a]
        if args.nchar > 1:
            chars = [''.join(chars[i:i + args.nchar])
                     for i in range(0, len(chars), args.nchar)]
        print(' '.join(chars))


if __name__ == '__main__':
    main()
