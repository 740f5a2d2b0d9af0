#!/usr/bin/env python3
"""Compact CTC token FST: blank handled by a single eps-loop state.

Analog of ref tools/fst/ctc_token_fst_compact.py — smaller T for large
token sets; same accepted language as ctc_token_fst.py."""

import sys


def main(token_file):
    toks = []
    with open(token_file, encoding='utf-8') as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                toks.append(parts[0])
    print('0 0 <blank> <eps>')
    for sym in toks:
        if sym in ('<blank>', '<eps>'):
            continue
        print(f'0 0 {sym} {sym}')  # emit once; repeats collapse via T∘L
    print('0')


if __name__ == '__main__':
    main(sys.argv[1])
