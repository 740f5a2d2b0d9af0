#!/usr/bin/env python3
"""Token FST for transducer TLG decoding (no blank self-loops needed at
token level — the joint emits blank explicitly).

Analog of ref tools/fst/rnnt_token_fst.py."""

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
        print(f'0 0 {sym} {sym}')
    print('0')


if __name__ == '__main__':
    main(sys.argv[1])
