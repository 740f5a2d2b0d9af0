#!/usr/bin/env python3
"""Emit the CTC token FST (T) in AT&T text format.

Analog of ref tools/fst/ctc_token_fst.py: consumes tokens.txt
(`symbol id` per line, <blank> id 0) and prints the standard CTC
topology — blank self-loop, per-token absorbing state with repeat
self-loop emitting epsilon — ready for `fstcompile` or for
`wenet_tpu.lm.fst.TextFst.read` after TLG composition.
"""

import sys


def main(token_file):
    toks = []
    with open(token_file, encoding='utf-8') as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                toks.append((parts[0], int(parts[1])))
    print('0 0 <blank> <eps>')
    state = 1
    for sym, idx in toks:
        if sym in ('<blank>', '<eps>'):
            continue
        print(f'0 {state} {sym} {sym}')
        print(f'{state} {state} {sym} <eps>')
        print(f'{state} 0 <eps> <eps>')
        state += 1
    print('0')


if __name__ == '__main__':
    main(sys.argv[1])
