#!/usr/bin/env python3
"""CTC topology T ("corrected" variant): direct unit→unit transitions
without returning through blank, so consecutive distinct units need no
blank between them while repeats still require one.

ref: tools/fst/ctc_token_fst_corrected.py — same state/arc layout and
text output (`src dst ilabel olabel` lines + final-state lines), usable
both by openfst toolchains and wenet_tpu.lm.fst.TextFst.read.

usage: ctc_token_fst_corrected.py <tokens.txt-style unit list>
"""

import sys


def main():
    with open(sys.argv[1], encoding='utf8') as f:
        lines = f.readlines()
    phone_count = 0
    disambig_count = 0
    for line in lines:
        sp = line.split()
        if not sp:
            continue
        phone = sp[0]
        if phone in ('<eps>', '<blank>'):
            continue
        if phone.startswith('#'):
            disambig_count += 1
        else:
            phone_count += 1

    out = sys.stdout
    # blank self-loop at start
    out.write(f'0 0 1 0\n')
    # entry / repeat / exit for each unit state
    for i in range(1, phone_count + 1):
        out.write(f'0 {i} {i + 1} {i + 1}\n')
        out.write(f'{i} {i} {i + 1} 0\n')
        out.write(f'{i} 0 1 0\n')
    # direct unit -> different unit
    for i in range(1, phone_count + 1):
        for j in range(1, phone_count + 1):
            if i != j:
                out.write(f'{i} {j} {j + 1} {j + 1}\n')
    # disambig self-loops (olabel only)
    for i in range(0, phone_count + 1):
        for j in range(phone_count + 2,
                       phone_count + disambig_count + 2):
            out.write(f'{i} {i} 0 {j}\n')
    # every state is final
    for i in range(0, phone_count + 1):
        out.write(f'{i}\n')


if __name__ == '__main__':
    main()
