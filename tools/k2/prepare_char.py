#!/usr/bin/env python3
"""Prepare the char-level lang dir consumed by tools/k2/make_hlg.sh.

ref: tools/k2/prepare_char.py — which builds lexicon.txt / tokens.txt /
words.txt / L FSTs with k2. Here the L FST is a TextFst written by
wenet_tpu.lm.build_graph (no k2/torch dependency); disambig variants
are unnecessary because the python pipeline never determinizes
(see wenet_tpu/lm/build_graph.py docstring).

usage: prepare_char.py <units.txt> <words.txt-or-word-list> <out-dir>

Writes: lexicon.txt  tokens.txt  words.txt  L.txt
"""

import os
import sys

from wenet_tpu.lm.build_graph import (build_lexicon_fst, read_lexicon,
                                      write_text)


def main():
    unit_file, word_file, out_dir = sys.argv[1:4]
    os.makedirs(out_dir, exist_ok=True)

    units = []
    with open(unit_file, encoding='utf8') as f:
        for line in f:
            if line.split():
                units.append(line.split()[0])
    unit_set = set(units)

    words = []
    with open(word_file, encoding='utf8') as f:
        for line in f:
            arr = line.split()
            if arr and arr[0] not in ('<eps>', '!SIL', '<SPOKEN_NOISE>',
                                      '<UNK>', '#0', '<s>', '</s>'):
                words.append(arr[0])

    lex_path = os.path.join(out_dir, 'lexicon.txt')
    kept = 0
    with open(lex_path, 'w', encoding='utf8') as f:
        seen = set()
        for word in words:
            if word in seen:
                continue
            seen.add(word)
            pieces = list(word)
            if any(p not in unit_set for p in pieces):
                continue
            f.write(word + ' ' + ' '.join(pieces) + '\n')
            kept += 1

    # tokens.txt: <eps>=0 <blank>=1 units from 2 (build_graph convention)
    with open(os.path.join(out_dir, 'tokens.txt'), 'w',
              encoding='utf8') as f:
        f.write('<eps> 0\n<blank> 1\n')
        for i, u in enumerate(units):
            f.write(f'{u} {i + 2}\n')
    with open(os.path.join(out_dir, 'words.txt'), 'w',
              encoding='utf8') as f:
        f.write('<eps> 0\n')
        for i, w in enumerate(sorted(set(words))):
            f.write(f'{w} {i + 1}\n')

    unit_ids = {u: i + 2 for i, u in enumerate(units)}
    word_ids = {}
    with open(os.path.join(out_dir, 'words.txt'), encoding='utf8') as f:
        for line in f:
            w, i = line.split()
            word_ids[w] = int(i)
    lexicon = read_lexicon(lex_path)
    fst = build_lexicon_fst(lexicon, unit_ids, word_ids)
    write_text(fst, os.path.join(out_dir, 'L.txt'))
    print(f'{kept} lexicon entries -> {out_dir}')


if __name__ == '__main__':
    main()
