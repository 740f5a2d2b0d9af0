#!/usr/bin/env python3
"""Build an e2e lexicon from the model unit table + a raw word list.

ref: tools/fst/prepare_dict.py — same semantics: each word maps to the
unit sequence the e2e model emits (chars for CJK, sentencepiece pieces
for alphabetic words in bpe mode); OOV-unit words are dropped; one
pronunciation per word.

usage: prepare_dict.py <units.txt> <raw-lexicon> <out-lexicon> [bpemodel]
"""

import sys


def main():
    unit_file, lexicon_in, lexicon_out = sys.argv[1:4]
    bpemodel = sys.argv[4] if len(sys.argv) > 4 else None

    unit_table = set()
    with open(unit_file, encoding='utf8') as fin:
        for line in fin:
            unit_table.add(line.split()[0])

    def contain_oov(units):
        return any(u not in unit_table for u in units)

    sp = None
    if bpemodel:
        import sentencepiece as spm
        sp = spm.SentencePieceProcessor()
        sp.Load(bpemodel)

    seen = set()
    with open(lexicon_in, encoding='utf8') as fin, \
            open(lexicon_out, 'w', encoding='utf8') as fout:
        for line in fin:
            word = line.split()[0] if line.split() else ''
            if not word or word == '<SPOKEN_NOISE>':
                continue
            if word == 'SIL' and sp is None:
                continue
            if word in seen:  # one pronunciation per word for e2e
                continue
            seen.add(word)
            if sp is not None and \
                    word.replace("'", '').encode('utf8').isalpha():
                pieces = sp.EncodeAsPieces(word)
            else:
                pieces = list(word)
            if contain_oov(pieces):
                print(f'ignoring OOV word: {word}', file=sys.stderr)
                continue
            fout.write(word + ' ' + ' '.join(pieces) + '\n')


if __name__ == '__main__':
    main()
