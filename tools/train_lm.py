#!/usr/bin/env python3
"""Train a backoff n-gram LM and write ARPA (from scratch, no kaldi).

Replaces the reference recipe's kaldi_lm dependency
(ref examples/aishell/s0/local/aishell_train_lms.sh ->
kaldi_lm/train_lm.sh): counts n-grams from a transcript file, smooths
with interpolated Witten-Bell (well-defined on corpora of any size —
no count-of-count fitting can fail, unlike Good-Turing on tiny data),
and converts the interpolated model to the equivalent backoff ARPA
that wenet_tpu.lm.arpa.NgramLM / lm.build_graph's G compiler consume.

Model. For history h with continuation count N1+(h) = |{w: c(hw)>0}|:
    p(w|h) = (c(hw) + N1+(h) * p(w|h')) / (c(h) + N1+(h))
with the unigram level interpolated against the uniform distribution
over the closed vocabulary (incl. <unk>).  Backoff conversion stores
p(w|h) for observed hw and
    bow(h) = (1 - sum_{c(hw)>0} p(w|h)) / (1 - sum_{c(hw)>0} p(w|h'))
which reproduces the interpolated distribution exactly.

usage:
    train_lm.py --text data/local/lm/text --order 3 --out lm.arpa \
        [--no_ids] [--vocab words.txt] [--min_count 1,1,1]

--text lines are `utt-id w1 w2 ...` (kaldi text); --no_ids treats every
token as a word.  --vocab restricts the vocabulary (one word per line,
first column); out-of-vocabulary tokens map to <unk>.
"""

import argparse
import math
from collections import defaultdict

BOS, EOS, UNK = '<s>', '</s>', '<unk>'
LOG10 = math.log(10.0)


def read_sentences(path, no_ids=False, vocab=None):
    sents = []
    with open(path, encoding='utf-8') as f:
        for line in f:
            toks = line.split()
            if not toks:
                continue
            if not no_ids:
                toks = toks[1:]
            if not toks:
                continue
            if vocab is not None:
                toks = [t if t in vocab else UNK for t in toks]
            sents.append(toks)
    return sents


def count_ngrams(sents, order):
    """counts[n-1]: tuple(w1..wn) -> c.  Sentences are padded with one
    <s> and one </s>; <s> never appears as a predicted word."""
    counts = [defaultdict(int) for _ in range(order)]
    for toks in sents:
        padded = [BOS] + toks + [EOS]
        for n in range(1, order + 1):
            for i in range(len(padded) - n + 1):
                g = tuple(padded[i:i + n])
                if n == 1 and g[0] == BOS:
                    continue  # <s> is context-only
                counts[n - 1][g] += 1
    return counts


class WittenBellLM:

    def __init__(self, counts, vocab):
        self.counts = counts
        self.order = len(counts)
        self.vocab = vocab  # predicted words: excludes <s>
        # history totals and continuation counts per order
        self.h_total = [defaultdict(int) for _ in range(self.order)]
        self.h_cont = [defaultdict(int) for _ in range(self.order)]
        for n in range(2, self.order + 1):
            for g, c in counts[n - 1].items():
                self.h_total[n - 1][g[:-1]] += c
                self.h_cont[n - 1][g[:-1]] += 1
        self.uni_total = sum(counts[0].values())
        self.uni_cont = len(counts[0])

    def prob(self, g):
        """Interpolated p(w | g[:-1]) for any g (observed or not)."""
        n = len(g)
        if n == 1:
            u = 1.0 / len(self.vocab)
            return ((self.counts[0].get(g, 0) + self.uni_cont * u)
                    / (self.uni_total + self.uni_cont))
        h = g[:-1]
        tot = self.h_total[n - 1].get(h, 0)
        cont = self.h_cont[n - 1].get(h, 0)
        lower = self.prob(g[1:])
        if tot == 0:
            return lower
        return (self.counts[n - 1].get(g, 0) + cont * lower) \
            / (tot + cont)

    def bow(self, h):
        """Backoff weight for history h (len(h) in 1..order-1)."""
        n = len(h) + 1
        seen = [g for g in self.counts[n - 1] if g[:-1] == h]
        num = 1.0 - sum(self.prob(g) for g in seen)
        den = 1.0 - sum(self.prob(g[1:]) for g in seen)
        if den <= 0 or num <= 0:
            return 1e-12  # history covers the whole vocab: never back off
        return num / den


def write_arpa(lm, out_path, min_count):
    """ARPA with log10 probs; histories needing a bow are those that
    appear as a context of a kept higher-order n-gram (plus <s>)."""
    order = lm.order
    kept = []
    for n in range(1, order + 1):
        ngrams = {g for g, c in lm.counts[n - 1].items()
                  if c >= min_count[n - 1]}
        if n == 1:
            ngrams |= {(w,) for w in lm.vocab | {UNK}}
            ngrams.add((BOS,))
        kept.append(ngrams)
    # every context of a kept n-gram must itself be an ARPA entry
    # (carrying the bow) — re-add histories that pruning dropped,
    # highest order first so re-added (n-1)-grams propagate down
    need_bow = [set() for _ in range(order)]
    for n in range(order, 1, -1):
        for g in kept[n - 1]:
            need_bow[n - 2].add(g[:-1])
        kept[n - 2] |= need_bow[n - 2]
    kept = [sorted(k) for k in kept]

    def log10p(p):
        return max(math.log(max(p, 1e-99)) / LOG10, -99.0)

    with open(out_path, 'w', encoding='utf-8') as f:
        f.write('\\data\\\n')
        for n in range(1, order + 1):
            f.write(f'ngram {n}={len(kept[n - 1])}\n')
        for n in range(1, order + 1):
            f.write(f'\n\\{n}-grams:\n')
            for g in kept[n - 1]:
                lp = -99.0 if g == (BOS,) else log10p(lm.prob(g))
                line = f'{lp:.7f}\t' + ' '.join(g)
                if n < order and g in need_bow[n - 1]:
                    line += f'\t{log10p(lm.bow(g)):.7f}'
                f.write(line + '\n')
        f.write('\n\\end\\\n')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--text', required=True)
    ap.add_argument('--out', required=True)
    ap.add_argument('--order', type=int, default=3)
    ap.add_argument('--no_ids', action='store_true',
                    help='input has no leading utt-id column')
    ap.add_argument('--vocab', default=None,
                    help='restrict vocabulary (first column per line); '
                         'OOV tokens map to <unk>')
    ap.add_argument('--min_count', default=None,
                    help='comma list, per-order count pruning '
                         '(default: keep everything)')
    args = ap.parse_args()

    vocab = None
    if args.vocab:
        with open(args.vocab, encoding='utf-8') as f:
            vocab = {line.split()[0] for line in f if line.split()}
        vocab -= {BOS, EOS}
    sents = read_sentences(args.text, args.no_ids, vocab)
    if not sents:
        raise SystemExit(f'no sentences read from {args.text}')
    counts = count_ngrams(sents, args.order)
    words = {g[0] for g in counts[0]} | {EOS, UNK}
    lm = WittenBellLM(counts, words)
    min_count = ([int(x) for x in args.min_count.split(',')]
                 if args.min_count else [1] * args.order)
    assert len(min_count) == args.order
    write_arpa(lm, args.out, min_count)
    n_tok = sum(len(s) for s in sents)
    print(f'trained {args.order}-gram on {len(sents)} sentences '
          f'({n_tok} tokens, {len(words)} words) -> {args.out}')


if __name__ == '__main__':
    main()
