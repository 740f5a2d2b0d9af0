#!/usr/bin/env python3
"""WER/CER scoring. ref: tools/compute-wer.py (same CLI + output shape).

Usage: python tools/compute_wer.py [--char=1] [--v=1] ref hyp
"""

import sys
import unicodedata

PUNCTS = set('!,?、。！，；？：「」︰『』《》')
SPACELIST = {' ', '\t', '\r', '\n'}


def characterize(string):
    """Split into CJK chars + latin words + <tags>. ref: compute-wer.py:15-46."""
    res = []
    i = 0
    while i < len(string):
        char = string[i]
        if char in PUNCTS:
            i += 1
            continue
        cat1 = unicodedata.category(char)
        if cat1 in ('Zs', 'Cn') or char in SPACELIST:
            i += 1
            continue
        if cat1 == 'Lo':
            res.append(char)
            i += 1
        else:
            sep = '>' if char == '<' else ' '
            j = i + 1
            while j < len(string):
                c = string[j]
                if ord(c) >= 128 or c in SPACELIST or c == sep:
                    break
                j += 1
            if j < len(string) and string[j] == '>':
                j += 1
            res.append(string[i:j])
            i = j
    return res


def stripoff_tags(x):
    if not x:
        return ''
    chars = []
    i = 0
    while i < len(x):
        if x[i] == '<':
            while i < len(x) and x[i] != '>':
                i += 1
            i += 1
        else:
            chars.append(x[i])
            i += 1
    return ''.join(chars)


def normalize(sentence, ignore_words, case_sensitive, split=None,
              remove_tag=True):
    new_sentence = []
    for token in sentence:
        x = token
        if not case_sensitive:
            x = x.upper()
        if x in ignore_words:
            continue
        if remove_tag:
            x = stripoff_tags(x)
        if not x:
            continue
        if split and x in split:
            new_sentence += split[x]
        else:
            new_sentence.append(x)
    return new_sentence


def edit_distance(ref, hyp):
    """Returns (dist matrix last row costs, aligned ops counts)."""
    m, n = len(ref), len(hyp)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    bp = [[0] * (n + 1) for _ in range(m + 1)]  # 0 ok/sub 1 del 2 ins
    for i in range(1, m + 1):
        d[i][0] = i
        bp[i][0] = 1
    for j in range(1, n + 1):
        d[0][j] = j
        bp[0][j] = 2
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            sub = d[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1])
            dele = d[i - 1][j] + 1
            ins = d[i][j - 1] + 1
            best = min(sub, dele, ins)
            d[i][j] = best
            bp[i][j] = 0 if best == sub else (1 if best == dele else 2)
    # backtrace for op counts
    i, j = m, n
    nsub = ndel = nins = ncor = 0
    while i > 0 or j > 0:
        op = bp[i][j]
        if i > 0 and j > 0 and op == 0:
            if ref[i - 1] == hyp[j - 1]:
                ncor += 1
            else:
                nsub += 1
            i, j = i - 1, j - 1
        elif i > 0 and (j == 0 or op == 1):
            ndel += 1
            i -= 1
        else:
            nins += 1
            j -= 1
    return d[m][n], ncor, nsub, ndel, nins


def read_trn(path, to_char, case_sensitive):
    out = {}
    with open(path, encoding='utf8') as f:
        for line in f:
            arr = line.strip().split(maxsplit=1)
            if not arr:
                continue
            key = arr[0]
            text = arr[1] if len(arr) > 1 else ''
            tokens = characterize(text) if to_char else text.split()
            out[key] = normalize(tokens, set(), case_sensitive)
    return out


def main():
    # accept both --opt=value and the reference's space-separated
    # '--opt value' style (ref compute-wer.py argv loop)
    argv = sys.argv[1:]
    args, opts = [], {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith('--'):
            if '=' in a:
                k, v = a[2:].split('=', 1)
            elif i + 1 < len(argv) and not argv[i + 1].startswith('--'):
                k, v = a[2:], argv[i + 1]
                i += 1
            else:
                k, v = a[2:], '1'
            opts[k] = v
        else:
            args.append(a)
        i += 1
    to_char = opts.get('char', '0') == '1'
    verbose = int(opts.get('v', '1'))
    case_sensitive = opts.get('cs', '0') == '1'
    ref_file, hyp_file = args[0], args[1]
    refs = read_trn(ref_file, to_char, case_sensitive)
    hyps = read_trn(hyp_file, to_char, case_sensitive)
    tot_err = tot_ref = 0
    tot_cor = tot_sub = tot_del = tot_ins = 0
    n_sent = n_sent_err = 0
    for key, ref in refs.items():
        if key not in hyps:
            continue
        hyp = hyps[key]
        err, ncor, nsub, ndel, nins = edit_distance(ref, hyp)
        tot_err += err
        tot_ref += len(ref)
        tot_cor += ncor
        tot_sub += nsub
        tot_del += ndel
        tot_ins += nins
        n_sent += 1
        n_sent_err += err > 0
        if verbose:
            wer = 100.0 * err / max(len(ref), 1)
            print(f'utt: {key}')
            print(f'WER: {wer:4.2f} % N={len(ref)} C={ncor} S={nsub} '
                  f'D={ndel} I={nins}')
            print('lab: ' + ' '.join(ref))
            print('rec: ' + ' '.join(hyp))
            print()
    wer = 100.0 * tot_err / max(tot_ref, 1)
    print('===========================================================')
    print(f'Overall -> {wer:4.2f} % N={tot_ref} C={tot_cor} '
          f'S={tot_sub} D={tot_del} I={tot_ins}')
    ser = 100.0 * n_sent_err / max(n_sent, 1)
    print(f'SER -> {ser:4.2f} % N={n_sent} E={n_sent_err}')


if __name__ == '__main__':
    main()
