#!/usr/bin/env python3
"""Pseudo-label filtering for noisy-student training.

Analog of the reference NST recipe's filtering stage
(ref examples/aishell/NST/run_nst.sh + local/generate_filtered_pseudo_label.py
flow): keep utterances where two decoding passes agree (CER between
ctc_greedy and attention_rescoring hypotheses below --max_cer), writing
a data.list of survivors with the rescoring hyp as the label.
"""

import argparse
import json


def edit_distance(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev = dp[0]
        dp[0] = i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (ca != cb))
            prev = cur
    return dp[-1]


def read_text(path):
    out = {}
    with open(path, encoding='utf-8') as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if parts:
                out[parts[0]] = parts[1] if len(parts) > 1 else ''
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--hyp_a', required=True,
                   help='text from pass A (e.g. ctc_greedy_search)')
    p.add_argument('--hyp_b', required=True,
                   help='text from pass B (e.g. attention_rescoring)')
    p.add_argument('--wav_scp', required=True)
    p.add_argument('--max_cer', type=float, default=0.1)
    p.add_argument('--out_list', required=True)
    p.add_argument('--out_text', default='')
    args = p.parse_args()
    ha, hb = read_text(args.hyp_a), read_text(args.hyp_b)
    wavs = read_text(args.wav_scp)
    kept = dropped = 0
    out_text = open(args.out_text, 'w', encoding='utf-8') \
        if args.out_text else None
    with open(args.out_list, 'w', encoding='utf-8') as f:
        for key, wav in wavs.items():
            a, b = ha.get(key), hb.get(key)
            if not a or not b:
                dropped += 1
                continue
            cer = edit_distance(a, b) / max(len(b), 1)
            if cer <= args.max_cer:
                f.write(json.dumps({'key': key, 'wav': wav, 'txt': b},
                                   ensure_ascii=False) + '\n')
                if out_text:
                    out_text.write(f'{key} {b}\n')
                kept += 1
            else:
                dropped += 1
    if out_text:
        out_text.close()
    print(f'kept {kept} dropped {dropped} '
          f'({kept / max(kept + dropped, 1):.1%})')


if __name__ == '__main__':
    main()
