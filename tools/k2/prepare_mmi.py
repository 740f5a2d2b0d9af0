#!/usr/bin/env python3
"""Build the LF-MMI denominator graph (ref tools/k2/prepare_mmi.sh).

The reference clones icefall and trains a phone LM with k2; here the
denominator graph = CTC topology o token-bigram LM is built pure-python
(wenet_tpu/lm/build_graph.py) from the training transcripts, char/unit
tokenized with units.txt.

usage: prepare_mmi.py <units.txt> <train_text> <out_dir>
  writes <out_dir>/den.txt (consumed by K2Model via model_conf
  lfmmi_dir) and copies tokens.txt/words.txt for parity with the
  reference layout.
"""

import os
import sys


def main(units_path: str, text_path: str, out_dir: str):
    from wenet_tpu.lm.build_graph import build_den_graph

    # units.txt: `unit id` with <blank> 0 — ctc ids
    unit_id = {}
    with open(units_path, encoding='utf-8') as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                unit_id[parts[0]] = int(parts[1])
    num_units = max(unit_id.values())

    # char-tokenize transcripts (ref tools/k2/prepare_char.py)
    seqs = []
    with open(text_path, encoding='utf-8') as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue  # utt-id with empty transcript: skip, don't
                # tokenize the id itself into the denominator LM
            text = ''.join(parts[1:])
            seq = [unit_id[ch] for ch in text if ch in unit_id]
            if seq:
                seqs.append(seq)

    os.makedirs(out_dir, exist_ok=True)
    den = build_den_graph(seqs, num_units, outdir=out_dir)
    n_arcs = sum(len(a) for a in den.arcs.values())
    with open(os.path.join(out_dir, 'tokens.txt'), 'w',
              encoding='utf-8') as f:
        f.write('<eps> 0\n<blank> 1\n')
        for sym, i in sorted(unit_id.items(), key=lambda kv: kv[1]):
            if i > 0:
                f.write(f'{sym} {i + 1}\n')
    print(f'wrote {out_dir}/den.txt ({len(den.arcs)} states, '
          f'{n_arcs} arcs) from {len(seqs)} transcripts')


if __name__ == '__main__':
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2], sys.argv[3])
