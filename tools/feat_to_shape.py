#!/usr/bin/env python3
"""Write `utt T,D` shapes for a kaldi feats.scp.

ref: tools/feat_to_shape.sh (kaldi feat-to-len/feat-to-dim); one pass
through wenet_tpu.dataset.kaldi_io instead of nj split jobs.
"""

import sys

from wenet_tpu.dataset.kaldi_io import read_mat_scp

if __name__ == '__main__':
    inscp, outscp = sys.argv[1], sys.argv[2]
    with open(outscp, 'w', encoding='utf8') as out:
        for key, mat in read_mat_scp(inscp):
            out.write(f'{key} {mat.shape[0]},{mat.shape[1]}\n')
