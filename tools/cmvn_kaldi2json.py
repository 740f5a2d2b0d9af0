#!/usr/bin/env python3
"""Convert a kaldi text-format global cmvn stats file to the JSON format
consumed by wenet_tpu.utils.cmvn.load_cmvn.

ref: tools/cmvn_kaldi2json.py (same layout checks: text matrix
`[ m1..mD count  v1..vD 0 ]`; binary kaldi cmvn additionally supported
here via dataset/kaldi_io).

Usage: python tools/cmvn_kaldi2json.py <kaldi_cmvn> <json_out>
"""

import json
import sys

import numpy as np


def kaldi2json(kaldi_cmvn_file: str) -> dict:
    with open(kaldi_cmvn_file, 'rb') as fid:
        head = fid.read(2)
    if head == b'\0B':
        # binary kaldi matrix — read through our kaldi_io instead of
        # bailing out like the reference does.
        from wenet_tpu.dataset.kaldi_io import read_mat
        stats = np.asarray(read_mat(kaldi_cmvn_file), np.float64)
        assert stats.shape[0] == 2
        means = stats[0, :-1]
        count = stats[0, -1]
        variance = stats[1, :-1]
    else:
        with open(kaldi_cmvn_file, encoding='utf8') as fid:
            arr = fid.read().split()
        assert arr[0] == '['
        assert arr[-2] == '0'
        assert arr[-1] == ']'
        feat_dim = int((len(arr) - 2 - 2) / 2)
        means = [float(x) for x in arr[1:feat_dim + 1]]
        count = float(arr[feat_dim + 1])
        variance = [float(x) for x in arr[feat_dim + 2:2 * feat_dim + 2]]
    return {'mean_stat': list(map(float, means)),
            'var_stat': list(map(float, variance)),
            'frame_num': count}


if __name__ == '__main__':
    info = kaldi2json(sys.argv[1])
    with open(sys.argv[2], 'w') as fout:
        fout.write(json.dumps(info))
