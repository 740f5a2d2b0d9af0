"""Global CMVN stats loaders. ref: wenet/utils/cmvn.py:21-110."""

import json
import math

import numpy as np


def _load_json_cmvn(json_cmvn_file):
    """JSON stats from tools/compute_cmvn_stats.py. ref: cmvn.py:21-43."""
    with open(json_cmvn_file) as f:
        cmvn_stats = json.load(f)
    means = np.asarray(cmvn_stats['mean_stat'], dtype=np.float64)
    variance = np.asarray(cmvn_stats['var_stat'], dtype=np.float64)
    count = cmvn_stats['frame_num']
    mean = means / count
    var = variance / count - mean * mean
    std = np.sqrt(np.maximum(var, 1.0e-20))
    return mean, 1.0 / std


def _load_kaldi_cmvn(kaldi_cmvn_file):
    """Kaldi text-format stats matrix: `[ m1..mD count  v1..vD 0 ]`
    — rows separated only by whitespace, parsed positionally by
    feat_dim exactly like the reference (ref: cmvn.py:46-85)."""
    with open(kaldi_cmvn_file, 'rb') as fid:
        if fid.read(2) == b'\0B':
            # binary kaldi cmvn: go through our kaldi_io instead of
            # bailing out like the reference does
            from wenet_tpu.dataset.kaldi_io import read_mat
            stats = np.asarray(read_mat(kaldi_cmvn_file), np.float64)
            row1 = stats[0]
            row2 = stats[1]
            count = row1[-1]
            means = row1[:-1] / count
            var = row2[:-1] / count - means * means
            return means, 1.0 / np.sqrt(np.maximum(var, 1.0e-20))
    with open(kaldi_cmvn_file) as fid:
        arr = fid.read().split()
    assert arr[0] == '[' and arr[-1] == ']', 'not a kaldi text matrix'
    assert arr[-2] == '0'
    feat_dim = (len(arr) - 2 - 2) // 2
    means = np.asarray([float(x) for x in arr[1:feat_dim + 1]],
                       np.float64)
    count = float(arr[feat_dim + 1])
    var = np.asarray([float(x)
                      for x in arr[feat_dim + 2:2 * feat_dim + 2]],
                     np.float64)
    means = means / count
    var = var / count - means * means
    return means, 1.0 / np.sqrt(np.maximum(var, 1.0e-20))


def load_cmvn(cmvn_file, is_json: bool):
    """ref: cmvn.py:88-96.  Returns (mean, istd) float32 arrays."""
    if is_json:
        mean, istd = _load_json_cmvn(cmvn_file)
    else:
        mean, istd = _load_kaldi_cmvn(cmvn_file)
    return mean.astype(np.float32), istd.astype(np.float32)
