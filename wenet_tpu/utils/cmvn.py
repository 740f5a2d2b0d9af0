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
    """Kaldi text-format stats matrix. ref: cmvn.py:46-85."""
    means, variance = None, None
    with open(kaldi_cmvn_file) as fid:
        all_lines = fid.read().split()
    # find the bracketed numbers: format "[ m1 ... mD c ; v1 ... vD x ]"
    start = all_lines.index('[')
    toks = all_lines[start + 1:]
    semi = toks.index(';')
    row1 = [float(t) for t in toks[:semi]]
    row2 = [float(t) for t in toks[semi + 1:toks.index(']')]]
    count = row1[-1]
    means = np.asarray(row1[:-1], dtype=np.float64) / count
    var = np.asarray(row2[:-1], dtype=np.float64) / count - means * means
    std = np.sqrt(np.maximum(var, 1.0e-20))
    return means, 1.0 / std


def load_cmvn(cmvn_file, is_json: bool):
    """ref: cmvn.py:88-96.  Returns (mean, istd) float32 arrays."""
    if is_json:
        mean, istd = _load_json_cmvn(cmvn_file)
    else:
        mean, istd = _load_kaldi_cmvn(cmvn_file)
    return mean.astype(np.float32), istd.astype(np.float32)
