"""Waveform distortion augmentations.

ref: wenet/dataset/wav_distortion.py:31-147 — a family of amplitude
distortions used for robustness training: max-clip, amplification
saturation, jag (segment dropout), poly/quad waveshaping, and amplitude
masking.  All operate on float waveforms in [-1, 1] and are
numpy-vectorized here (the reference loops python-per-sample).
"""

import numpy as np


def db2amp(db: float) -> float:
    return 10.0 ** (db / 20.0)


def amp2db(amp: float) -> float:
    return 20.0 * np.log10(np.maximum(np.abs(amp), 1e-10))


def make_poly_distortion(conf: dict):
    """y = a * ((x/m + q)^n - q^n) style odd-symmetric waveshaper.

    conf: {'a': int, 'm': int, 'n': int} (ref :40-62)."""
    a, m, n = conf['a'], conf['m'], conf['n']

    def poly(x):
        shaped = a * np.sign(x) * (np.abs(x) / m) ** n
        return np.clip(shaped, -1.0, 1.0)

    return poly


def make_quad_distortion():
    return make_poly_distortion({'a': 1, 'm': 1, 'n': 2})


def make_max_distortion(conf: dict):
    """Hard clip at max_db (ref :66-76)."""
    max_db = conf.get('max_db')
    thr = db2amp(max_db) if max_db is not None else 0.95

    def clip(x):
        return np.clip(x, -thr, thr)

    return clip


def make_amp_mask(db_mask=None):
    """Zero samples whose level falls inside the db bands
    (ref :79-92)."""
    bands = db_mask or [(-110, -95), (-90, -80), (-65, -60), (-50, -30),
                        (-15, 0)]

    def mask(x):
        level = amp2db(x)
        keep = np.ones_like(x, bool)
        for lo, hi in bands:
            keep &= ~((level >= lo) & (level <= hi))
        return np.where(keep, x, 0.0)

    return mask


def make_fence_distortion(conf: dict):
    """Keep only samples above a level fence (inverse amp mask,
    ref :95-106)."""
    max_db = conf.get('max_db', -30)
    thr = db2amp(max_db)

    def fence(x):
        return np.where(np.abs(x) >= thr, x, 0.0)

    return fence


def make_jag_distortion(conf: dict):
    """Randomly zero short segments (ref :109-126)."""
    num_jags = conf.get('point_rate', 0.05)

    def jag(x):
        out = x.copy()
        n = len(x)
        count = max(int(n * num_jags) // 20, 1)
        rng = np.random
        for _ in range(count):
            start = rng.randint(0, max(n - 20, 1))
            width = rng.randint(1, 20)
            out[start:start + width] = 0.0
        return out

    return jag


def make_gain_db(conf: dict):
    """Static gain in dB (ref :129-135)."""
    db = conf.get('db', -6)
    g = db2amp(db)

    def gain(x):
        return np.clip(x * g, -1.0, 1.0)

    return gain


def distort(x: np.ndarray, distort_type: str, conf: dict = None):
    """ref :138-147 (distort_wav_conf dispatch)."""
    conf = conf or {}
    if distort_type == 'gain_db':
        fn = make_gain_db(conf)
    elif distort_type == 'max_distortion':
        fn = make_max_distortion(conf)
    elif distort_type == 'fence_distortion':
        fn = make_fence_distortion(conf)
    elif distort_type == 'jag_distortion':
        fn = make_jag_distortion(conf)
    elif distort_type == 'poly_distortion':
        fn = make_poly_distortion(conf)
    elif distort_type == 'quad_distortion':
        fn = make_quad_distortion()
    elif distort_type == 'amp_mask':
        fn = make_amp_mask(conf.get('db_mask'))
    elif distort_type == 'none':
        return x
    else:
        raise ValueError(f'unsupported distortion {distort_type}')
    return fn(np.asarray(x, np.float32))


def distort_wav_sample(sample: dict, distort_type: str = 'none',
                       distort_conf: dict = None,
                       rate: float = 0.0) -> dict:
    """Processor stage: apply with probability `rate`."""
    if rate > 0 and np.random.random() < rate:
        sample = dict(sample)
        sample['wav'] = distort(sample['wav'], distort_type,
                                distort_conf)
    return sample
