"""Jittable batch/label utilities.

TPU-native rebuild of the reference label helpers (ref:
wenet/utils/common.py).  The reference builds ragged python lists and
re-pads (add_sos_eos, reverse_pad_list); here everything is a fixed-shape
vectorized transform so it can live inside a jitted train step.
"""

import time
from typing import List, Tuple

import jax
import jax.numpy as jnp

IGNORE_ID = -1


def pad_list(xs: List, pad_value: float, max_len: int = 0) -> jax.Array:
    """Host-side ragged list -> padded (B, Tmax, ...) array.

    ref: common.py:29-76.  Used by decode post-processing, not in jit."""
    import numpy as np
    max_len = max_len if max_len > 0 else max(len(x) for x in xs)
    first = np.asarray(xs[0])
    out = np.full((len(xs), max_len) + first.shape[1:], pad_value,
                  dtype=first.dtype)
    for i, x in enumerate(xs):
        out[i, :len(x)] = x
    return jnp.asarray(out)


def add_blank(ys_pad: jax.Array, blank: int, ignore_id: int) -> jax.Array:
    """Prepend blank for transducer predictor. ref: common.py:79-110."""
    bs = ys_pad.shape[0]
    col = jnp.full((bs, 1), blank, dtype=ys_pad.dtype)
    out = jnp.concatenate([col, ys_pad], axis=1)
    return jnp.where(out == ignore_id, blank, out)


def add_sos_eos(ys_pad: jax.Array, sos: int, eos: int,
                ignore_id: int) -> Tuple[jax.Array, jax.Array]:
    """Vectorized <sos>/<eos> insertion on ignore_id-padded labels.

    ref: common.py:113-147 (python list version).  Given ys_pad (B, L):
      ys_in  (B, L+1): [sos, y..., eos-pad]
      ys_out (B, L+1): [y..., eos, ignore-pad]
    """
    B, L = ys_pad.shape
    lens = jnp.sum(ys_pad != ignore_id, axis=1)
    sos_col = jnp.full((B, 1), sos, dtype=ys_pad.dtype)
    ys_in = jnp.concatenate(
        [sos_col, jnp.where(ys_pad == ignore_id, eos, ys_pad)], axis=1)
    j = jnp.arange(L + 1)[None, :]
    ys_ext = jnp.concatenate(
        [ys_pad, jnp.full((B, 1), ignore_id, ys_pad.dtype)], axis=1)
    ys_out = jnp.where(
        j < lens[:, None], ys_ext,
        jnp.where(j == lens[:, None], eos, ignore_id)).astype(ys_pad.dtype)
    return ys_in, ys_out


def reverse_pad_list(ys_pad: jax.Array,
                     ys_lens: jax.Array,
                     pad_value: int = -1) -> jax.Array:
    """Per-row reversal of the valid prefix. ref: common.py:241-266."""
    B, L = ys_pad.shape
    j = jnp.arange(L)[None, :]
    idx = (ys_lens[:, None] - 1 - j)
    valid = idx >= 0
    gathered = jnp.take_along_axis(ys_pad, jnp.maximum(idx, 0), axis=1)
    return jnp.where(valid, gathered, pad_value).astype(ys_pad.dtype)


def th_accuracy(pad_outputs: jax.Array, pad_targets: jax.Array,
                ignore_label: int) -> jax.Array:
    """Token accuracy over non-ignored positions. ref: common.py:269-289.

    pad_outputs: (B, L, V) logits; pad_targets: (B, L)."""
    pred = jnp.argmax(pad_outputs, axis=-1)
    mask = pad_targets != ignore_label
    num = jnp.sum((pred == pad_targets) & mask)
    den = jnp.maximum(jnp.sum(mask), 1)
    return num / den


def log_add(*args) -> float:
    """Stable host-side log-add. ref: common.py:302-310."""
    import math
    if all(a == -float('inf') for a in args):
        return -float('inf')
    a_max = max(args)
    return a_max + math.log(sum(math.exp(a - a_max) for a in args))


class StepTimer:
    """steps/second meter. ref: common.py:337-352."""

    def __init__(self, step=0.0):
        self.last_iteration = step
        self.start()

    def start(self):
        self.last_time = time.time()

    def steps_per_second(self, cur_step, restart=True):
        value = ((float(cur_step) - self.last_iteration) /
                 (time.time() - self.last_time))
        if restart:
            self.start()
            self.last_iteration = float(cur_step)
        return value


def enable_compile_cache(path: str = None):
    """Turn on JAX's persistent compilation cache.

    Serving binaries call this at startup so a server restart reuses
    yesterday's compiled programs instead of re-compiling the model
    (~1-3 min for flagship shapes): the chunk-step, rescoring and
    init programs all hash to stable keys.  Set WENET_TPU_NO_COMPILE_CACHE
    to disable; override the location with WENET_TPU_COMPILE_CACHE.

    No reference analog (torchscript runtimes ship pre-exported
    models); this is the JAX-native equivalent of shipping a compiled
    artifact.
    """
    import os
    if os.environ.get('WENET_TPU_NO_COMPILE_CACHE'):
        return
    if path is None:
        path = os.environ.get(
            'WENET_TPU_COMPILE_CACHE',
            os.path.join(os.path.expanduser('~'), '.cache',
                         'wenet_tpu_xla'))
    os.makedirs(path, exist_ok=True)
    import jax
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
