"""Jittable SpecAugment / SpecSub / CMVN for fused on-device front ends.

The host pipeline applies these per-sample in numpy
(dataset/processor.py, ref wenet/dataset/processor.py:438-524); these
traced variants let the whole train-time front end
(wav -> fbank -> cmvn -> specaug) run inside the jitted train step
(SURVEY §7 stage 8), with mask randomness drawn from jax PRNG so one
compiled program covers all draws.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def apply_cmvn(feats: jax.Array, mean: jax.Array,
               istd: jax.Array) -> jax.Array:
    return (feats - mean) * istd


def spec_aug(rng: jax.Array, feats: jax.Array,
             num_t_mask: int = 2, num_f_mask: int = 2,
             max_t: int = 50, max_f: int = 10) -> jax.Array:
    """Batched time/freq masking (zero fill). feats: (B, T, F)."""
    B, T, F = feats.shape

    def mask_axis(r, x, axis_len, num_masks, max_w, axis):
        idx = jnp.arange(axis_len)
        for i in range(num_masks):
            r, r1, r2 = jax.random.split(r, 3)
            start = jax.random.randint(r1, (B,), 0, max(axis_len, 1))
            width = jax.random.randint(r2, (B,), 1, max_w + 1)
            m = (idx[None, :] >= start[:, None]) & \
                (idx[None, :] < (start + width)[:, None])
            shape = [B, 1, 1]
            shape[axis] = axis_len
            x = jnp.where(m.reshape(shape), 0.0, x)
        return r, x

    rng, feats = mask_axis(rng, feats, T, num_t_mask, max_t, 1)
    rng, feats = mask_axis(rng, feats, F, num_f_mask, max_f, 2)
    return feats


def spec_sub(rng: jax.Array, feats: jax.Array, max_t: int = 20,
             num_t_sub: int = 3) -> jax.Array:
    """U2++ SpecSub: substitute spans with earlier frames — exact
    reference semantics (processor.py:475-502): start ∈ [0, T-1],
    width ∈ [1, max_t], backward shift pos ∈ [0, start] (the source
    window never precedes frame 0), and sources always read the
    ORIGINAL features, not previously-substituted ones.
    feats: (B, T, F)."""
    B, T, F = feats.shape
    idx = jnp.arange(T)
    x0 = feats  # substitution sources come from the original
    for _ in range(num_t_sub):
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        start = jax.random.randint(r1, (B,), 0, T)
        width = jax.random.randint(r2, (B,), 1, max_t + 1)
        # pos uniform over [0, start]: per-row maxval via the uniform
        # trick (randint has no per-element bounds)
        u = jax.random.uniform(r3, (B,))
        pos = jnp.floor(u * (start + 1).astype(jnp.float32)
                        ).astype(jnp.int32)
        src_idx = jnp.maximum(idx[None, :] - pos[:, None], 0)
        substituted = jnp.take_along_axis(
            x0, src_idx[:, :, None].repeat(F, -1), axis=1)
        m = (idx[None, :] >= start[:, None]) & \
            (idx[None, :] < (start + width)[:, None])
        feats = jnp.where(m[:, :, None], substituted, feats)
    return feats


def spec_trim(rng: jax.Array, feats: jax.Array,
              feats_lengths: jax.Array,
              max_t: int = 20):
    """Trim a random tail span by shortening lengths — applied only
    when the trim is shorter than half the utterance, like the
    reference (processor.py:519-521), so short utterances are never
    gutted."""
    B = feats.shape[0]
    trim = jax.random.randint(rng, (B,), 1, max_t + 1)
    trim = jnp.where(trim * 2 < feats_lengths, trim, 0)
    return feats, jnp.maximum(feats_lengths - trim, 1)
