"""Span masking for SSL pretraining, fully traced.

ref: wenet/models/ssl/bestrq/mask.py:58-130 (numpy host loop); here the
span draws happen inside the jitted step with jax PRNG so SSL training
is one XLA program.
"""

import jax
import jax.numpy as jnp


def compute_mask_indices(rng: jax.Array,
                         padding_mask: jax.Array,
                         mask_prob: float,
                         mask_length: int,
                         min_masks: int = 2) -> jax.Array:
    """padding_mask: (B, T) True at PAD -> bool span mask (B, T).

    Per row: num_mask = max(min_masks, floor(mask_prob*sz/mask_length
    + U[0,1))) spans of `mask_length`, starts uniform in valid range."""
    B, T = padding_mask.shape
    sz = T - jnp.sum(padding_mask, axis=1)  # (B,)
    r_count, r_start = jax.random.split(rng)
    u = jax.random.uniform(r_count, (B,))
    num_mask = jnp.maximum(
        min_masks,
        jnp.floor(mask_prob * sz / float(mask_length) + u)).astype(
            jnp.int32)
    max_masks = max(min_masks,
                    int(mask_prob * T / float(mask_length)) + 2)
    num_mask = jnp.minimum(num_mask, max_masks)
    hi = jnp.maximum(sz - mask_length, 1).astype(jnp.float32)
    starts = (jax.random.uniform(r_start, (B, max_masks)) *
              hi[:, None]).astype(jnp.int32)  # (B, M)
    span_valid = jnp.arange(max_masks)[None, :] < num_mask[:, None]
    t = jnp.arange(T)[None, None, :]
    s = starts[:, :, None]
    covered = (t >= s) & (t < s + mask_length) & span_valid[:, :, None]
    mask = jnp.any(covered, axis=1)
    return mask & ~padding_mask


def sample_negative_indices(rng: jax.Array, B: int, T: int,
                            num_negatives: int,
                            mask: jax.Array) -> jax.Array:
    """(B, T*num_negatives) flat indices into (B*T, ...) features.

    Samples uniform positions != t within each utterance (HF-style)."""
    r = jax.random.uniform(rng, (B, T, num_negatives))
    idx = (r * (T - 1)).astype(jnp.int32)
    pos = jnp.arange(T)[None, :, None]
    idx = jnp.where(idx >= pos, idx + 1, idx)  # avoid the positive
    idx = jnp.clip(idx, 0, T - 1)
    batch_offset = (jnp.arange(B) * T)[:, None, None]
    return (idx + batch_offset).reshape(B, T * num_negatives)
