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

    Negatives are drawn ONLY from the masked positions of the same
    utterance, excluding the anchor itself (ref
    wav2vec2_model.py:16-55 _sample_negative_indices) — sampling over
    all T would hand padding/unmasked frames to the contrastive
    loss."""
    mask = mask.astype(bool)
    cnt = mask.sum(-1)  # masked count per row (B,)
    # masked positions packed to the front, in mask order
    masked_pos = jnp.argsort(~mask, axis=-1, stable=True)  # (B, T)
    order = jnp.cumsum(mask, axis=-1) - 1  # anchor's index among masks
    r = jax.random.uniform(rng, (B, T, num_negatives))
    high = jnp.maximum(cnt - 1, 1)[:, None, None]
    samp = (r * high).astype(jnp.int32)  # in [0, cnt-2]
    samp = jnp.where(samp >= order[:, :, None], samp + 1, samp)
    samp = jnp.clip(samp, 0, jnp.maximum(cnt[:, None, None] - 1, 0))
    neg = jnp.take_along_axis(
        masked_pos, samp.reshape(B, -1), axis=-1).reshape(
            B, T, num_negatives)
    batch_offset = (jnp.arange(B) * T)[:, None, None]
    return (neg + batch_offset).reshape(B, T * num_negatives)
