"""Mask construction ops, all jittable with static output shapes.

TPU-native rebuild of the reference mask utilities
(ref: wenet/utils/mask.py:52-373).  Differences from the reference:

* Everything is a pure function over jnp arrays; chunk sizes may be
  *traced* scalars (so dynamic-chunk training draws the chunk size inside
  the jitted train step with `jax.random` instead of host-side randint).
* Masks are boolean with True == attend (same convention as reference).
"""

from typing import Optional, Union

import jax
import jax.numpy as jnp

IntLike = Union[int, jax.Array]


def subsequent_mask(size: int, dtype=jnp.bool_) -> jax.Array:
    """Lower-triangular causal mask (size, size). ref: mask.py:52-85."""
    i = jnp.arange(size)
    return (i[None, :] <= i[:, None]).astype(dtype)


def subsequent_chunk_mask(
    size: int,
    chunk_size: IntLike,
    num_left_chunks: IntLike = -1,
) -> jax.Array:
    """Chunk-causal mask (size, size) for streaming encoders.

    ref: mask.py:88-123.  Row i attends keys in
    [max((i//chunk - num_left_chunks) * chunk, 0), (i//chunk + 1) * chunk).
    `chunk_size` / `num_left_chunks` may be traced scalars: the mask is
    built from arange comparisons, not python loops.
    """
    idx = jnp.arange(size)
    chunk_size = jnp.asarray(chunk_size, jnp.int32)
    num_left = jnp.asarray(num_left_chunks, jnp.int32)
    chunk_of = idx // chunk_size
    ending = (chunk_of + 1) * chunk_size
    start = jnp.where(
        num_left < 0,
        jnp.zeros_like(idx),
        jnp.maximum((chunk_of - num_left) * chunk_size, 0),
    )
    j = idx[None, :]
    return (j >= start[:, None]) & (j < ending[:, None])


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B, max_len) True at PADDED positions. ref: mask.py:201-227.

    `max_len` must be static (padded batch width)."""
    seq = jnp.arange(max_len, dtype=lengths.dtype)
    return seq[None, :] >= lengths[:, None]


def make_non_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B, max_len) True at valid positions. ref: mask.py:230-255."""
    return ~make_pad_mask(lengths, max_len)


def add_optional_chunk_mask(
    masks: jax.Array,
    use_dynamic_chunk: bool,
    use_dynamic_left_chunk: bool,
    decoding_chunk_size: int,
    static_chunk_size: int,
    num_decoding_left_chunks: int,
    enable_full_context: bool = True,
    max_chunk_size: int = 25,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Combine the (B, 1, L) pad mask with an optional chunk mask -> (B, L, L).

    ref: mask.py:126-198.  For dynamic-chunk training
    (use_dynamic_chunk=True, decoding_chunk_size==0) the random chunk size
    is drawn from `rng` *inside* the traced computation, so one compiled
    train step covers all chunk sizes (the reference re-randomizes on host
    per batch; we keep that distribution: chunk ~ U[1, L), then either full
    context if chunk > L/2 (when enable_full_context) else
    chunk % max_chunk_size + 1, with optional random left chunks).
    """
    max_len = masks.shape[-1]
    if use_dynamic_chunk:
        if decoding_chunk_size < 0:
            chunk_size: IntLike = max_len
            num_left_chunks: IntLike = -1
        elif decoding_chunk_size > 0:
            chunk_size = decoding_chunk_size
            num_left_chunks = num_decoding_left_chunks
        elif rng is None:
            # no rng (e.g. module init): degrade to full context
            chunk_size = max_len
            num_left_chunks = -1
        else:
            r1, r2 = jax.random.split(rng)
            draw = jax.random.randint(r1, (), 1, max(max_len, 2))
            small = draw % max_chunk_size + 1
            if enable_full_context:
                chunk_size = jnp.where(draw > max_len // 2, max_len, small)
            else:
                chunk_size = small
            num_left_chunks = jnp.asarray(-1, jnp.int32)
            if use_dynamic_left_chunk:
                max_left = (max_len - 1) // jnp.maximum(chunk_size, 1)
                drawn_left = jax.random.randint(r2, (), 0,
                                                jnp.maximum(max_left, 1))
                # full-context draw keeps all left context
                num_left_chunks = jnp.where(chunk_size == max_len, -1,
                                            drawn_left)
        chunk_masks = subsequent_chunk_mask(max_len, chunk_size,
                                            num_left_chunks)
        chunk_masks = masks & chunk_masks[None, :, :]
    elif static_chunk_size > 0:
        chunk_masks = subsequent_chunk_mask(max_len, static_chunk_size,
                                            num_decoding_left_chunks)
        chunk_masks = masks & chunk_masks[None, :, :]
    else:
        chunk_masks = masks
    return chunk_masks


def mask_finished_scores(score: jax.Array, flag: jax.Array) -> jax.Array:
    """For finished beams keep only branch 0 alive. ref: mask.py:258-285.

    score: (B*N, N) topk scores, flag: (B*N, 1) finished flags."""
    beam_size = score.shape[-1]
    col = jnp.arange(beam_size)[None, :]
    unfinished = flag & (col > 0)  # -inf all but first branch
    finished = flag & (col == 0)  # zero the first branch
    score = jnp.where(unfinished, -jnp.inf, score)
    score = jnp.where(finished, 0.0, score)
    return score


def mask_finished_preds(pred: jax.Array, flag: jax.Array,
                        eos: int) -> jax.Array:
    """Finished beams only emit <eos>. ref: mask.py:288-304."""
    return jnp.where(flag, eos, pred)


def causal_or_lookahead_mask(
    mask: jax.Array,
    right_context: int,
    left_context: int,
    left_t_valid: int = 0,
) -> jax.Array:
    """(B, 1, T) pad mask -> (B, T, T) bounded-context mask.

    ref: mask.py:307-373 (used by efficient-conformer style streaming)."""
    T = mask.shape[-1]
    idx = jnp.arange(T)
    start = jnp.where(idx > left_context, idx - left_context, 0)
    start = jnp.where(idx < left_t_valid, idx, start)
    end = idx + right_context + 1
    j = idx[None, :]
    win = (j >= start[:, None]) & (j < end[:, None])
    return win[None, :, :] & jnp.swapaxes(mask, 1, 2) & mask


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """bool mask -> additive bias (0 keep / -1e10 drop). ref: common.py:313."""
    return (1.0 - mask.astype(dtype)) * jnp.asarray(-1.0e10, dtype)
