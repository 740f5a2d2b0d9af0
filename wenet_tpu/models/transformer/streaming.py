"""Streaming drivers over the fixed-shape chunk step.

ref: wenet/models/transformer/encoder.py:302-362 (forward_chunk_by_chunk)
and runtime/core/decoder/asr_decoder.cc:87-132 (AdvanceDecoding).

The encoder chunk step compiles once per (batch, chunk, cache) config;
these drivers manage offsets, the validity mask for the right-aligned
cache window, and (for the serving path) CTC activations.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class StreamingConfig:
    decoding_chunk_size: int  # encoder frames per chunk (e.g. 16)
    num_decoding_left_chunks: int = -1  # <0: required_cache_size = big
    subsampling_rate: int = 4
    right_context: int = 6
    max_left_frames: int = 512  # cache size when num_left_chunks < 0

    @property
    def required_cache_size(self) -> int:
        if self.num_decoding_left_chunks < 0:
            return self.max_left_frames
        return self.decoding_chunk_size * self.num_decoding_left_chunks

    @property
    def stride(self) -> int:
        return self.subsampling_rate * self.decoding_chunk_size

    @property
    def decoding_window(self) -> int:
        return ((self.decoding_chunk_size - 1) * self.subsampling_rate +
                self.right_context + 1)


class StreamingEncoderState:
    """Host-side mutable wrapper around the pure cache pytree."""

    def __init__(self, att_cache, cnn_cache, offset: int = 0,
                 valid_cache: int = 0):
        self.att_cache = att_cache
        self.cnn_cache = cnn_cache
        self.offset = offset
        self.valid_cache = valid_cache  # valid slots in the att cache


def init_streaming_state(encoder, batch_size: int, cfg: StreamingConfig,
                         dtype=jnp.float32) -> StreamingEncoderState:
    att_cache, cnn_cache = encoder.zero_cache(batch_size,
                                              cfg.required_cache_size,
                                              dtype)
    return StreamingEncoderState(att_cache, cnn_cache)


def streaming_att_mask(batch_size: int, cache_size: int, chunk_out: int,
                       valid_cache: int,
                       valid_chunk: Optional[int] = None) -> np.ndarray:
    """(B, 1, cache+chunk) mask: invalid (not yet filled) cache slots off.

    The cache window is right-aligned, so the first
    (cache_size - valid_cache) slots are padding.  `valid_chunk` (<
    chunk_out for a zero-padded tail chunk) masks pad positions within
    the current chunk.

    Host-side NUMPY on purpose: every caller feeds the mask straight
    into a jitted chunk step, and building it with eager jnp cost a
    device dispatch + fetch PER ROW PER CHUNK (measured 38 ms each
    through a remote-TPU link — it serialized batched serving)."""
    idx = np.arange(cache_size + chunk_out)
    valid = idx >= (cache_size - min(valid_cache, cache_size))
    if valid_chunk is not None:
        valid = valid & (idx < cache_size + valid_chunk)
    return np.broadcast_to(valid, (batch_size, 1, cache_size + chunk_out))


def forward_chunk_by_chunk(model, variables, xs: jax.Array,
                           cfg: StreamingConfig,
                           encoder=None) -> Tuple[jax.Array, jax.Array]:
    """Full-utterance simulate-streaming forward. xs: (1, T_frames, mel).

    Returns (ys (1, T_out, D), masks (1, 1, T_out)).  Matches the
    reference's overlapping-window policy (no subsampling cache,
    ref encoder.py:318-329)."""
    enc = encoder or model.encoder
    cache_size = cfg.required_cache_size
    state = init_streaming_state(enc, xs.shape[0], cfg, xs.dtype)
    num_frames = xs.shape[1]
    context = cfg.right_context + 1
    # progressive-downsampling encoders (efficient conformer) emit
    # base_frames/out_factor outputs per chunk; caches/masks stay at
    # base resolution, `offset` counts FINAL frames
    out_factor = getattr(enc, 'output_downsampling_factor', 1)
    outputs = []

    apply_fn = _chunk_apply(model, variables)

    for cur in range(0, num_frames - context + 1, cfg.stride):
        end = min(cur + cfg.decoding_window, num_frames)
        chunk_xs = xs[:, cur:end, :]
        # pad the tail chunk up to the full window so shapes stay static
        pad = cfg.decoding_window - chunk_xs.shape[1]
        real_base = (chunk_xs.shape[1] - context) // cfg.subsampling_rate + 1
        real_out = -(-real_base // out_factor)
        if pad > 0:
            chunk_xs = jnp.pad(chunk_xs, ((0, 0), (0, pad), (0, 0)))
        chunk_out = (cfg.decoding_window - context
                     ) // cfg.subsampling_rate + 1
        att_mask = streaming_att_mask(xs.shape[0], cache_size, chunk_out,
                                      state.valid_cache,
                                      valid_chunk=real_base)
        ys, att_cache, cnn_cache = apply_fn(
            chunk_xs, jnp.asarray(state.offset), state.att_cache,
            state.cnn_cache, att_mask)
        outputs.append(ys[:, :real_out])
        state.att_cache = att_cache
        state.cnn_cache = cnn_cache
        state.offset += real_out
        state.valid_cache = min(state.valid_cache + real_base, cache_size)

    ys = jnp.concatenate(outputs, axis=1)
    masks = jnp.ones((1, 1, ys.shape[1]), bool)
    return ys, masks


def _chunk_apply(model, variables):
    """jitted chunk step bound to (model, variables)."""
    @jax.jit
    def fn(chunk_xs, offset, att_cache, cnn_cache, att_mask):
        return model.apply(variables, chunk_xs, offset, att_cache,
                           cnn_cache, att_mask,
                           method=model.forward_encoder_chunk)
    return fn
