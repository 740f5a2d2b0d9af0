"""Positional encodings as pure jittable functions + thin linen modules.

TPU-native rebuild of ref wenet/models/transformer/embedding.py:27-259.
The reference registers a (max_len, d) buffer and slices it; here the
encodings are computed on the fly from (possibly traced, possibly batched)
offsets — XLA constant-folds the static case, and the streaming case
becomes a gather-free arithmetic computation with fixed shapes.
"""

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
IntLike = Union[int, jax.Array]


def sinusoidal_position_encoding(offset: IntLike, size: int, d_model: int,
                                 dtype=jnp.float32) -> jax.Array:
    """Interleaved sin/cos PE over positions [offset, offset+size).

    ref: embedding.py:44-58.  `offset` may be a python int, a scalar array
    or a (B,) array (batched streaming decode, ref embedding.py:104-113 —
    negative positions are clamped to 0 like the reference).
    Returns (1, size, d_model) or (B, size, d_model).
    """
    offset = jnp.atleast_1d(jnp.asarray(offset, jnp.int32))
    pos = offset[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :]
    pos = jnp.maximum(pos, 0).astype(dtype)  # (B, size)
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=dtype) *
        (-math.log(10000.0) / d_model))  # (d/2,)
    ang = pos[..., None] * div  # (B, size, d/2)
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return pe.reshape(pos.shape[0], size, d_model)


def whisper_position_encoding(offset: IntLike, size: int, d_model: int,
                              dtype=jnp.float32) -> jax.Array:
    """Non-interleaved [sin | cos] PE used by whisper. ref: embedding.py:150-164."""
    offset = jnp.atleast_1d(jnp.asarray(offset, jnp.int32))
    pos = jnp.maximum(
        offset[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :],
        0).astype(dtype)
    log_inc = math.log(10000.0) / (d_model // 2 - 1)
    inv = jnp.exp(-log_inc * jnp.arange(d_model // 2, dtype=dtype))
    ang = pos[..., None] * inv
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def rope_freqs(offset: IntLike, size: int, head_dim: int,
               theta: float = 10000.0, dtype=jnp.float32) -> jax.Array:
    """RoPE angles for positions [offset, offset+size) -> (B, size, head_dim//2).

    ref: wenet/utils/rope_utils.py precompute_freqs_cis (returned here as
    angles; callers take cos/sin)."""
    offset = jnp.atleast_1d(jnp.asarray(offset, jnp.int32))
    pos = jnp.maximum(
        offset[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :],
        0).astype(dtype)
    freqs = 1.0 / (theta**(jnp.arange(0, head_dim, 2, dtype=dtype) /
                           head_dim))
    return pos[..., None] * freqs  # (B, size, head_dim//2)


class PositionalEncoding(nn.Module):
    """Absolute sinusoidal PE: x*sqrt(d) + PE. ref: embedding.py:27-118."""
    d_model: int
    dropout_rate: float = 0.0
    max_len: int = 5000

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return sinusoidal_position_encoding(offset, size, self.d_model)

    @nn.compact
    def __call__(self, x, offset: IntLike = 0, deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        pos_emb = self.position_encoding(offset, x.shape[1]).astype(x.dtype)
        x = x * math.sqrt(self.d_model) + pos_emb
        drop = Dropout(self.dropout_rate)
        return (drop(x, deterministic=deterministic),
                drop(pos_emb, deterministic=deterministic))


class RelPositionalEncoding(PositionalEncoding):
    """Transformer-XL style: scale x, return PE separately. ref: embedding.py:121-147."""

    @nn.compact
    def __call__(self, x, offset: IntLike = 0, deterministic: bool = True):
        pos_emb = self.position_encoding(offset, x.shape[1]).astype(x.dtype)
        x = x * math.sqrt(self.d_model)
        drop = Dropout(self.dropout_rate)
        return (drop(x, deterministic=deterministic),
                drop(pos_emb, deterministic=deterministic))


class WhisperPositionalEncoding(PositionalEncoding):
    """ref: embedding.py:150-164 (xscale == 1)."""
    max_len: int = 1500

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return whisper_position_encoding(offset, size, self.d_model)

    @nn.compact
    def __call__(self, x, offset: IntLike = 0, deterministic: bool = True):
        pos_emb = self.position_encoding(offset, x.shape[1]).astype(x.dtype)
        x = x + pos_emb
        drop = Dropout(self.dropout_rate)
        return (drop(x, deterministic=deterministic),
                drop(pos_emb, deterministic=deterministic))


class LearnablePositionalEncoding(nn.Module):
    """Learned PE table (whisper decoder). ref: embedding.py:167-175."""
    d_model: int
    dropout_rate: float = 0.0
    max_len: int = 448

    @nn.compact
    def __call__(self, x, offset: IntLike = 0, deterministic: bool = True):
        pe = self.param('pe', nn.initializers.normal(0.02),
                        (1, self.max_len, self.d_model))
        if isinstance(offset, int) and offset == 0:
            pos_emb = pe[:, :x.shape[1]]
        else:
            offset = jnp.atleast_1d(jnp.asarray(offset, jnp.int32))
            idx = jnp.maximum(
                offset[:, None] + jnp.arange(x.shape[1])[None, :], 0)
            pos_emb = jnp.take(pe[0], idx, axis=0)
        pos_emb = pos_emb.astype(x.dtype)
        x = x + pos_emb
        drop = Dropout(self.dropout_rate)
        return (drop(x, deterministic=deterministic),
                drop(pos_emb, deterministic=deterministic))


class NoPositionalEncoding(nn.Module):
    """ref: embedding.py:178-198."""
    d_model: int
    dropout_rate: float = 0.0

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return jnp.zeros((1, size, self.d_model))

    @nn.compact
    def __call__(self, x, offset: IntLike = 0, deterministic: bool = True):
        pos_emb = jnp.zeros((1, x.shape[1], self.d_model), x.dtype)
        x = Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x, pos_emb


class RopePositionalEncoding(nn.Module):
    """Returns rope angles as pos_emb. ref: embedding.py:201-259."""
    d_model: int
    head_dim: int
    dropout_rate: float = 0.0
    max_len: int = 1500
    rope_theta: float = 10000.0
    scale: bool = True

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return rope_freqs(offset, size, self.head_dim, self.rope_theta)

    @nn.compact
    def __call__(self, x, offset: IntLike = 0, deterministic: bool = True):
        ang = self.position_encoding(offset, x.shape[1])  # (B,T,hd/2)
        if self.scale:
            x = x * math.sqrt(self.d_model)
        x = Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x, ang
