"""Subsampling front ends. ref: wenet/models/transformer/subsampling.py:24-394.

Each module reports (subsampling_rate, right_context) for streaming math
and returns (x, pos_emb, mask).  Convs run in NHWC (TPU-native layout);
the channel-major flatten order of the reference (torch NCHW view) is
preserved so imported checkpoints' following Dense layers line up.
"""

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
IntLike = Union[int, jax.Array]


class Conv2dSubsampling4(nn.Module):
    """Two stride-2 3x3 convs -> 1/4 length. ref: subsampling.py:174-229."""
    idim: int
    odim: int
    dropout_rate: float
    pos_enc: nn.Module
    subsampling_rate: int = 4
    right_context: int = 6

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array,
                 offset: IntLike = 0, deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        x = x[..., None]  # (B, T, F, 1) NHWC
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    name='conv_0')(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    name='conv_1')(x)
        x = jax.nn.relu(x)
        b, t, f, c = x.shape
        # torch flattens (C, F) channel-major (ref subsampling.py:220)
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)
        x = nn.Dense(self.odim, name='out')(x)
        x, pos_emb = self.pos_enc(x, offset, deterministic=deterministic)
        return x, pos_emb, x_mask[:, :, 2::2][:, :, 2::2]

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return self.pos_enc.position_encoding(offset, size)


class Conv2dSubsampling6(nn.Module):
    """1/6 length. ref: subsampling.py:231-281."""
    idim: int
    odim: int
    dropout_rate: float
    pos_enc: nn.Module
    subsampling_rate: int = 6
    right_context: int = 10

    @nn.compact
    def __call__(self, x, x_mask, offset: IntLike = 0,
                 deterministic: bool = True):
        x = x[..., None]
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    name='conv_0')(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.odim, (5, 5), strides=(3, 3), padding='VALID',
                    name='conv_1')(x)
        x = jax.nn.relu(x)
        b, t, f, c = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)
        x = nn.Dense(self.odim, name='linear')(x)
        x, pos_emb = self.pos_enc(x, offset, deterministic=deterministic)
        return x, pos_emb, x_mask[:, :, 2::2][:, :, 4::3]

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return self.pos_enc.position_encoding(offset, size)


class Conv2dSubsampling8(nn.Module):
    """1/8 length. ref: subsampling.py:283-337."""
    idim: int
    odim: int
    dropout_rate: float
    pos_enc: nn.Module
    subsampling_rate: int = 8
    right_context: int = 14

    @nn.compact
    def __call__(self, x, x_mask, offset: IntLike = 0,
                 deterministic: bool = True):
        x = x[..., None]
        for i in range(3):
            x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                        name=f'conv_{i}')(x)
            x = jax.nn.relu(x)
        b, t, f, c = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)
        x = nn.Dense(self.odim, name='linear')(x)
        x, pos_emb = self.pos_enc(x, offset, deterministic=deterministic)
        return x, pos_emb, x_mask[:, :, 2::2][:, :, 2::2][:, :, 2::2]

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return self.pos_enc.position_encoding(offset, size)


class Conv1dSubsampling2(nn.Module):
    """Whisper-style 1D stride-2. ref: subsampling.py:117-172."""
    idim: int
    odim: int
    dropout_rate: float
    pos_enc: nn.Module
    subsampling_rate: int = 2
    right_context: int = 4

    @nn.compact
    def __call__(self, x, x_mask, offset: IntLike = 0,
                 deterministic: bool = True):
        time = x.shape[1]
        x = nn.Conv(self.odim, (3,), padding=[(1, 1)], name='conv_0')(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(self.odim, (3,), strides=(2,), padding=[(1, 1)],
                    name='conv_1')(x)
        x = jax.nn.gelu(x, approximate=False)
        x, pos_emb = self.pos_enc(x, offset, deterministic=deterministic)
        return x, pos_emb, x_mask[:, :, (time + 1) % 2::2]

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return self.pos_enc.position_encoding(offset, size)


class LinearNoSubsampling(nn.Module):
    """Linear + LN, no subsampling. ref: subsampling.py:70-115."""
    idim: int
    odim: int
    dropout_rate: float
    pos_enc: nn.Module
    subsampling_rate: int = 1
    right_context: int = 0

    @nn.compact
    def __call__(self, x, x_mask, offset: IntLike = 0,
                 deterministic: bool = True):
        x = nn.Dense(self.odim, name='out')(x)
        x = nn.LayerNorm(epsilon=1e-5, name='norm')(x)
        x = Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x, pos_emb = self.pos_enc(x, offset, deterministic=deterministic)
        return x, pos_emb, x_mask

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return self.pos_enc.position_encoding(offset, size)


class EmbedNoSubsampling(nn.Module):
    """Token embedding front end. ref: subsampling.py:36-68."""
    idim: int
    odim: int
    dropout_rate: float
    pos_enc: nn.Module
    subsampling_rate: int = 1
    right_context: int = 0

    @nn.compact
    def __call__(self, x, x_mask, offset: IntLike = 0,
                 deterministic: bool = True):
        x = nn.Embed(self.idim, self.odim, name='embed')(x)
        x, pos_emb = self.pos_enc(x, offset, deterministic=deterministic)
        return x, pos_emb, x_mask

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return self.pos_enc.position_encoding(offset, size)


class StackNFramesSubsampling(nn.Module):
    """Frame stacking. ref: subsampling.py:339-394."""
    idim: int
    odim: int
    dropout_rate: float
    pos_enc: nn.Module
    stride: int = 2

    @property
    def subsampling_rate(self) -> int:
        return self.stride

    right_context: int = 0

    @nn.compact
    def __call__(self, x, x_mask, offset: IntLike = 0,
                 deterministic: bool = True):
        b, s, _ = x.shape
        seq_len = jnp.sum(x_mask[:, 0, :], axis=-1)
        s2 = s - s % self.stride
        x = x[:, :s2, :]
        seq_len = jnp.minimum(seq_len, s2) // self.stride
        x = x.reshape(b, s2 // self.stride, self.idim * self.stride)
        _, pos_emb = self.pos_enc(x, offset, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name='norm')(x)
        x = nn.Dense(self.odim, name='out')(x)
        new_mask = (jnp.arange(s2 // self.stride)[None, :] <
                    seq_len[:, None])[:, None, :]
        return x, pos_emb, new_mask

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return self.pos_enc.position_encoding(offset, size)


class Conv2dSubsampling2(nn.Module):
    """One stride-2 3x3 conv -> 1/2 length (efficient conformer).

    ref: wenet/models/efficient_conformer/subsampling.py:25-80."""
    idim: int
    odim: int
    dropout_rate: float
    pos_enc: nn.Module
    subsampling_rate: int = 2
    right_context: int = 2

    @nn.compact
    def __call__(self, x, x_mask, offset: IntLike = 0,
                 deterministic: bool = True):
        x = x[..., None]
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    name='conv_0')(x)
        x = jax.nn.relu(x)
        b, t, f, c = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)
        x = nn.Dense(self.odim, name='out')(x)
        x, pos_emb = self.pos_enc(x, offset, deterministic=deterministic)
        return x, pos_emb, x_mask[:, :, :-2:2]

    def position_encoding(self, offset: IntLike, size: int) -> jax.Array:
        return self.pos_enc.position_encoding(offset, size)


SUBSAMPLE_CLASSES = {
    'linear': LinearNoSubsampling,
    'conv2d2': Conv2dSubsampling2,
    'embed': EmbedNoSubsampling,
    'conv1d2': Conv1dSubsampling2,
    'conv2d': Conv2dSubsampling4,
    'conv2d6': Conv2dSubsampling6,
    'conv2d8': Conv2dSubsampling8,
    'stack_n_frames': StackNFramesSubsampling,
}
