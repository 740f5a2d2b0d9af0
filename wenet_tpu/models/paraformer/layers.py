"""Paraformer layers: LFR, SANM encoder/decoder.

ref: wenet/models/paraformer/layers.py:24-500, subsampling.py, embedding.py.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.paraformer.attention import (DummyMultiHeadSANM,
                                                   MultiHeadAttentionCross,
                                                   MultiHeadedAttentionSANM)
from wenet_tpu.models.transformer.cmvn import GlobalCMVN
from wenet_tpu.models.transformer.embedding import (
    whisper_position_encoding)
from wenet_tpu.models.transformer.positionwise_feed_forward import (
    PositionwiseFeedForward)
from wenet_tpu.utils.mask import make_pad_mask


def lfr(input: jax.Array, input_lens: jax.Array, m: int = 7, n: int = 6
        ) -> Tuple[jax.Array, jax.Array]:
    """Low frame rate stacking: stack m frames every n.

    ref: layers.py:24-93 (head frame replicated left, tail frame
    replicated right; gather formulation, fixed shapes)."""
    B, T, D = input.shape
    left = math.ceil((m - 1) // 2)
    n_lfr = (T + n - 1) // n  # static output length (padded batch)
    new_len = (left + input_lens +
               jnp.maximum(m - (input_lens + left - n *
                                (jnp.ceil(input_lens / n).astype(
                                    input_lens.dtype) - 1)), 0)) // n
    # per (output frame i, stack slot j): source index i*n - left + j,
    # head pad = frame 0, tail pad = last VALID frame.  The stacking
    # itself uses STATIC strided slices (pure data movement XLA can
    # fuse/copy-elide, vs a batch-dependent take_along_axis that
    # lowers to a generic dynamic gather); only the replicate-last-
    # frame tail is a dynamic fix-up.
    pad_tail = (n_lfr - 1) * n - left + (m - 1) - T + 1
    x = input
    if left > 0:
        x = jnp.concatenate(
            [jnp.repeat(x[:, :1], left, axis=1), x], axis=1)
    if pad_tail > 0:
        x = jnp.concatenate(
            [x, jnp.zeros((B, pad_tail, D), x.dtype)], axis=1)
    cols = [x[:, j:j + n_lfr * n:n, :] for j in range(m)]
    out = jnp.stack(cols, axis=2)  # (B, n_lfr, m, D)
    idx = (jnp.arange(n_lfr)[:, None] * n - left +
           jnp.arange(m)[None, :])  # (n_lfr, m)
    last = jnp.maximum(input_lens - 1, 0)  # (B,)
    over = idx[None, :, :] > last[:, None, None]  # (B, n_lfr, m)
    last_frame = jnp.take_along_axis(
        input, last[:, None, None], axis=1)  # (B, 1, D)
    out = jnp.where(over[..., None], last_frame[:, None, :, :], out)
    return out.reshape(B, n_lfr, m * D), new_len.astype(input_lens.dtype)


class SanmEncoder(nn.Module):
    """ref: layers.py:183-301."""
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    kernel_size: int = 11
    sanm_shfit: int = 0
    normalize_before: bool = True
    use_cmvn: bool = False
    cmvn_norm_var: bool = True
    gradient_checkpointing: bool = False
    input_layer: str = 'paraformer_dummy'
    use_dynamic_chunk: bool = False
    static_chunk_size: int = 0

    subsampling_rate: int = 6
    right_context: int = 6

    def setup(self):
        if self.use_cmvn:
            self.global_cmvn = GlobalCMVN(self.input_size,
                                          self.cmvn_norm_var,
                                          name='global_cmvn')
        self.encoders0 = [
            _AliParaformerEncoderLayer(
                size=self.output_size, in_size=self.input_size,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                kernel_size=self.kernel_size,
                sanm_shfit=self.sanm_shfit,
                normalize_before=self.normalize_before)
        ]
        self.encoders = [
            _AliParaformerEncoderLayer(
                size=self.output_size, in_size=self.output_size,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                kernel_size=self.kernel_size,
                sanm_shfit=self.sanm_shfit,
                normalize_before=self.normalize_before)
            for _ in range(self.num_blocks - 1)
        ]
        self.after_norm = nn.LayerNorm(epsilon=1e-5, name='after_norm')

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, train: bool = False,
                 chunk_rng=None):
        T = xs.shape[1]
        masks = ~make_pad_mask(xs_lens, T)[:, None, :]
        if self.use_cmvn:
            xs = self.global_cmvn(xs)
        # paraformer PE: whisper-style sinusoid at depth=input_size,
        # offset starts from 1, x scaled by sqrt(output_size)
        # (ref embedding.py:4-14, subsampling.py:40-50)
        pos = whisper_position_encoding(1, T, self.input_size).astype(
            xs.dtype)
        xs = xs * (self.output_size**0.5) + pos
        for layer in self.encoders0:
            xs = layer(xs, masks, masks, train=train)
        for layer in self.encoders:
            xs = layer(xs, masks, masks, train=train)
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs, masks


class _AliParaformerEncoderLayer(nn.Module):
    """ref: layers.py:126-181."""
    size: int
    in_size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    kernel_size: int = 11
    sanm_shfit: int = 0
    normalize_before: bool = True

    def setup(self):
        self.self_attn = MultiHeadedAttentionSANM(
            n_head=self.attention_heads, in_feat=self.in_size,
            n_feat=self.size,
            dropout_rate=self.attention_dropout_rate,
            kernel_size=self.kernel_size, sanm_shfit=self.sanm_shfit,
            name='self_attn')
        self.feed_forward = PositionwiseFeedForward(
            idim=self.size, hidden_units=self.linear_units,
            dropout_rate=self.dropout_rate, name='feed_forward')
        self.norm1 = nn.LayerNorm(epsilon=1e-5, name='norm1')
        self.norm2 = nn.LayerNorm(epsilon=1e-5, name='norm2')
        self.dropout = Dropout(self.dropout_rate)

    def __call__(self, x, mask, mask_pad, train: bool = False):
        det = not train
        residual = x
        if self.normalize_before:
            x = self.norm1(x)
        x_att, _ = self.self_attn(x, x, x, mask, mask_pad=mask_pad,
                                  deterministic=det)
        if self.in_size == self.size:
            x = residual + self.dropout(x_att, deterministic=det)
        else:
            x = self.dropout(x_att, deterministic=det)
        if not self.normalize_before:
            x = self.norm1(x)
        residual = x
        if self.normalize_before:
            x = self.norm2(x)
        x = residual + self.dropout(
            self.feed_forward(x, deterministic=det), deterministic=det)
        if not self.normalize_before:
            x = self.norm2(x)
        return x


class PositionwiseFeedForwardDecoderSANM(nn.Module):
    """w2(norm(dropout(act(w1(x))))). ref: layers.py:95-124."""
    idim: int
    hidden_units: int
    dropout_rate: float = 0.1
    adim: Optional[int] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.hidden_units, name='w_1')(x)
        h = Dropout(self.dropout_rate)(jax.nn.relu(h),
                                          deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name='norm')(h)
        out_dim = self.idim if self.adim is None else self.adim
        return nn.Dense(out_dim, use_bias=False, name='w_2')(h)


class SanmDecoderLayer(nn.Module):
    """ref: layers.py:315-380 (note: FFN first, eps 1e-12 norms)."""
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    kernel_size: int = 11
    sanm_shfit: int = 0
    normalize_before: bool = True

    def setup(self):
        self.self_attn = DummyMultiHeadSANM(
            n_head=self.attention_heads, in_feat=self.size,
            n_feat=self.size, dropout_rate=self.dropout_rate,
            kernel_size=self.kernel_size, sanm_shfit=self.sanm_shfit,
            name='self_attn')
        self.src_attn = MultiHeadAttentionCross(
            n_head=self.attention_heads, in_feat=self.size,
            n_feat=self.size, dropout_rate=self.dropout_rate,
            kernel_size=self.kernel_size, sanm_shfit=self.sanm_shfit,
            target_size=self.size, name='src_attn')
        self.feed_forward = PositionwiseFeedForwardDecoderSANM(
            idim=self.size, hidden_units=self.linear_units,
            dropout_rate=self.dropout_rate, name='feed_forward')
        self.norm1 = nn.LayerNorm(epsilon=1e-12, name='norm1')
        self.norm2 = nn.LayerNorm(epsilon=1e-12, name='norm2')
        self.norm3 = nn.LayerNorm(epsilon=1e-12, name='norm3')
        self.dropout = Dropout(self.dropout_rate)

    def __call__(self, tgt, tgt_mask, memory, memory_mask,
                 train: bool = False):
        det = not train
        residual = tgt
        if self.normalize_before:
            tgt = self.norm1(tgt)
        tgt = self.feed_forward(tgt, deterministic=det)
        x = tgt
        if self.normalize_before:
            tgt = self.norm2(tgt)
        x, _ = self.self_attn(tgt, tgt, tgt, tgt_mask,
                              mask_pad=tgt_mask, deterministic=det)
        x = residual + self.dropout(x, deterministic=det)
        residual = x
        if self.normalize_before:
            x = self.norm3(x)
        att, _ = self.src_attn(x, memory, memory, memory_mask,
                               mask_pad=memory_mask, deterministic=det)
        x = residual + self.dropout(att, deterministic=det)
        return x, tgt_mask, memory, memory_mask


class SanmDecoder(nn.Module):
    """NAR decoder over CIF acoustic embeddings. ref: layers.py:382-500."""
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    att_layer_num: int = 16
    kernel_size: int = 11
    sanm_shfit: int = 0
    normalize_before: bool = True
    use_output_layer: bool = True

    def setup(self):
        dim = self.encoder_output_size
        self.decoders = [
            SanmDecoderLayer(size=dim,
                             attention_heads=self.attention_heads,
                             linear_units=self.linear_units,
                             dropout_rate=self.dropout_rate,
                             kernel_size=self.kernel_size,
                             sanm_shfit=self.sanm_shfit,
                             normalize_before=self.normalize_before)
            for _ in range(self.num_blocks)
        ]
        self.decoders3 = [
            _Decoders3(hidden=dim, linear_units=self.linear_units,
                       dropout_rate=self.dropout_rate)
        ]
        self.after_norm = nn.LayerNorm(epsilon=1e-5, name='after_norm')
        if self.use_output_layer:
            self.output_layer = nn.Dense(self.vocab_size,
                                         name='output_layer')

    def __call__(self, encoder_out, encoder_out_mask, sematic_embeds,
                 ys_pad_lens, r_ys_in_pad=None,
                 reverse_weight: float = 0.0, train: bool = False):
        U = sematic_embeds.shape[1]
        ys_mask = (~make_pad_mask(ys_pad_lens, U))[:, None, :]
        x = sematic_embeds
        for layer in self.decoders:
            x, _, _, _ = layer(x, ys_mask, encoder_out,
                               encoder_out_mask, train=train)
        for layer in self.decoders3:
            x = layer(x, deterministic=not train)
        if self.normalize_before:
            x = self.after_norm(x)
        if self.use_output_layer:
            x = self.output_layer(x)
        return x, jnp.asarray(0.0), ys_pad_lens


class _Decoders3(nn.Module):
    """ref: layers.py:303-313."""
    hidden: int
    linear_units: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5, name='norm1')(x)
        return PositionwiseFeedForwardDecoderSANM(
            idim=self.hidden, hidden_units=self.linear_units,
            dropout_rate=self.dropout_rate,
            name='feed_forward')(h, deterministic=deterministic)
