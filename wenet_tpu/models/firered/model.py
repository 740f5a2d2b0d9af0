"""FireRed AED model family.

ref: wenet/models/firered/{model.py:26-63, attention.py:25-160,
subsampling.py:23-90, encoder.py:13-130, encoder_layer.py:9-43}.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.transformer.asr_model import ASRModel
from wenet_tpu.models.transformer.encoder import BaseEncoder
from wenet_tpu.models.transformer.attention import ATTENTION_CLASSES
from wenet_tpu.models.transformer.encoder_layer import (
    ConformerEncoderLayer)
from wenet_tpu.utils.mask import make_pad_mask


def firered_rel_pos_emb(T: int, d_model: int,
                        dtype=jnp.float32) -> jax.Array:
    """Symmetric PE over relative positions T-1 .. -(T-1) -> (1, 2T-1, d).

    ref: attention.py:25-56 (pe_positive flipped + pe_negative[1:])."""
    r = (T - 1) - jnp.arange(2 * T - 1, dtype=dtype)  # T-1 .. -(T-1)
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=dtype) *
        (-math.log(10000.0) / d_model))
    ang = r[:, None] * div
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return pe.reshape(1, 2 * T - 1, d_model)


def firered_rel_shift(x: jax.Array) -> jax.Array:
    """(B, H, T, 2T-1) -> (B, H, T, T) legacy XL shift.

    ref: attention.py:87-105."""
    B, H, T1, T2 = x.shape
    zero_pad = jnp.zeros((B, H, T1, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(B, H, T2 + 1, T1)
    x = x_padded[:, :, 1:].reshape(B, H, T1, T2)
    return x[:, :, :, :T2 // 2 + 1]


class FireRedRelPosAttention(nn.Module):
    """rel-pos MHA with q/k/v layer norms + legacy rel shift.

    ref: attention.py:59-160."""
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    query_bias: bool = True
    key_bias: bool = True
    value_bias: bool = True
    n_kv_head: Optional[int] = None
    head_dim: Optional[int] = None
    lora_conf: Optional[Tuple] = None

    @property
    def d_k(self):
        return self.n_feat // self.n_head

    @nn.compact
    def __call__(self, x, mask=None, pos_emb=None, cache=None,
                 **kwargs):
        B, T, _ = x.shape
        q_in = nn.LayerNorm(name='layer_norm_q')(x)
        k_in = nn.LayerNorm(name='layer_norm_k')(x)
        v_in = nn.LayerNorm(name='layer_norm_v')(x)

        def heads(t):
            return jnp.swapaxes(
                t.reshape(t.shape[0], -1, self.n_head, self.d_k), 1, 2)

        q = heads(nn.Dense(self.n_feat, use_bias=self.query_bias,
                           name='linear_q')(q_in))
        k = heads(nn.Dense(self.n_feat, use_bias=self.key_bias,
                           name='linear_k')(k_in))
        v = heads(nn.Dense(self.n_feat, use_bias=self.value_bias,
                           name='linear_v')(v_in))
        p = heads(nn.Dense(self.n_feat, use_bias=False,
                           name='linear_pos')(pos_emb))
        u = self.param('pos_bias_u', nn.initializers.xavier_uniform(),
                       (self.n_head, self.d_k)).astype(q.dtype)
        w = self.param('pos_bias_v', nn.initializers.xavier_uniform(),
                       (self.n_head, self.d_k)).astype(q.dtype)
        ac = jnp.einsum('bhqd,bhkd->bhqk', q + u[None, :, None, :], k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum('bhqd,bhkd->bhqk', q + w[None, :, None, :], p,
                        preferred_element_type=jnp.float32)
        bd = firered_rel_shift(bd)
        scores = (ac + bd) / math.sqrt(self.d_k)
        if mask is not None:
            m = mask[..., None, :, :]
            scores = jnp.where(m, scores, -1.0e30)
        attn = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = jnp.where(m, attn, 0.0)
        ctx = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(v.dtype), v)
        ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, T, self.n_feat)
        out = nn.Dense(self.n_feat, use_bias=self.query_bias,
                       name='linear_out')(ctx)
        return out, (k, v)


class _FireRedConformerLayer(ConformerEncoderLayer):
    """Conformer layer with Identity norm_mha (ref encoder_layer.py:42-43:
    the attention normalizes q/k/v itself)."""

    def setup(self):
        super().setup()

    def __call__(self, x, mask=None, pos_emb=None, mask_pad=None,
                 att_cache=None, cnn_cache=None, train: bool = False):
        # identical to ConformerEncoderLayer but skipping norm_mha
        det = not train
        if self.macaron_style:
            residual = x
            if self.normalize_before:
                x = self.norm_ff_macaron(x)
            x = residual + self.ff_scale * self.dropout(
                self.feed_forward_macaron(x, deterministic=det),
                deterministic=det)
        residual = x
        x_att, new_att_cache = self.self_attn(x, mask, pos_emb,
                                              cache=att_cache)
        x = residual + self.dropout(x_att, deterministic=det)
        new_cnn_cache = None
        if self.use_cnn_module:
            residual = x
            if self.normalize_before:
                x = self.norm_conv(x)
            x, new_cnn_cache = self.conv_module(x, mask_pad, cnn_cache,
                                               train=train)
            x = residual + self.dropout(x, deterministic=det)
        residual = x
        if self.normalize_before:
            x = self.norm_ff(x)
        x = residual + self.ff_scale * self.dropout(
            self.feed_forward(x, deterministic=det), deterministic=det)
        if self.use_cnn_module:
            x = self.norm_final(x)
        return x, mask, new_att_cache, new_cnn_cache

    # make self_attn FireRed flavor
    ATTENTION_OVERRIDE = True


class FireRedConformerEncoder(BaseEncoder):
    """ref: encoder.py:13-130 (after_norm == Identity, own PE +
    subsampling that right-pads by right_context)."""
    pos_enc_layer_type: str = 'rel_pos_firered'
    selfattention_layer_type: str = 'firered_rel_selfattn'
    activation_type: str = 'swish'
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 33
    causal: bool = False
    cnn_module_norm: str = 'batch_norm'
    conv_bias: bool = True
    conv_norm_eps: float = 1e-5
    conv_inner_factor: int = 2
    odim_conv: int = 32

    @property
    def cnn_lorder(self) -> int:
        return 0

    def setup(self):
        if self.use_cmvn:
            from wenet_tpu.models.transformer.cmvn import GlobalCMVN
            self.global_cmvn = GlobalCMVN(self.input_size,
                                          self.cmvn_norm_var,
                                          name='global_cmvn')
        self.embed = _FireRedSubsampling(idim=self.input_size,
                                         d_model=self.output_size,
                                         odim=self.odim_conv,
                                         name='embed')
        self.encoders = [
            _FireRedConformerLayer(
                size=self.output_size,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                normalize_before=self.normalize_before,
                selfattention_layer_type='firered_rel_selfattn',
                activation_type=self.activation_type,
                macaron_style=self.macaron_style,
                use_cnn_module=self.use_cnn_module,
                cnn_module_kernel=self.cnn_module_kernel,
                causal=self.causal,
                cnn_module_norm=self.cnn_module_norm,
                conv_bias=self.conv_bias,
                conv_norm_eps=self.conv_norm_eps,
                conv_inner_factor=self.conv_inner_factor,
            ) for _ in range(self.num_blocks)
        ]

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, train: bool = False,
                 chunk_rng=None):
        T = xs.shape[1]
        masks = ~make_pad_mask(xs_lens, T)[:, None, :]
        if self.use_cmvn:
            xs = self.global_cmvn(xs)
        xs, pos_emb, masks = self.embed(xs, masks,
                                        deterministic=not train)
        mask_pad = masks
        chunk_masks = masks  # AED only, full context
        for layer in self.encoders:
            xs, chunk_masks, _, _ = layer(xs, chunk_masks, pos_emb,
                                          mask_pad, train=train)
        return xs, masks


class _FireRedSubsampling(nn.Module):
    """Conv2d/4 with right_context zero right-pad. ref: subsampling.py:23-90."""
    idim: int
    d_model: int
    odim: int = 32
    subsampling_rate: int = 4
    right_context: int = 6

    @nn.compact
    def __call__(self, x, x_mask, offset=0, deterministic: bool = True):
        lens = jnp.sum(x_mask[:, 0, :], -1) + self.right_context
        x = jnp.pad(x, ((0, 0), (0, self.right_context), (0, 0)))
        T = x.shape[1]
        x_mask = (~make_pad_mask(lens, T))[:, None, :]
        x = x[..., None]
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    name='conv_0')(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    name='conv_1')(x)
        x = jax.nn.relu(x)
        b, t, f, c = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)
        x = nn.Dense(self.d_model, name='out')(x)
        pos_emb = firered_rel_pos_emb(t, self.d_model).astype(x.dtype)
        return x, pos_emb, x_mask[:, :, :-2:2][:, :, :-2:2]


class FireRedModel(ASRModel):
    """ref: model.py:26-63 (AR-only decode)."""
    default_decode_method: str = 'attention'

    @property
    def sos(self) -> int:
        return self.special_tokens['sos']

    @property
    def eos(self) -> int:
        return self.special_tokens['eos']


ATTENTION_CLASSES['firered_rel_selfattn'] = FireRedRelPosAttention
