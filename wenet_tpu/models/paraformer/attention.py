"""SANM attention (self-attn + FSMN memory block).

ref: wenet/models/paraformer/attention.py:10-230."""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.transformer.attention import attention_core


class MultiHeadedAttentionSANM(nn.Module):
    """Fused qkv + depthwise FSMN over values. ref: attention.py:10-117."""
    n_head: int
    in_feat: int
    n_feat: int
    dropout_rate: float = 0.0
    kernel_size: int = 11
    sanm_shfit: int = 0

    @property
    def d_k(self) -> int:
        return self.n_feat // self.n_head

    @property
    def paddings(self) -> Tuple[int, int]:
        left = (self.kernel_size - 1) // 2 + self.sanm_shfit
        right = self.kernel_size - 1 - left
        return left, right

    def setup(self):
        self.linear_q_k_v = nn.Dense(self.n_feat * 3,
                                     name='linear_q_k_v')
        self.linear_out = nn.Dense(self.n_feat, name='linear_out')
        self.fsmn_block = nn.Conv(self.n_feat, (self.kernel_size,),
                                  padding='VALID',
                                  feature_group_count=self.n_feat,
                                  use_bias=False, name='fsmn_block')
        self.dropout = Dropout(self.dropout_rate)

    def forward_fsmn(self, v: jax.Array, mask_pad: Optional[jax.Array],
                     deterministic: bool = True) -> jax.Array:
        """v: (B, T, n_feat) value sequence."""
        if mask_pad is not None:
            m = jnp.swapaxes(mask_pad, 1, 2).astype(v.dtype)  # (B, T, 1)
            v = v * m
        left, right = self.paddings
        x = jnp.pad(v, ((0, 0), (left, right), (0, 0)))
        x = self.fsmn_block(x)
        x = x + v
        x = self.dropout(x, deterministic=deterministic)
        if mask_pad is not None:
            x = x * m
        return x

    def __call__(self, query, key, value, mask=None, mask_pad=None,
                 pos_emb=None, cache=None, deterministic: bool = True):
        x = query
        B, T, _ = x.shape
        qkv = self.linear_q_k_v(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        fsmn_memory = self.forward_fsmn(v, mask_pad, deterministic)

        def heads(t):
            return jnp.swapaxes(
                t.reshape(B, T, self.n_head, self.d_k), 1, 2)

        q, k, v = heads(q), heads(k), heads(v)
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=-2)
            v = jnp.concatenate([cache[1], v], axis=-2)
        new_cache = (k, v)
        m = mask[..., None, :, :] if mask is not None else None
        ctx = attention_core(q, k, v, m, 1.0 / math.sqrt(self.d_k))
        ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, T, self.n_feat)
        return self.linear_out(ctx) + fsmn_memory, new_cache


class DummyMultiHeadSANM(nn.Module):
    """FSMN-only block (paraformer decoder 'self attention').

    ref: attention.py:119-161."""
    n_head: int
    in_feat: int
    n_feat: int
    dropout_rate: float = 0.0
    kernel_size: int = 11
    sanm_shfit: int = 0

    @property
    def paddings(self) -> Tuple[int, int]:
        left = (self.kernel_size - 1) // 2 + self.sanm_shfit
        right = self.kernel_size - 1 - left
        return left, right

    def setup(self):
        self.fsmn_block = nn.Conv(self.n_feat, (self.kernel_size,),
                                  padding='VALID',
                                  feature_group_count=self.n_feat,
                                  use_bias=False, name='fsmn_block')
        self.dropout = Dropout(self.dropout_rate)

    def __call__(self, query, key, value, mask=None, mask_pad=None,
                 pos_emb=None, cache=None, deterministic: bool = True):
        x = query
        if mask_pad is not None:
            m = jnp.swapaxes(mask_pad, 1, 2).astype(x.dtype)
            x = x * m
        inputs = x
        left, right = self.paddings
        y = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
        y = self.fsmn_block(y)
        y = y + inputs
        y = self.dropout(y, deterministic=deterministic)
        if mask_pad is not None:
            y = y * m
        return y, None


class MultiHeadAttentionCross(nn.Module):
    """Cross attention with fused kv. ref: attention.py:163-230."""
    n_head: int
    in_feat: int
    n_feat: int
    dropout_rate: float = 0.0
    kernel_size: int = 11
    sanm_shfit: int = 0
    target_size: Optional[int] = None

    @property
    def d_k(self) -> int:
        return self.n_feat // self.n_head

    def setup(self):
        self.linear_q = nn.Dense(self.n_feat, name='linear_q')
        self.linear_k_v = nn.Dense(self.n_feat * 2, name='linear_k_v')
        self.linear_out = nn.Dense(self.n_feat, name='linear_out')

    def __call__(self, query, key, value, mask=None, mask_pad=None,
                 pos_emb=None, cache=None, deterministic: bool = True):
        B = query.shape[0]
        q = self.linear_q(query)
        q = jnp.swapaxes(
            q.reshape(B, -1, self.n_head, self.d_k), 1, 2)
        kv = self.linear_k_v(key)
        k, v = jnp.split(kv, 2, axis=-1)
        k = jnp.swapaxes(
            k.reshape(B, -1, self.n_head, self.d_k), 1, 2)
        v = jnp.swapaxes(
            v.reshape(B, -1, self.n_head, self.d_k), 1, 2)
        m = mask[..., None, :, :] if mask is not None else None
        ctx = attention_core(q, k, v, m, 1.0 / math.sqrt(self.d_k))
        ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, -1, self.n_feat)
        return self.linear_out(ctx), None
