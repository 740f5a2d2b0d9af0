"""Decoder layer. ref: wenet/models/transformer/decoder_layer.py:25-155.

Besides the full-sequence `__call__`, the layer exposes a `step` method
used by the scan-based beam search: self-attention writes into a
fixed-size ring cache at `step` and cross-attention reuses precomputed
encoder kv — no growing tensors, one compilation for the whole decode.
"""

from typing import Optional, Tuple

import jax
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.transformer.attention import (
    T_CACHE, MultiHeadedAttention, MultiHeadedCrossAttention)
from wenet_tpu.models.transformer.norm import get_norm
from wenet_tpu.models.transformer.positionwise_feed_forward import (
    MLP_CLASSES)


class DecoderLayer(nn.Module):
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    src_attention: bool = True
    layer_norm_type: str = 'layer_norm'
    norm_eps: float = 1e-5
    activation_type: str = 'relu'
    mlp_type: str = 'position_wise_feed_forward'
    mlp_bias: bool = True
    n_expert: int = 8
    n_expert_activated: int = 2
    query_bias: bool = True
    key_bias: bool = True
    value_bias: bool = True
    src_query_bias: bool = True
    src_key_bias: bool = True
    src_value_bias: bool = True
    n_kv_head: Optional[int] = None
    head_dim: Optional[int] = None
    lora_conf: Optional[Tuple] = None

    def setup(self):
        self.self_attn = MultiHeadedAttention(
            n_head=self.attention_heads, n_feat=self.size,
            dropout_rate=self.self_attention_dropout_rate,
            query_bias=self.query_bias, key_bias=self.key_bias,
            value_bias=self.value_bias, n_kv_head=self.n_kv_head,
            head_dim=self.head_dim, lora_conf=self.lora_conf,
            name='self_attn')
        if self.src_attention:
            self.src_attn = MultiHeadedCrossAttention(
                n_head=self.attention_heads, n_feat=self.size,
                dropout_rate=self.src_attention_dropout_rate,
                query_bias=self.src_query_bias, key_bias=self.src_key_bias,
                value_bias=self.src_value_bias, n_kv_head=self.n_kv_head,
                head_dim=self.head_dim, lora_conf=self.lora_conf,
                name='src_attn')
        mlp_kwargs = dict(idim=self.size, hidden_units=self.linear_units,
                          dropout_rate=self.dropout_rate,
                          activation=self.activation_type,
                          bias=self.mlp_bias)
        if self.mlp_type == 'moe':
            mlp_kwargs.update(n_expert=self.n_expert,
                              n_expert_activated=self.n_expert_activated)
        self.feed_forward = MLP_CLASSES[self.mlp_type](**mlp_kwargs,
                                                       name='feed_forward')
        self.norm1 = get_norm(self.layer_norm_type, self.size,
                              self.norm_eps, name='norm1')
        self.norm2 = get_norm(self.layer_norm_type, self.size,
                              self.norm_eps, name='norm2')
        self.norm3 = get_norm(self.layer_norm_type, self.size,
                              self.norm_eps, name='norm3')
        self.dropout = Dropout(self.dropout_rate)

    def __call__(self, tgt, tgt_mask, memory, memory_mask,
                 train: bool = False):
        """Full-sequence decode. ref: decoder_layer.py:69-155."""
        det = not train
        residual = tgt
        x = self.norm1(tgt) if self.normalize_before else tgt
        x_att, _ = self.self_attn(x, x, x, tgt_mask, deterministic=det)
        x = residual + self.dropout(x_att, deterministic=det)
        if not self.normalize_before:
            x = self.norm1(x)

        if self.src_attention:
            residual = x
            if self.normalize_before:
                x = self.norm2(x)
            x_att, _ = self.src_attn(x, memory, memory, memory_mask,
                                     deterministic=det)
            x = residual + self.dropout(x_att, deterministic=det)
            if not self.normalize_before:
                x = self.norm2(x)

        residual = x
        if self.normalize_before:
            x = self.norm3(x)
        x = residual + self.dropout(self.feed_forward(x, deterministic=det),
                                    deterministic=det)
        if not self.normalize_before:
            x = self.norm3(x)
        return x, tgt_mask, memory, memory_mask

    def precompute_cross_kv(self, memory) -> Optional[T_CACHE]:
        if not self.src_attention:
            return None
        return self.src_attn.project_kv(memory, memory)

    def step(self, x_q: jax.Array, step: jax.Array,
             self_cache: T_CACHE, cross_kv: Optional[T_CACHE],
             memory_mask: Optional[jax.Array]
             ) -> Tuple[jax.Array, T_CACHE]:
        """Single-token step with ring self-cache + cached cross kv."""
        residual = x_q
        x = self.norm1(x_q) if self.normalize_before else x_q
        x_att, new_self_cache = self.self_attn.decode_step(
            x, self_cache, step)
        x = residual + x_att
        if not self.normalize_before:
            x = self.norm1(x)

        if self.src_attention:
            residual = x
            if self.normalize_before:
                x = self.norm2(x)
            x_att, _ = self.src_attn(x, x, x, memory_mask, cache=cross_kv)
            x = residual + x_att
            if not self.normalize_before:
                x = self.norm2(x)

        residual = x
        if self.normalize_before:
            x = self.norm3(x)
        x = residual + self.feed_forward(x, deterministic=True)
        if not self.normalize_before:
            x = self.norm3(x)
        return x, new_self_cache
