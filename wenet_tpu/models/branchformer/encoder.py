"""Branchformer encoder. ref: wenet/models/branchformer/encoder.py:28-170,
encoder_layer.py:26-260."""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.branchformer.cgmlp import ConvolutionalGatingMLP
from wenet_tpu.models.transformer.attention import (T_CACHE,
                                                    ATTENTION_CLASSES)
from wenet_tpu.models.transformer.encoder import BaseEncoder


class BranchformerEncoderLayer(nn.Module):
    """Parallel MHA + cgMLP branches. ref: encoder_layer.py:26-260."""
    size: int
    attention_heads: int
    attention_dropout_rate: float = 0.0
    selfattention_layer_type: str = 'rel_selfattn'
    use_attn: bool = True
    use_cgmlp: bool = True
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    use_linear_after_conv: bool = False
    gate_activation: str = 'identity'
    causal: bool = False  # ref branchformer/encoder.py:57 default
    dropout_rate: float = 0.1
    merge_method: str = 'concat'
    cgmlp_weight: float = 0.5
    attn_branch_drop_rate: float = 0.0
    stochastic_depth_rate: float = 0.0

    @property
    def _use_attn(self) -> bool:
        if self.merge_method == 'fixed_ave' and self.cgmlp_weight == 1.0:
            return False
        return self.use_attn

    @property
    def _use_cgmlp(self) -> bool:
        if self.merge_method == 'fixed_ave' and self.cgmlp_weight == 0.0:
            return False
        return self.use_cgmlp

    @property
    def use_two_branches(self) -> bool:
        return self._use_attn and self._use_cgmlp

    def setup(self):
        if self._use_attn:
            self.attn = ATTENTION_CLASSES[self.selfattention_layer_type](
                n_head=self.attention_heads, n_feat=self.size,
                dropout_rate=self.attention_dropout_rate, name='attn')
            self.norm_mha = nn.LayerNorm(epsilon=1e-5, name='norm_mha')
        if self._use_cgmlp:
            self.cgmlp = ConvolutionalGatingMLP(
                size=self.size, linear_units=self.cgmlp_linear_units,
                kernel_size=self.cgmlp_conv_kernel,
                dropout_rate=self.dropout_rate,
                use_linear_after_conv=self.use_linear_after_conv,
                gate_activation=self.gate_activation, causal=self.causal,
                name='cgmlp')
            self.norm_mlp = nn.LayerNorm(epsilon=1e-5, name='norm_mlp')
        self.norm_final = nn.LayerNorm(epsilon=1e-5, name='norm_final')
        self.pooling_proj1 = nn.Dense(1, name='pooling_proj1')
        self.pooling_proj2 = nn.Dense(1, name='pooling_proj2')
        self.weight_proj1 = nn.Dense(1, name='weight_proj1')
        self.weight_proj2 = nn.Dense(1, name='weight_proj2')
        if self.use_two_branches or (
                self.merge_method == 'fixed_ave' and
                (self.use_attn or self.use_cgmlp)):
            # fixed_ave keeps a real merge_proj even when one branch
            # degenerates away (ref encoder_layer.py:90-106); other
            # single-branch setups use Identity
            self.merge_proj = nn.Dense(self.size, name='merge_proj')
        self.dropout = Dropout(self.dropout_rate)

    def _pool_weight(self, proj, wproj, x, mask_pad):
        score = jnp.swapaxes(proj(x), 1, 2) / self.size**0.5  # (B,1,T)
        if mask_pad is not None:
            score = jnp.where(mask_pad, score, -1e30)
        w = jax.nn.softmax(score, axis=-1)
        if mask_pad is not None:
            w = jnp.where(mask_pad, w, 0.0)
        pooled = jnp.einsum('bot,btd->bod', w, x)[:, 0]  # (B, size)
        return wproj(pooled)  # (B, 1)

    def __call__(self, x, mask=None, pos_emb=None, mask_pad=None,
                 att_cache: Optional[T_CACHE] = None, cnn_cache=None,
                 train: bool = False):
        det = not train
        x1, x2 = x, x
        new_att_cache, new_cnn_cache = None, None
        if self._use_attn:
            x1 = self.norm_mha(x1)
            x_att, new_att_cache = self.attn(x1, x1, x1, mask, pos_emb,
                                             cache=att_cache,
                                             deterministic=det)
            x1 = self.dropout(x_att, deterministic=det)
        if self._use_cgmlp:
            x2 = self.norm_mlp(x2)
            x2, new_cnn_cache = self.cgmlp(x2, mask_pad, cnn_cache,
                                           train=train)
            x2 = self.dropout(x2, deterministic=det)

        if self.use_two_branches:
            if self.merge_method == 'concat':
                merged = self.merge_proj(
                    jnp.concatenate([x1, x2], axis=-1))
            elif self.merge_method == 'learned_ave':
                w1 = self._pool_weight(self.pooling_proj1,
                                       self.weight_proj1, x1, mask_pad)
                w2 = self._pool_weight(self.pooling_proj2,
                                       self.weight_proj2, x2, mask_pad)
                mw = jax.nn.softmax(
                    jnp.concatenate([w1, w2], axis=-1), axis=-1)
                mw1 = mw[:, 0:1, None]
                mw2 = mw[:, 1:2, None]
                if train and self.attn_branch_drop_rate > 0:
                    # drop the attn branch with prob p during training
                    # (ref encoder_layer.py:148-152)
                    drop = jax.random.bernoulli(
                        self.make_rng('dropout'),
                        self.attn_branch_drop_rate)
                    mw1 = jnp.where(drop, 0.0, mw1)
                    mw2 = jnp.where(drop, 1.0, mw2)
                merged = self.merge_proj(mw1 * x1 + mw2 * x2)
            else:  # fixed_ave
                merged = self.merge_proj(
                    (1.0 - self.cgmlp_weight) * x1 +
                    self.cgmlp_weight * x2)
        elif self.merge_method == 'fixed_ave':
            # degenerate fixed_ave still projects (ref :106)
            merged = self.merge_proj(x1 if self._use_attn else x2)
        elif self._use_attn:
            merged = x1
        else:
            merged = x2
        # stochastic depth: residual becomes x + f(x)/(1-p) at train
        # time (ref encoder_layer.py:240-245)
        coeff = (1.0 / (1.0 - self.stochastic_depth_rate)
                 if train and self.stochastic_depth_rate > 0 else 1.0)
        x = x + coeff * self.dropout(merged, deterministic=det)
        x = self.norm_final(x)
        return x, mask, new_att_cache, new_cnn_cache


class BranchformerEncoder(BaseEncoder):
    """ref: encoder.py:28-170."""
    use_attn: bool = True
    selfattention_layer_type: str = 'rel_selfattn'
    pos_enc_layer_type: str = 'rel_pos'
    use_cgmlp: bool = True
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    use_linear_after_conv: bool = False
    gate_activation: str = 'identity'
    merge_method: str = 'concat'
    cgmlp_weight: float = 0.5
    attn_branch_drop_rate: float = 0.0
    stochastic_depth_rate: float = 0.0
    causal: bool = False  # ref branchformer/encoder.py:57 default

    @property
    def cnn_lorder(self) -> int:
        if self.use_cgmlp and self.causal:
            return self.cgmlp_conv_kernel - 1
        return 0

    @property
    def cnn_cache_channels(self) -> int:
        return self.cgmlp_linear_units // 2

    def make_layers(self):
        return [
            BranchformerEncoderLayer(
                size=self.output_size,
                attention_heads=self.attention_heads,
                attention_dropout_rate=self.attention_dropout_rate,
                selfattention_layer_type=self.selfattention_layer_type,
                use_attn=self.use_attn, use_cgmlp=self.use_cgmlp,
                cgmlp_linear_units=self.cgmlp_linear_units,
                cgmlp_conv_kernel=self.cgmlp_conv_kernel,
                use_linear_after_conv=self.use_linear_after_conv,
                gate_activation=self.gate_activation, causal=self.causal,
                dropout_rate=self.dropout_rate,
                merge_method=self.merge_method,
                cgmlp_weight=self.cgmlp_weight,
                attn_branch_drop_rate=self.attn_branch_drop_rate,
                stochastic_depth_rate=self.stochastic_depth_rate,
            ) for _ in range(self.num_blocks)
        ]
