"""E-Branchformer encoder. ref: wenet/models/e_branchformer/encoder.py:32-170,
encoder_layer.py:27-200."""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.branchformer.cgmlp import ConvolutionalGatingMLP
from wenet_tpu.models.transformer.attention import (T_CACHE,
                                                    ATTENTION_CLASSES)
from wenet_tpu.models.transformer.encoder import BaseEncoder
from wenet_tpu.models.transformer.positionwise_feed_forward import (
    MLP_CLASSES)


class EBranchformerEncoderLayer(nn.Module):
    """Macaron FFN + (MHA || cgMLP) + depthwise-conv merge + FFN.

    ref: e_branchformer/encoder_layer.py:27-200."""
    size: int
    attention_heads: int
    linear_units: int
    attention_dropout_rate: float = 0.0
    selfattention_layer_type: str = 'rel_selfattn'
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    use_linear_after_conv: bool = False
    gate_activation: str = 'identity'
    causal: bool = False  # ref branchformer/encoder.py:57 default
    dropout_rate: float = 0.1
    merge_conv_kernel: int = 3
    use_ffn: bool = True
    macaron_style: bool = True
    activation_type: str = 'swish'
    mlp_type: str = 'position_wise_feed_forward'
    mlp_bias: bool = True
    stochastic_depth_rate: float = 0.0

    @property
    def merge_lorder(self) -> int:
        return self.merge_conv_kernel - 1 if self.causal else 0

    @property
    def ff_scale(self) -> float:
        return 0.5 if self.macaron_style else 1.0

    def setup(self):
        self.attn = ATTENTION_CLASSES[self.selfattention_layer_type](
            n_head=self.attention_heads, n_feat=self.size,
            dropout_rate=self.attention_dropout_rate, name='attn')
        self.cgmlp = ConvolutionalGatingMLP(
            size=self.size, linear_units=self.cgmlp_linear_units,
            kernel_size=self.cgmlp_conv_kernel,
            dropout_rate=self.dropout_rate,
            use_linear_after_conv=self.use_linear_after_conv,
            gate_activation=self.gate_activation, causal=self.causal,
            name='cgmlp')
        mlp_cls = MLP_CLASSES[self.mlp_type]
        mlp_kwargs = dict(idim=self.size,
                          hidden_units=self.linear_units,
                          dropout_rate=self.dropout_rate,
                          activation=self.activation_type,
                          bias=self.mlp_bias)
        if self.use_ffn:
            self.feed_forward = mlp_cls(**mlp_kwargs,
                                        name='feed_forward')
            self.norm_ff = nn.LayerNorm(epsilon=1e-5, name='norm_ff')
            if self.macaron_style:
                self.feed_forward_macaron = mlp_cls(
                    **mlp_kwargs, name='feed_forward_macaron')
                self.norm_ff_macaron = nn.LayerNorm(
                    epsilon=1e-5, name='norm_ff_macaron')
        self.norm_mha = nn.LayerNorm(epsilon=1e-5, name='norm_mha')
        self.norm_mlp = nn.LayerNorm(epsilon=1e-5, name='norm_mlp')
        self.norm_final = nn.LayerNorm(epsilon=1e-5, name='norm_final')
        self.depthwise_conv_fusion = nn.Conv(
            2 * self.size, (self.merge_conv_kernel,),
            padding='VALID' if self.causal else
            [(self.merge_conv_kernel // 2, self.merge_conv_kernel // 2)],
            feature_group_count=2 * self.size,
            name='depthwise_conv_fusion')
        self.merge_proj = nn.Dense(self.size, name='merge_proj')
        self.dropout = Dropout(self.dropout_rate)

    def __call__(self, x, mask=None, pos_emb=None, mask_pad=None,
                 att_cache: Optional[T_CACHE] = None, cnn_cache=None,
                 train: bool = False):
        det = not train
        if self.use_ffn and self.macaron_style:
            residual = x
            x = self.norm_ff_macaron(x)
            x = residual + self.ff_scale * self.dropout(
                self.feed_forward_macaron(x, deterministic=det),
                deterministic=det)

        x1, x2 = x, x
        x1 = self.norm_mha(x1)
        x_att, new_att_cache = self.attn(x1, x1, x1, mask, pos_emb,
                                         cache=att_cache,
                                         deterministic=det)
        x1 = self.dropout(x_att, deterministic=det)

        x2 = self.norm_mlp(x2)
        x2, new_cnn_cache = self.cgmlp(x2, mask_pad, cnn_cache,
                                       train=train)
        x2 = self.dropout(x2, deterministic=det)

        x_concat = jnp.concatenate([x1, x2], axis=-1)
        x_tmp = x_concat
        if self.merge_lorder > 0:
            # the merge conv is zero-padded EVERY call — the reference
            # keeps no cross-chunk cache for it in streaming either
            # (ref encoder_layer.py:130-134), so chunked decode matches
            # the reference exactly
            x_tmp = jnp.pad(
                x_tmp, ((0, 0), (self.merge_lorder, 0), (0, 0)))
        x_tmp = self.depthwise_conv_fusion(x_tmp)
        x = x + self.dropout(self.merge_proj(x_concat + x_tmp),
                             deterministic=det)

        if self.use_ffn:
            residual = x
            x = self.norm_ff(x)
            x = residual + self.ff_scale * self.dropout(
                self.feed_forward(x, deterministic=det),
                deterministic=det)
        x = self.norm_final(x)
        return x, mask, new_att_cache, new_cnn_cache


class EBranchformerEncoder(BaseEncoder):
    """ref: e_branchformer/encoder.py:32-170."""
    selfattention_layer_type: str = 'rel_selfattn'
    pos_enc_layer_type: str = 'rel_pos'
    activation_type: str = 'swish'
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    use_linear_after_conv: bool = False
    gate_activation: str = 'identity'
    merge_conv_kernel: int = 3
    use_ffn: bool = True
    macaron_style: bool = True
    stochastic_depth_rate: float = 0.0
    causal: bool = False  # ref branchformer/encoder.py:57 default

    @property
    def cnn_lorder(self) -> int:
        if self.causal:
            return self.cgmlp_conv_kernel - 1
        return 0

    @property
    def cnn_cache_channels(self) -> int:
        return self.cgmlp_linear_units // 2

    def make_layers(self):
        return [
            EBranchformerEncoderLayer(
                size=self.output_size,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                attention_dropout_rate=self.attention_dropout_rate,
                selfattention_layer_type=self.selfattention_layer_type,
                cgmlp_linear_units=self.cgmlp_linear_units,
                cgmlp_conv_kernel=self.cgmlp_conv_kernel,
                use_linear_after_conv=self.use_linear_after_conv,
                gate_activation=self.gate_activation, causal=self.causal,
                dropout_rate=self.dropout_rate,
                merge_conv_kernel=self.merge_conv_kernel,
                use_ffn=self.use_ffn,
                macaron_style=self.macaron_style,
                activation_type=self.activation_type,
                mlp_type=self.mlp_type, mlp_bias=self.mlp_bias,
                stochastic_depth_rate=self.stochastic_depth_rate,
            ) for _ in range(self.num_blocks)
        ]
