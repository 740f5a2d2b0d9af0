"""Encoder layers. ref: wenet/models/transformer/encoder_layer.py:28-265."""

from typing import Optional, Tuple

import jax
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.transformer.attention import (T_CACHE,
                                                    ATTENTION_CLASSES)
from wenet_tpu.models.transformer.convolution import ConvolutionModule
from wenet_tpu.models.transformer.norm import get_norm
from wenet_tpu.models.transformer.positionwise_feed_forward import (
    MLP_CLASSES)


class TransformerEncoderLayer(nn.Module):
    """Pre/post-norm MHSA + FFN block. ref: encoder_layer.py:28-128."""
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    layer_norm_type: str = 'layer_norm'
    norm_eps: float = 1e-5
    selfattention_layer_type: str = 'selfattn'
    activation_type: str = 'relu'
    mlp_type: str = 'position_wise_feed_forward'
    mlp_bias: bool = True
    n_expert: int = 8
    n_expert_activated: int = 2
    query_bias: bool = True
    key_bias: bool = True
    value_bias: bool = True
    n_kv_head: Optional[int] = None
    head_dim: Optional[int] = None
    lora_conf: Optional[Tuple] = None
    rms_norm_offset: bool = True

    def setup(self):
        self.self_attn = ATTENTION_CLASSES[self.selfattention_layer_type](
            n_head=self.attention_heads, n_feat=self.size,
            dropout_rate=self.attention_dropout_rate,
            query_bias=self.query_bias, key_bias=self.key_bias,
            value_bias=self.value_bias, n_kv_head=self.n_kv_head,
            head_dim=self.head_dim, lora_conf=self.lora_conf,
            name='self_attn')
        mlp_kwargs = dict(idim=self.size, hidden_units=self.linear_units,
                          dropout_rate=self.dropout_rate,
                          activation=self.activation_type,
                          bias=self.mlp_bias)
        if self.mlp_type == 'moe':
            mlp_kwargs.update(n_expert=self.n_expert,
                              n_expert_activated=self.n_expert_activated)
        self.feed_forward = MLP_CLASSES[self.mlp_type](
            **mlp_kwargs, name='feed_forward')
        self.norm1 = get_norm(self.layer_norm_type, self.size, self.norm_eps,
                              self.rms_norm_offset, name='norm1')
        self.norm2 = get_norm(self.layer_norm_type, self.size, self.norm_eps,
                              self.rms_norm_offset, name='norm2')
        self.dropout = Dropout(self.dropout_rate)

    def __call__(self, x, mask=None, pos_emb=None, mask_pad=None,
                 att_cache: Optional[T_CACHE] = None, cnn_cache=None,
                 train: bool = False):
        det = not train
        residual = x
        if self.normalize_before:
            x = self.norm1(x)
        x_att, new_att_cache = self.self_attn(x, x, x, mask, pos_emb,
                                              cache=att_cache,
                                              deterministic=det)
        x = residual + self.dropout(x_att, deterministic=det)
        if not self.normalize_before:
            x = self.norm1(x)

        residual = x
        if self.normalize_before:
            x = self.norm2(x)
        x = residual + self.dropout(
            self.feed_forward(x, deterministic=det), deterministic=det)
        if not self.normalize_before:
            x = self.norm2(x)
        return x, mask, new_att_cache, None


class ConformerEncoderLayer(nn.Module):
    """macaron-FFN + MHSA + conv + FFN block. ref: encoder_layer.py:130-265."""
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    layer_norm_type: str = 'layer_norm'
    norm_eps: float = 1e-5
    selfattention_layer_type: str = 'rel_selfattn'
    activation_type: str = 'swish'
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    cnn_module_norm: str = 'batch_norm'
    conv_bias: bool = True
    conv_norm_eps: float = 1e-5
    conv_inner_factor: int = 2
    mlp_type: str = 'position_wise_feed_forward'
    mlp_bias: bool = True
    n_expert: int = 8
    n_expert_activated: int = 2
    query_bias: bool = True
    key_bias: bool = True
    value_bias: bool = True
    n_kv_head: Optional[int] = None
    head_dim: Optional[int] = None
    lora_conf: Optional[Tuple] = None

    def setup(self):
        self.self_attn = ATTENTION_CLASSES[self.selfattention_layer_type](
            n_head=self.attention_heads, n_feat=self.size,
            dropout_rate=self.attention_dropout_rate,
            query_bias=self.query_bias, key_bias=self.key_bias,
            value_bias=self.value_bias, n_kv_head=self.n_kv_head,
            head_dim=self.head_dim, lora_conf=self.lora_conf,
            name='self_attn')
        mlp_kwargs = dict(idim=self.size, hidden_units=self.linear_units,
                          dropout_rate=self.dropout_rate,
                          activation=self.activation_type,
                          bias=self.mlp_bias)
        if self.mlp_type == 'moe':
            mlp_kwargs.update(n_expert=self.n_expert,
                              n_expert_activated=self.n_expert_activated)
        mlp_cls = MLP_CLASSES[self.mlp_type]
        self.feed_forward = mlp_cls(**mlp_kwargs, name='feed_forward')
        if self.macaron_style:
            self.feed_forward_macaron = mlp_cls(**mlp_kwargs,
                                                name='feed_forward_macaron')
            self.norm_ff_macaron = get_norm(self.layer_norm_type, self.size,
                                            self.norm_eps,
                                            name='norm_ff_macaron')
        if self.use_cnn_module:
            self.conv_module = ConvolutionModule(
                channels=self.size, kernel_size=self.cnn_module_kernel,
                activation=self.activation_type, norm=self.cnn_module_norm,
                causal=self.causal, bias=self.conv_bias,
                norm_eps=self.conv_norm_eps,
                conv_inner_factor=self.conv_inner_factor,
                name='conv_module')
            self.norm_conv = get_norm(self.layer_norm_type, self.size,
                                      self.norm_eps, name='norm_conv')
            self.norm_final = get_norm(self.layer_norm_type, self.size,
                                       self.norm_eps, name='norm_final')
        self.norm_ff = get_norm(self.layer_norm_type, self.size,
                                self.norm_eps, name='norm_ff')
        self.norm_mha = get_norm(self.layer_norm_type, self.size,
                                 self.norm_eps, name='norm_mha')
        self.dropout = Dropout(self.dropout_rate)

    @property
    def ff_scale(self) -> float:
        return 0.5 if self.macaron_style else 1.0

    def __call__(self, x, mask=None, pos_emb=None, mask_pad=None,
                 att_cache: Optional[T_CACHE] = None,
                 cnn_cache: Optional[jax.Array] = None,
                 train: bool = False):
        det = not train
        if self.macaron_style:
            residual = x
            if self.normalize_before:
                x = self.norm_ff_macaron(x)
            x = residual + self.ff_scale * self.dropout(
                self.feed_forward_macaron(x, deterministic=det),
                deterministic=det)
            if not self.normalize_before:
                x = self.norm_ff_macaron(x)

        residual = x
        if self.normalize_before:
            x = self.norm_mha(x)
        x_att, new_att_cache = self.self_attn(x, x, x, mask, pos_emb,
                                              cache=att_cache,
                                              deterministic=det)
        x = residual + self.dropout(x_att, deterministic=det)
        if not self.normalize_before:
            x = self.norm_mha(x)

        new_cnn_cache = None
        if self.use_cnn_module:
            residual = x
            if self.normalize_before:
                x = self.norm_conv(x)
            x, new_cnn_cache = self.conv_module(x, mask_pad, cnn_cache,
                                                train=train)
            x = residual + self.dropout(x, deterministic=det)
            if not self.normalize_before:
                x = self.norm_conv(x)

        residual = x
        if self.normalize_before:
            x = self.norm_ff(x)
        x = residual + self.ff_scale * self.dropout(
            self.feed_forward(x, deterministic=det), deterministic=det)
        if not self.normalize_before:
            x = self.norm_ff(x)

        if self.use_cnn_module:
            x = self.norm_final(x)
        return x, mask, new_att_cache, new_cnn_cache
