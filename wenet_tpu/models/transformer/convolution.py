"""Conformer convolution module. ref: wenet/models/transformer/convolution.py:24-153.

pointwise convs are expressed as Dense (kernel-1 conv == matmul -> MXU);
the depthwise conv uses lax.conv with feature_group_count == channels.
The causal left-context cache is a fixed (B, lorder, C) window, always
present in streaming mode, so chunk steps compile once.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.transformer.activations import get_activation
from wenet_tpu.models.transformer.norm import RMSNorm


class ConvolutionModule(nn.Module):
    channels: int
    kernel_size: int = 15
    activation: str = 'swish'
    norm: str = 'batch_norm'
    causal: bool = False
    bias: bool = True
    norm_eps: float = 1e-5
    conv_inner_factor: int = 2

    @property
    def lorder(self) -> int:
        return self.kernel_size - 1 if self.causal else 0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask_pad: Optional[jax.Array] = None,
        cache: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """x: (B, T, C); mask_pad: (B, 1, T) bool valid; cache: (B, lorder, C).

        Returns (out (B, T, C), new_cache (B, lorder, C) or None)."""
        act = get_activation(self.activation)
        inner = self.conv_inner_factor * self.channels

        if mask_pad is not None:
            x = jnp.where(jnp.swapaxes(mask_pad, 1, 2), x, 0.0)

        new_cache = None
        if self.lorder > 0:
            if cache is None:
                x_pad = jnp.pad(x, ((0, 0), (self.lorder, 0), (0, 0)))
            else:
                x_pad = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
            new_cache = x_pad[:, -self.lorder:, :]
        else:
            x_pad = x

        # pointwise conv1 + GLU (ref convolution.py:137-139)
        h = nn.Dense(inner, use_bias=self.bias, name='pointwise_conv1')(x_pad)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # (B, T(+lorder), inner//2)

        # depthwise conv (ref convolution.py:141-142); causal uses the
        # left-padded sequence with VALID, symmetric uses SAME
        dw = nn.Conv(
            features=inner // 2,
            kernel_size=(self.kernel_size,),
            feature_group_count=inner // 2,
            padding='VALID' if self.causal else [(self.kernel_size // 2,
                                                  self.kernel_size // 2)],
            use_bias=self.bias,
            name='depthwise_conv')
        h = dw(h)

        if self.norm == 'batch_norm':
            h = nn.BatchNorm(use_running_average=not train,
                             epsilon=self.norm_eps,
                             momentum=0.9, name='norm')(h)
        elif self.norm == 'layer_norm':
            h = nn.LayerNorm(epsilon=self.norm_eps, name='norm')(h)
        else:
            h = RMSNorm(dim=inner // 2, eps=self.norm_eps, name='norm')(h)
        h = act(h)
        out = nn.Dense(self.channels, use_bias=self.bias,
                       name='pointwise_conv2')(h)

        if mask_pad is not None:
            out = jnp.where(jnp.swapaxes(mask_pad, 1, 2), out, 0.0)
        return out, new_cache
