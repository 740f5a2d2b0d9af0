"""Normalization layers. ref: wenet/models/transformer/norm.py, class_utils.py:90-98."""

import jax.numpy as jnp
from flax import linen as nn


class RMSNorm(nn.Module):
    """RMSNorm with optional +1 weight offset. ref: norm.py:4-27."""
    dim: int
    eps: float = 1e-6
    add_unit_offset: bool = True

    @nn.compact
    def __call__(self, x):
        weight = self.param('scale', nn.initializers.ones, (self.dim,))
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        xf = xf * (jnp.mean(xf * xf, axis=-1, keepdims=True) +
                   self.eps)**-0.5
        xf = xf.astype(dtype)
        if self.add_unit_offset:
            return xf * (1 + weight).astype(dtype)
        return xf * weight.astype(dtype)


def get_norm(layer_norm_type: str, dim: int, eps: float = 1e-5,
             rms_norm_offset: bool = True, name: str = 'norm'):
    """Factory matching WENET_NORM_CLASSES (ref class_utils.py:90-98)."""
    if layer_norm_type == 'layer_norm':
        return nn.LayerNorm(epsilon=eps, name=name)
    assert layer_norm_type == 'rms_norm', layer_norm_type
    return RMSNorm(dim=dim, eps=eps, add_unit_offset=rms_norm_offset,
                   name=name)
