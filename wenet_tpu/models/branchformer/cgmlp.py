"""Convolutional gating MLP. ref: wenet/models/branchformer/cgmlp.py:30-195."""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.transformer.activations import get_activation


class ConvolutionalSpatialGatingUnit(nn.Module):
    """CSGU. ref: cgmlp.py:30-133."""
    size: int  # input channels (split in half)
    kernel_size: int
    dropout_rate: float = 0.0
    use_linear_after_conv: bool = False
    gate_activation: str = 'identity'
    causal: bool = True

    @property
    def lorder(self) -> int:
        return self.kernel_size - 1 if self.causal else 0

    def setup(self):
        n = self.size // 2
        self.norm = nn.LayerNorm(epsilon=1e-5, name='norm')
        self.conv = nn.Conv(n, (self.kernel_size,),
                            padding='VALID' if self.causal else
                            [(self.kernel_size // 2,
                              self.kernel_size // 2)],
                            feature_group_count=n, name='conv')
        if self.use_linear_after_conv:
            self.linear = nn.Dense(n, name='linear')
        self.dropout = Dropout(self.dropout_rate)

    def __call__(self, x: jax.Array,
                 cache: Optional[jax.Array] = None,
                 train: bool = False) -> Tuple[jax.Array,
                                               Optional[jax.Array]]:
        """x: (B, T, size) -> (B, T, size/2); cache (B, lorder, size/2)."""
        x_r, x_g = jnp.split(x, 2, axis=-1)
        new_cache = None
        # pad/concat cache in RAW space first (the reference norms the
        # padded sequence, so zero-pad rows become LN(0)=bias rows)
        if self.lorder > 0:
            if cache is None:
                x_pad = jnp.pad(x_g, ((0, 0), (self.lorder, 0), (0, 0)))
            else:
                x_pad = jnp.concatenate([cache.astype(x_g.dtype), x_g],
                                        axis=1)
            new_cache = x_pad[:, -self.lorder:, :]
        else:
            x_pad = x_g
        x_gc = self.conv(self.norm(x_pad))
        if self.use_linear_after_conv:
            x_gc = self.linear(x_gc)
        x_gc = get_activation(self.gate_activation)(x_gc) \
            if self.gate_activation != 'identity' else x_gc
        out = x_r * x_gc
        out = self.dropout(out, deterministic=not train)
        return out, new_cache


class ConvolutionalGatingMLP(nn.Module):
    """cgMLP: proj -> GELU -> CSGU -> proj. ref: cgmlp.py:136-195."""
    size: int
    linear_units: int
    kernel_size: int
    dropout_rate: float = 0.0
    use_linear_after_conv: bool = False
    gate_activation: str = 'identity'
    causal: bool = True

    @property
    def lorder(self) -> int:
        return self.kernel_size - 1 if self.causal else 0

    def setup(self):
        self.channel_proj1 = nn.Dense(self.linear_units,
                                      name='channel_proj1')
        self.csgu = ConvolutionalSpatialGatingUnit(
            size=self.linear_units, kernel_size=self.kernel_size,
            dropout_rate=self.dropout_rate,
            use_linear_after_conv=self.use_linear_after_conv,
            gate_activation=self.gate_activation, causal=self.causal,
            name='csgu')
        self.channel_proj2 = nn.Dense(self.size, name='channel_proj2')

    def __call__(self, x, mask_pad=None, cache=None, train: bool = False):
        h = jax.nn.gelu(self.channel_proj1(x), approximate=False)
        h, new_cache = self.csgu(h, cache, train)
        return self.channel_proj2(h), new_cache
