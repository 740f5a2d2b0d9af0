"""Global CMVN as a stateless op. ref: wenet/models/transformer/cmvn.py:18-63.

The reference keeps (mean, istd) as module buffers; here they travel in the
param tree (non-trainable 'constants' collection handled by the model) or
are simply closed over as arrays — the op itself is a pure function.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def global_cmvn(x: jax.Array, mean: jax.Array, istd: jax.Array,
                norm_var: bool = True) -> jax.Array:
    x = x - mean
    if norm_var:
        x = x * istd
    return x


class GlobalCMVN(nn.Module):
    """Holds (mean, istd) as frozen variables in the 'cmvn' collection."""
    dim: int
    norm_var: bool = True

    @nn.compact
    def __call__(self, x):
        mean = self.variable('cmvn', 'mean',
                             lambda: jnp.zeros((self.dim,), jnp.float32))
        istd = self.variable('cmvn', 'istd',
                             lambda: jnp.ones((self.dim,), jnp.float32))
        return global_cmvn(x, mean.value.astype(x.dtype),
                           istd.value.astype(x.dtype), self.norm_var)
