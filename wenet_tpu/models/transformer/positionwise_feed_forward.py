"""Positionwise FFN family. ref: wenet/models/transformer/positionwise_feed_forward.py.

The MoE layer is computed densely (every expert sees every token, weighted
by the top-k router mask) — on TPU this turns the reference's per-expert
gather/scatter python loop (ref :103-119) into batched matmuls that XLA
maps straight onto the MXU; an optional `expert` mesh axis can shard the
expert dimension (see wenet_tpu/parallel).
"""

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.models.transformer.activations import get_activation


class PositionwiseFeedForward(nn.Module):
    """w_2(act(w_1(x))). ref: positionwise_feed_forward.py:20-59."""
    idim: int
    hidden_units: int
    dropout_rate: float = 0.0
    activation: str = 'relu'
    bias: bool = True

    @nn.compact
    def __call__(self, xs, deterministic: bool = True):
        act: Callable = get_activation(self.activation)
        h = nn.Dense(self.hidden_units, use_bias=self.bias, name='w_1')(xs)
        h = Dropout(self.dropout_rate)(act(h),
                                          deterministic=deterministic)
        return nn.Dense(self.idim, use_bias=self.bias, name='w_2')(h)


class MoEFFNLayer(nn.Module):
    """Top-k routed mixture of FFN experts. ref: positionwise_feed_forward.py:61-123.

    Dense-dispatch formulation: router probs are masked to the top-k and
    every expert processes all tokens via a batched einsum over stacked
    expert weights (B*L sized gathers don't tile well on TPU).
    """
    idim: int
    hidden_units: int
    dropout_rate: float = 0.0
    activation: str = 'relu'
    bias: bool = False
    n_expert: int = 8
    n_expert_activated: int = 2

    @nn.compact
    def __call__(self, xs, deterministic: bool = True):
        act = get_activation(self.activation)
        B, L, D = xs.shape
        x = xs.reshape(-1, D)  # (N, D)
        router = nn.Dense(self.n_expert, use_bias=False, name='gate')(x)
        topv, topi = jax.lax.top_k(router, self.n_expert_activated)
        weights = jax.nn.softmax(topv.astype(jnp.float32),
                                 axis=-1).astype(xs.dtype)  # (N, k)
        # (N, E) combine weights, zero off the non-selected experts
        combine = jnp.zeros((x.shape[0], self.n_expert), xs.dtype)
        combine = combine.at[jnp.arange(x.shape[0])[:, None], topi].set(
            weights)
        # stacked expert weights: (E, D, H), (E, H, D)
        w1 = self.param('experts_w1', nn.initializers.lecun_normal(),
                        (self.n_expert, D, self.hidden_units))
        w2 = self.param('experts_w2', nn.initializers.lecun_normal(),
                        (self.n_expert, self.hidden_units, D))
        h = jnp.einsum('nd,edh->enh', x, w1.astype(xs.dtype))
        if self.bias:
            b1 = self.param('experts_b1', nn.initializers.zeros,
                            (self.n_expert, self.hidden_units))
            h = h + b1[:, None, :].astype(xs.dtype)
        h = act(h)
        out = jnp.einsum('enh,ehd->end', h, w2.astype(xs.dtype))
        if self.bias:
            b2 = self.param('experts_b2', nn.initializers.zeros,
                            (self.n_expert, D))
            out = out + b2[:, None, :].astype(xs.dtype)
        y = jnp.einsum('end,ne->nd', out, combine)
        return y.reshape(B, L, D)


class GatedVariantsMLP(nn.Module):
    """SwiGLU-style gated MLP. ref: positionwise_feed_forward.py:124-166."""
    idim: int
    hidden_units: int
    dropout_rate: float = 0.0
    activation: str = 'gelu'
    bias: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.activation)
        gate = act(nn.Dense(self.hidden_units, use_bias=False,
                            name='gate')(x))
        up = nn.Dense(self.hidden_units, use_bias=self.bias, name='w_1')(x)
        fuse = Dropout(self.dropout_rate)(gate * up,
                                             deterministic=deterministic)
        return nn.Dense(self.idim, use_bias=self.bias, name='w_2')(fuse)


MLP_CLASSES = {
    'position_wise_feed_forward': PositionwiseFeedForward,
    'moe': MoEFFNLayer,
    'gated': GatedVariantsMLP,
}
