"""Key-residual dropout for the TPU training hot path.

``flax.linen.Dropout`` composes ``bernoulli`` + ``lax.select``; under
autodiff XLA must save the full mask (shape of the activation) as a
backward residual, and the flagship train step applies ~86 such masks
(BENCH_NOTES.md) — pure HBM traffic.  On TPU the RNG bits are far
cheaper than the HBM round-trip (hardware ``unsafe_rbg`` bit
generation), so this module's custom VJP saves ONLY the PRNG key and
regenerates the mask inside the backward pass: zero activation-sized
dropout residuals.

Drop-in replacement for ``flax.linen.Dropout`` (same attribute and
call signature, bit-identical output for the same rng — the forward
mask construction mirrors flax exactly, which in turn mirrors the
reference's ``torch.nn.Dropout`` train-time semantics, e.g. ref
wenet/transformer/encoder_layer.py:75).

Known limitation: ``jax.custom_vjp`` has no forward-mode rule, so
``jax.jvp`` / ``jax.jacfwd`` through a TRAIN-mode model (dropout
active) raises where flax's composite dropout differentiated fine.
Reverse-mode (``grad`` / ``vjp``) — the training path — is unaffected,
and eval-mode models never enter the custom op.  If forward-mode
through train-mode ever matters, swap ``nn.Dropout`` back at the call
site or run with ``rate=0``.
"""

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax, random
import flax.linen as nn


def _apply_mask(x, key, keep_prob, broadcast_shape):
    mask = random.bernoulli(key, p=keep_prob, shape=broadcast_shape)
    mask = jnp.broadcast_to(mask, x.shape)
    return lax.select(mask, x / keep_prob, jnp.zeros_like(x))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _dropout(x, key, keep_prob, broadcast_shape):
    return _apply_mask(x, key, keep_prob, broadcast_shape)


def _dropout_fwd(x, key, keep_prob, broadcast_shape):
    # The ONLY residual is the key — the (B, T, D) mask is regenerated
    # in the backward pass from the same bits.
    return _apply_mask(x, key, keep_prob, broadcast_shape), key


def _dropout_bwd(keep_prob, broadcast_shape, key, g):
    return (_apply_mask(g, key, keep_prob, broadcast_shape), None)


_dropout.defvjp(_dropout_fwd, _dropout_bwd)


class Dropout(nn.Module):
    """API-compatible ``nn.Dropout`` whose backward regenerates the mask.

    Attributes:
      rate: drop probability (not keep probability).
      broadcast_dims: dimensions sharing one mask value.
      deterministic: if true, identity (merged with the call arg).
      rng_collection: rng stream name for ``make_rng``.
    """

    rate: float
    broadcast_dims: Sequence[int] = ()
    deterministic: Optional[bool] = None
    rng_collection: str = 'dropout'

    @nn.compact
    def __call__(self, inputs, deterministic: Optional[bool] = None,
                 rng: Optional[jax.Array] = None):
        deterministic = nn.merge_param(
            'deterministic', self.deterministic, deterministic)
        if (self.rate == 0.0) or deterministic:
            return inputs
        if self.rate == 1.0:
            return jnp.zeros_like(inputs)
        keep_prob = 1.0 - self.rate
        if rng is None:
            rng = self.make_rng(self.rng_collection)
        broadcast_shape = list(inputs.shape)
        for dim in self.broadcast_dims:
            broadcast_shape[dim] = 1
        return _dropout(inputs, rng, keep_prob, tuple(broadcast_shape))
