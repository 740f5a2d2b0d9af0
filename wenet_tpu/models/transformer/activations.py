"""Activation registry. ref: wenet/utils/class_utils.py:37-50 (WENET_ACTIVATION_CLASSES)."""

import jax
import jax.numpy as jnp


def gelu(x):
    # torch.nn.GELU default is the exact erf formulation
    return jax.nn.gelu(x, approximate=False)


def swish(x):
    return jax.nn.silu(x)


ACTIVATIONS = {
    'hardtanh': lambda x: jnp.clip(x, -1.0, 1.0),
    'tanh': jnp.tanh,
    'relu': jax.nn.relu,
    'selu': jax.nn.selu,
    'swish': swish,
    'silu': swish,
    'gelu': gelu,
}


def get_activation(name: str):
    return ACTIVATIONS[name]
