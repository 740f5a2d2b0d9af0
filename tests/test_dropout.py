"""Key-residual dropout (ops/dropout.py) vs flax nn.Dropout.

The module must be a bit-exact drop-in (same mask for the same rng) so
that swapping it into the model zoo changes nothing but the backward
residual footprint.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import pytest

from wenet_tpu.ops.dropout import Dropout


def _flax_apply(x, rate, key, **kw):
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dropout(rate, **kw)(x, deterministic=False, rng=key)
    return M().apply({}, x)


def _mine_apply(x, rate, key, **kw):
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Dropout(rate, **kw)(x, deterministic=False, rng=key)
    return M().apply({}, x)


@pytest.mark.parametrize('rate', [0.1, 0.5])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_forward_bit_identical_to_flax(rate, dtype):
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 9, 16)).astype(dtype)
    ref = _flax_apply(x, rate, key)
    out = _mine_apply(x, rate, key)
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_broadcast_dims_bit_identical():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 8))
    ref = _flax_apply(x, 0.4, key, broadcast_dims=(1,))
    out = _mine_apply(x, 0.4, key, broadcast_dims=(1,))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_grad_matches_flax():
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 7, 12))
    gref = jax.grad(lambda x: (_flax_apply(x, 0.3, key) ** 2).sum())(x)
    gout = jax.grad(lambda x: (_mine_apply(x, 0.3, key) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gref), np.asarray(gout),
                               rtol=0, atol=0)


def test_edge_cases_identity_and_zero():
    x = jnp.ones((2, 3))
    key = jax.random.PRNGKey(0)
    # deterministic / rate==0 -> identity, no rng consumed
    class M(nn.Module):
        @nn.compact
        def __call__(self, x, det):
            return Dropout(0.0)(x, deterministic=det)
    assert (M().apply({}, x, True) == x).all()
    assert (M().apply({}, x, False) == x).all()  # rate 0 needs no rng
    out = _mine_apply(x, 1.0, key)
    assert (out == 0).all()


def test_backward_residual_is_key_only():
    """The point of the module: no activation-sized residual crosses the
    fwd->bwd boundary.  Count residual bytes in the vjp jaxpr."""
    key = jax.random.PRNGKey(5)
    x = jnp.ones((64, 128), jnp.float32)

    def run(drop_cls):
        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                return drop_cls(0.1)(x, deterministic=False, rng=key)
        f = lambda x: M().apply({}, x)
        _, vjp = jax.vjp(f, x)
        # residuals are the closed-over constants/arrays of the vjp pytree
        leaves = jax.tree_util.tree_leaves(vjp)
        return max((l.size for l in leaves if hasattr(l, 'size')),
                   default=0)

    assert run(nn.Dropout) >= x.size        # flax saves the mask
    assert run(Dropout) < x.size            # ours saves only the key
