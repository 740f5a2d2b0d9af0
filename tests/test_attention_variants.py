"""Attention zoo unit tests (analog of ref
test/wenet/models/transformer/test_attention.py): GQA/MQA reduce to MHA
when heads tie, rel-pos/rope/shaw shapes, decode-step cache
equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wenet_tpu.models.transformer.attention import (
    ATTENTION_CLASSES, MultiHeadedAttention)


def _mask(B, T):
    return jnp.ones((B, 1, T), bool)


def test_gqa_head_broadcast_matches_mha():
    """n_kv_head=1 with all kv heads tied equals full MHA with copied
    kv projections."""
    B, T, D, H = 2, 12, 32, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    gqa = MultiHeadedAttention(n_head=H, n_feat=D, n_kv_head=1,
                               head_dim=D // H)
    v_g = gqa.init(jax.random.PRNGKey(0), x, x, x, _mask(B, T))
    out_g, _ = gqa.apply(v_g, x, x, x, _mask(B, T))
    # build an MHA whose kv kernels are the gqa kv kernel tiled H times
    mha = MultiHeadedAttention(n_head=H, n_feat=D)
    v_m = mha.init(jax.random.PRNGKey(1), x, x, x, _mask(B, T))
    pm = jax.tree_util.tree_map(lambda a: a, v_m['params'])
    pg = v_g['params']
    pm['linear_q'] = pg['linear_q']
    pm['linear_out'] = pg['linear_out']
    for name in ('linear_k', 'linear_v'):
        k = pg[name]['kernel']          # (D, d_k) single kv head
        b = pg[name]['bias']
        pm[name]['kernel'] = jnp.tile(k, (1, H))
        pm[name]['bias'] = jnp.tile(b, (H,))
    out_m, _ = mha.apply({'params': pm}, x, x, x, _mask(B, T))
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_m),
                               atol=1e-5)


@pytest.mark.parametrize('att_type', ['selfattn', 'rel_selfattn',
                                      'shaw_rel_selfattn',
                                      'rope_abs_selfattn'])
def test_attention_shapes(att_type):
    B, T, D, H = 2, 10, 32, 2
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    cls = ATTENTION_CLASSES[att_type]
    mod = cls(n_head=H, n_feat=D)
    pos = None
    if att_type == 'rel_selfattn':
        from wenet_tpu.models.transformer.embedding import (
            sinusoidal_position_encoding)
        pos = sinusoidal_position_encoding(0, T, D)
    elif att_type == 'rope_abs_selfattn':
        from wenet_tpu.models.transformer.embedding import rope_freqs
        pos = rope_freqs(0, T, D // H)
    variables = mod.init(jax.random.PRNGKey(0), x, x, x, _mask(B, T),
                         pos)
    out, cache = mod.apply(variables, x, x, x, _mask(B, T), pos)
    assert out.shape == (B, T, D)
    k, v = cache
    assert k.shape[0] == B and v.shape[0] == B
