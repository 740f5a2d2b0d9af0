"""Branchformer / E-Branchformer construction + streaming tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wenet_tpu.models.branchformer.encoder import BranchformerEncoder
from wenet_tpu.models.e_branchformer.encoder import EBranchformerEncoder

IDIM = 40


def _feats(B=2, T=64, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(B, T, IDIM), jnp.float32),
            jnp.asarray([T, T - 9]))


@pytest.mark.parametrize('merge', ['concat', 'learned_ave', 'fixed_ave'])
def test_branchformer_forward(merge):
    enc = BranchformerEncoder(input_size=IDIM, output_size=32,
                              attention_heads=2, num_blocks=2,
                              cgmlp_linear_units=64,
                              cgmlp_conv_kernel=7, merge_method=merge,
                              dropout_rate=0.0)
    feats, lens = _feats()
    variables = enc.init(jax.random.PRNGKey(0), feats, lens)
    ys, masks = enc.apply(variables, feats, lens)
    assert ys.shape[-1] == 32
    assert np.all(np.isfinite(np.asarray(ys)))


def test_ebranchformer_forward_and_train():
    enc = EBranchformerEncoder(input_size=IDIM, output_size=32,
                               attention_heads=2, linear_units=64,
                               num_blocks=2, cgmlp_linear_units=64,
                               cgmlp_conv_kernel=7)
    feats, lens = _feats()
    variables = enc.init(jax.random.PRNGKey(0), feats, lens)
    ys, _ = enc.apply(variables, feats, lens)
    assert np.all(np.isfinite(np.asarray(ys)))
    ys_t = enc.apply(variables, feats, lens, train=True,
                     rngs={'dropout': jax.random.PRNGKey(1)})[0]
    assert np.all(np.isfinite(np.asarray(ys_t)))


def test_ebranchformer_streaming_matches_full():
    """merge_conv_kernel=1 makes the merge conv pointwise, so chunked
    decode must equal the full forward exactly (with kernel>1 the merge
    conv is chunk-local — zero-padded per chunk like the reference's
    streaming, ref e_branchformer/encoder_layer.py:130-134 — and
    stream==full holds only to boundary effects; the stream==REFERENCE
    guarantee for that case is test_branchformer_streaming_parity in
    test_reference_parity_zoo.py)."""
    from tests.test_streaming import _EncWrap
    from wenet_tpu.models.transformer.streaming import (
        StreamingConfig, forward_chunk_by_chunk)
    enc = EBranchformerEncoder(input_size=IDIM, output_size=32,
                               attention_heads=2, linear_units=64,
                               num_blocks=2, cgmlp_linear_units=64,
                               cgmlp_conv_kernel=7, causal=True,
                               merge_conv_kernel=1,
                               use_dynamic_chunk=True, dropout_rate=0.0)
    rng = np.random.RandomState(0)
    T = 64
    xs = jnp.asarray(rng.randn(1, T, IDIM), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), xs, jnp.asarray([T]))
    full, _ = enc.apply(variables, xs, jnp.asarray([T]),
                        decoding_chunk_size=4,
                        num_decoding_left_chunks=-1)
    cfg = StreamingConfig(decoding_chunk_size=4,
                          num_decoding_left_chunks=-1,
                          subsampling_rate=enc.subsampling_rate,
                          right_context=enc.right_context,
                          max_left_frames=64)
    stream, _ = forward_chunk_by_chunk(_EncWrap(enc), variables, xs, cfg)
    n = min(full.shape[1], stream.shape[1])
    np.testing.assert_allclose(np.asarray(full[:, :n]),
                               np.asarray(stream[:, :n]), atol=1e-4,
                               rtol=1e-4)
