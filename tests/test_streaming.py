"""Streaming chunk forward == full forward with static chunk mask.

Mirrors the invariant the reference runtime relies on (C++ decoder feeds
forward_encoder_chunk and must reproduce the training-time chunk-masked
computation, ref encoder.py:204-362)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_tpu.models.transformer.encoder import (ConformerEncoder,
                                                  TransformerEncoder)
from wenet_tpu.models.transformer.streaming import (StreamingConfig,
                                                    forward_chunk_by_chunk)

IDIM = 80


class _EncWrap:
    """Minimal model-like shim exposing forward_encoder_chunk."""

    def __init__(self, enc):
        self.encoder = enc

    def apply(self, variables, *args, method=None, **kw):
        return self.encoder.apply(variables, *args,
                                  method=self.encoder.forward_chunk)

    @property
    def forward_encoder_chunk(self):
        return None


CHUNK = 4


def _run(enc, T=64, seed=0, left_chunks=-1):
    rng = np.random.RandomState(seed)
    xs = jnp.asarray(rng.randn(1, T, IDIM), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), xs, jnp.asarray([T]))
    full, _ = enc.apply(variables, xs, jnp.asarray([T]),
                        decoding_chunk_size=CHUNK,
                        num_decoding_left_chunks=left_chunks)
    cfg = StreamingConfig(
        decoding_chunk_size=CHUNK,
        num_decoding_left_chunks=left_chunks,
        subsampling_rate=enc.subsampling_rate,
        right_context=enc.right_context,
        max_left_frames=64)
    stream, _ = forward_chunk_by_chunk(_EncWrap(enc), variables, xs, cfg)
    n = min(full.shape[1], stream.shape[1])
    return np.asarray(full[:, :n]), np.asarray(stream[:, :n])


def test_conformer_streaming_matches_full():
    enc = ConformerEncoder(input_size=IDIM, output_size=32,
                           attention_heads=2, linear_units=64,
                           num_blocks=2, cnn_module_kernel=7, causal=True,
                           use_dynamic_chunk=True, dropout_rate=0.0)
    full, stream = _run(enc)
    assert full.shape == stream.shape
    np.testing.assert_allclose(full, stream, atol=1e-4, rtol=1e-4)


def test_conformer_streaming_limited_left_context():
    enc = ConformerEncoder(input_size=IDIM, output_size=32,
                           attention_heads=2, linear_units=64,
                           num_blocks=2, cnn_module_kernel=7, causal=True,
                           use_dynamic_chunk=True,
                           use_dynamic_left_chunk=True, dropout_rate=0.0)
    full, stream = _run(enc, left_chunks=2)
    np.testing.assert_allclose(full, stream, atol=1e-4, rtol=1e-4)


def test_transformer_streaming_matches_full():
    enc = TransformerEncoder(input_size=IDIM, output_size=32,
                             attention_heads=2, linear_units=64,
                             num_blocks=2, use_dynamic_chunk=True,
                             dropout_rate=0.0)
    full, stream = _run(enc)
    np.testing.assert_allclose(full, stream, atol=1e-4, rtol=1e-4)


def test_efficient_conformer_streaming_matches_full():
    """Progressive-downsampling streaming (fixed-shape base-resolution
    caches, ref efficient_conformer/encoder.py:297-460) must equal the
    full forward under the same static chunk mask."""
    from wenet_tpu.models.efficient_conformer.encoder import (
        EfficientConformerEncoder)
    enc = EfficientConformerEncoder(
        input_size=IDIM, output_size=32, attention_heads=2,
        linear_units=64, num_blocks=4, cnn_module_kernel=7,
        causal=True, use_dynamic_chunk=True, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        stride_layer_idx=[1], stride=[2], group_layer_idx=[0, 1],
        group_size=2)
    full, stream = _run(enc, T=128, left_chunks=-1)
    np.testing.assert_allclose(stream, full, atol=2e-4, rtol=2e-4)


def test_efficient_conformer_streaming_limited_left_context():
    from wenet_tpu.models.efficient_conformer.encoder import (
        EfficientConformerEncoder)
    enc = EfficientConformerEncoder(
        input_size=IDIM, output_size=32, attention_heads=2,
        linear_units=64, num_blocks=4, cnn_module_kernel=7,
        causal=True, use_dynamic_chunk=True,
        use_dynamic_left_chunk=False, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        stride_layer_idx=[1], stride=[2], group_layer_idx=[0, 1],
        group_size=2)
    full, stream = _run(enc, T=128, left_chunks=2)
    np.testing.assert_allclose(stream, full, atol=2e-4, rtol=2e-4)
