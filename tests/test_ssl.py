"""SSL pretraining model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

IDIM = 40


def _enc(num_blocks=2):
    from wenet_tpu.models.transformer.encoder import ConformerEncoder
    return ConformerEncoder(input_size=IDIM, output_size=32,
                            attention_heads=2, linear_units=64,
                            num_blocks=num_blocks, cnn_module_kernel=7,
                            dropout_rate=0.0)


def _batch(B=2, T=96, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(B, T, IDIM), jnp.float32),
            jnp.asarray([T, T - 20]))


def test_mask_indices():
    from wenet_tpu.models.ssl.mask import compute_mask_indices
    pad = jnp.zeros((4, 50), bool).at[1, 30:].set(True)
    m = compute_mask_indices(jax.random.PRNGKey(0), pad, 0.2, 5,
                             min_masks=2)
    m = np.asarray(m)
    assert m.shape == (4, 50)
    assert m.sum(1).min() >= 5  # at least min_masks spans
    assert not m[1, 30:].any()  # padded region never masked


def test_bestrq_loss():
    from wenet_tpu.models.ssl.bestrq_model import BestRQModel
    model = BestRQModel(encoder=_enc(), num_mel_bins=IDIM,
                        embedding_dim=16, num_embeddings=32,
                        num_codebooks=2, mask_prob=0.05)
    feats, lens = _batch()
    variables = model.init(jax.random.PRNGKey(0), feats, lens)
    out = model.apply(variables, feats, lens, train=True,
                      chunk_rng=jax.random.PRNGKey(1),
                      rngs={'dropout': jax.random.PRNGKey(2)},
                      mutable=['batch_stats'])[0]
    assert np.isfinite(float(out['loss']))
    assert 0.0 <= float(out['codes_acc']) <= 1.0


def test_wav2vec2_loss():
    from wenet_tpu.models.ssl.wav2vec2_model import Wav2vec2Model
    model = Wav2vec2Model(encoder=_enc(), embedding_dim=32,
                          num_embeddings=32, num_codebooks=2,
                          mask_prob=0.1, num_negatives=4,
                          diversity_weight=0.1)
    feats, lens = _batch()
    variables = model.init(jax.random.PRNGKey(0), feats, lens)
    out = model.apply(variables, feats, lens, steps=100, train=True,
                      chunk_rng=jax.random.PRNGKey(1),
                      rngs={'dropout': jax.random.PRNGKey(2)},
                      mutable=['batch_stats'])[0]
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['code_ppl']))


def test_w2vbert_loss():
    from wenet_tpu.models.ssl.w2vbert_model import W2VBERTModel
    model = W2VBERTModel(encoder=_enc(num_blocks=2), embedding_dim=32,
                         num_embeddings=32, num_codebooks=2,
                         mask_prob=0.1, num_negatives=4,
                         contrastive_blocks=1, masked_blocks=1)
    feats, lens = _batch()
    variables = model.init(jax.random.PRNGKey(0), feats, lens)
    out = model.apply(variables, feats, lens, train=True,
                      chunk_rng=jax.random.PRNGKey(1),
                      rngs={'dropout': jax.random.PRNGKey(2)},
                      mutable=['batch_stats'])[0]
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['loss_mlm']))
    assert np.isfinite(float(out['loss_contrastive']))


def test_ssl_registry():
    from wenet_tpu.utils.init_model import init_model
    configs = {
        'input_dim': IDIM, 'output_dim': 10,
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'cnn_module_kernel': 7},
        'model': 'bestrq_model',
        'model_conf': {'num_mel_bins': IDIM, 'embedding_dim': 16,
                       'num_embeddings': 32, 'mask_prob': 0.05},
    }
    model, _ = init_model(None, configs)
    assert type(model).__name__ == 'BestRQModel'
