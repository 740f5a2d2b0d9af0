"""Squeezeformer / EfficientConformer construction + forward tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

IDIM = 40


def _feats(B=2, T=96, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(B, T, IDIM), jnp.float32),
            jnp.asarray([T, T - 17]))


def test_squeezeformer_forward():
    from wenet_tpu.models.squeezeformer.encoder import (
        SqueezeformerEncoder)
    enc = SqueezeformerEncoder(input_size=IDIM, encoder_dim=32,
                               output_size=32, attention_heads=2,
                               num_blocks=4, reduce_idx=1, recover_idx=3,
                               feed_forward_expansion_factor=2,
                               cnn_module_kernel=7, dropout=0.0,
                               input_dropout_rate=0.0,
                               feed_forward_dropout_rate=0.0,
                               attention_dropout_rate=0.0)
    feats, lens = _feats()
    variables = enc.init(jax.random.PRNGKey(0), feats, lens)
    ys, masks = enc.apply(variables, feats, lens)
    assert ys.shape[-1] == 32
    # recover path returns to the 1/4-subsampled length
    assert ys.shape[1] == masks.shape[-1]
    assert np.all(np.isfinite(np.asarray(ys)))


def test_squeezeformer_train_mode():
    from wenet_tpu.models.squeezeformer.encoder import (
        SqueezeformerEncoder)
    enc = SqueezeformerEncoder(input_size=IDIM, encoder_dim=32,
                               output_size=48, attention_heads=2,
                               num_blocks=2, reduce_idx=0, recover_idx=1,
                               feed_forward_expansion_factor=2,
                               cnn_module_kernel=7)
    feats, lens = _feats()
    variables = enc.init(jax.random.PRNGKey(0), feats, lens)
    ys, _, = enc.apply(variables, feats, lens, train=True,
                       rngs={'dropout': jax.random.PRNGKey(1)},
                       mutable=['batch_stats'])[0]
    assert ys.shape[-1] == 48


def test_efficient_conformer_forward():
    from wenet_tpu.models.efficient_conformer.encoder import (
        EfficientConformerEncoder)
    enc = EfficientConformerEncoder(
        input_size=IDIM, output_size=32, attention_heads=2,
        linear_units=64, num_blocks=4, cnn_module_kernel=7,
        stride_layer_idx=1, stride=2, group_layer_idx=(0, 1),
        group_size=3, dropout_rate=0.0)
    feats, lens = _feats()
    variables = enc.init(jax.random.PRNGKey(0), feats, lens)
    ys, masks = enc.apply(variables, feats, lens)
    # one stride-2 layer after conv2d4: T' = ceil(sub4(T)/2)
    assert ys.shape[1] == masks.shape[-1]
    assert np.all(np.isfinite(np.asarray(ys)))


def test_efficient_conformer_via_registry():
    from wenet_tpu.utils.init_model import init_model, init_variables
    configs = {
        'input_dim': IDIM, 'output_dim': 30,
        'encoder': 'efficientConformer',
        'encoder_conf': {
            'output_size': 32, 'attention_heads': 2, 'linear_units': 64,
            'num_blocks': 2, 'cnn_module_kernel': 7,
            'efficient_conf': {'stride_layer_idx': 0, 'stride': 2,
                               'group_layer_idx': (0,),
                               'group_size': 2},
        },
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1, 'r_num_blocks': 1},
        'model_conf': {'ctc_weight': 0.3},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 64, IDIM), jnp.float32)
    fl = jnp.asarray([64, 48])
    tgt = jnp.asarray(rng.randint(1, 29, (2, 4)), jnp.int32)
    tl = jnp.asarray([4, 3])
    out = model.apply(variables, feats, fl, tgt, tl)
    assert np.isfinite(float(out['loss']))
