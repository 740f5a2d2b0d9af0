"""LoRA injection + CTL model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

IDIM = 40


def _cfg(model='asr_model', extra=None):
    c = {
        'input_dim': IDIM, 'output_dim': 30,
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'cnn_module_kernel': 7,
                         'use_dynamic_chunk': model == 'ctl_model'},
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1, 'r_num_blocks': 1},
        'model': model,
        'model_conf': {'ctc_weight': 0.3},
    }
    if extra:
        c.update(extra)
    return c


def _batch(B=2, T=64, U=4, seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, T, IDIM), jnp.float32)
    fl = jnp.asarray([T, T - 9])
    tgt = jnp.asarray(rng.randint(1, 29, (B, U)), jnp.int32)
    tl = jnp.asarray([U, U - 1])
    return feats, fl, tgt, tl


def test_lora_injection_and_masking():
    from wenet_tpu.models.finetune.lora import (lora_param_mask,
                                                mark_only_lora_as_trainable)
    from wenet_tpu.utils.init_model import init_model, init_variables
    import optax
    cfg = _cfg(extra={'lora_conf': {'use_lora': True, 'lora_rank': 4,
                                    'lora_alpha': 8,
                                    'lora_list': ['q', 'o']}})
    model, configs = init_model(None, cfg)
    variables, _ = init_variables(model, configs)
    flat = jax.tree_util.tree_flatten_with_path(
        variables['params'])[0]
    lora_keys = ['/'.join(str(k.key) for k in kp) for kp, _ in flat
                 if 'lora_A' in str(kp)]
    assert lora_keys, 'no lora params created'
    assert all('linear_q' in k or 'linear_out' in k for k in lora_keys)

    # forward works and lora_B zero-init means output == base init
    feats, fl, tgt, tl = _batch()
    out = model.apply(variables, feats, fl, tgt, tl)
    assert np.isfinite(float(out['loss']))

    # only lora params receive updates
    tx = mark_only_lora_as_trainable(optax.sgd(0.1),
                                     variables['params'])
    state = tx.init(variables['params'])
    grads = jax.tree_util.tree_map(jnp.ones_like, variables['params'])
    updates, _ = tx.update(grads, state, variables['params'])
    mask = lora_param_mask(variables['params'])
    leaves = jax.tree_util.tree_leaves_with_path(updates)
    for kp, u in leaves:
        is_lora = any('lora' in str(k) for k in kp)
        if is_lora:
            assert float(jnp.abs(u).max()) > 0
        else:
            assert float(jnp.abs(u).max()) == 0


def test_ctl_model_loss():
    from wenet_tpu.utils.init_model import init_model, init_variables
    cfg = _cfg(model='ctl_model',
               extra={'model_conf': {'ctc_weight': 0.3,
                                     'n_negatives': 4,
                                     'ctl_weight': 1.0}})
    model, configs = init_model(None, cfg)
    variables, _ = init_variables(model, configs)
    feats, fl, tgt, tl = _batch()
    out = model.apply(variables, feats, fl, tgt, tl, train=True,
                      chunk_rng=jax.random.PRNGKey(5),
                      rngs={'dropout': jax.random.PRNGKey(1)},
                      mutable=['batch_stats'])[0]
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['loss_ctl']))
    assert float(out['loss_ctl']) > 0


def test_lora_ga_reinit(lora_model=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wenet_tpu.models.finetune.lora import (estimate_gradient,
                                                reinit_lora)
    from wenet_tpu.utils.init_model import init_model, init_variables
    configs = {
        'input_dim': 80, 'output_dim': 12,
        'encoder': 'transformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 1},
        'decoder': 'transformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1},
        'model_conf': {'ctc_weight': 0.3},
        'lora_conf': {'use_lora': True, 'lora_rank': 4,
                      'lora_alpha': 4, 'lora_list': ['q', 'v']},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    rng = np.random.RandomState(0)
    batch = {'feats': jnp.asarray(rng.randn(2, 32, 80), jnp.float32),
             'feats_lengths': jnp.asarray([32, 28]),
             'target': jnp.asarray([[2, 3, 4, -1], [5, 6, -1, -1]],
                                   jnp.int32),
             'target_lengths': jnp.asarray([3, 2])}
    grads = estimate_gradient(model, variables, [batch])
    params2 = reinit_lora(variables['params'], grads,
                          init_type='gradient', stable_gamma=16.0)
    # lora_A/B must now be nonzero where reinit happened
    flat = jax.tree_util.tree_flatten_with_path(params2)[0]
    n_lora_b = sum(1 for kp, v in flat
                   if any(getattr(k, 'key', '') == 'lora_B'
                          for k in kp) and float(jnp.abs(v).max()) > 0)
    assert n_lora_b > 0
    # initial function preserved: forward before == after (tol)
    out1 = model.apply(variables, *batch.values())
    out2 = model.apply({**variables, 'params': params2},
                       *batch.values())
    np.testing.assert_allclose(float(out1['loss']),
                               float(out2['loss']), rtol=1e-4)
