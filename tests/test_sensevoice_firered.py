"""SenseVoice + FireRed construction/loss tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_firered_loss_and_attention_decode():
    from wenet_tpu.utils.init_model import init_model, init_variables
    configs = {
        'input_dim': 40, 'output_dim': 40,
        'encoder': 'firered_conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'cnn_module_kernel': 7,
                         'cnn_module_norm': 'layer_norm'},
        'decoder': 'transformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1},
        'model': 'firered',
        'model_conf': {'ctc_weight': 0.0, 'lsm_weight': 0.1},
        'tokenizer_conf': {'special_tokens': {'sos': 38, 'eos': 39}},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 64, 40), jnp.float32)
    fl = jnp.asarray([64, 48])
    tgt = jnp.asarray(rng.randint(1, 37, (2, 5)), jnp.int32)
    tl = jnp.asarray([5, 3])
    tgt = jnp.where(jnp.arange(5)[None] < tl[:, None], tgt, -1)
    out = model.apply(variables, feats, fl, tgt, tl)
    assert np.isfinite(float(out['loss']))
    # AR decode smoke
    from wenet_tpu.models.runner import AsrRunner
    runner = AsrRunner(model, variables)
    res = runner.decode(['attention'], np.asarray(feats),
                        np.asarray(fl), beam_size=2)
    assert len(res['attention']) == 2


def test_sensevoice_loss():
    from wenet_tpu.utils.init_model import init_model, init_variables
    V = 60
    configs = {
        'input_dim': 280,  # 40 mel * lfr 7
        'output_dim': V,
        'lfr_conf': {'lfr_m': 7, 'lfr_n': 6},
        'encoder': 'sanm_encoder_with_tp',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'tp_blocks': 1, 'kernel_size': 7},
        'decoder': None,
        'model': 'sensevoice_small',
        'model_conf': {'ctc_weight': 1.0, 'lsm_weight': 0.1},
        'tokenizer_conf': {'special_tokens': {'<s>': 1, '</s>': 2}},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 62, 40), jnp.float32)
    fl = jnp.asarray([62, 50])
    # target = [lid, event, emo, itn, text...]
    text = rng.randint(16, V - 2, (2, 6))
    ctx = np.asarray([[3, 1, 2, 15]] * 2)
    tgt = jnp.asarray(np.concatenate([ctx, text], axis=1), jnp.int32)
    tl = jnp.asarray([10, 8])
    out = model.apply(variables, feats, fl, tgt, tl)
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['loss_context']))
