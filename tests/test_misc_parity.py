"""Parity for the reference's remaining test categories:
grad-checkpointing equivalence (test_grad_ckpt.py), tokenizer
picklability for dataloader workers (text/test_parallel.py)."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _cfg(grad_ckpt: bool):
    return {
        'input_dim': 80, 'output_dim': 10,
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'cnn_module_kernel': 7,
                         'cnn_module_norm': 'layer_norm',
                         'gradient_checkpointing': grad_ckpt},
        'decoder': 'transformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1},
        'model_conf': {'ctc_weight': 0.3},
    }


def test_grad_checkpointing_same_grads():
    """ref: test/wenet/models/transformer/test_grad_ckpt.py —
    rematerialized grads must equal plain grads."""
    from wenet_tpu.utils.init_model import init_model, init_variables
    rng = np.random.RandomState(0)
    batch = {'feats': jnp.asarray(rng.randn(2, 48, 80), jnp.float32),
             'feats_lengths': jnp.asarray([48, 40]),
             'target': jnp.asarray([[2, 3, 4, -1], [5, 6, -1, -1]],
                                   jnp.int32),
             'target_lengths': jnp.asarray([3, 2])}

    grads = {}
    variables0 = None
    for ckpt in (False, True):
        model, configs = init_model(None, _cfg(ckpt))
        variables, _ = init_variables(model, configs)
        if variables0 is None:
            variables0 = variables
        else:
            # same init seed -> identical params regardless of remat
            variables = variables0

        def loss(params):
            out = model.apply({**variables, 'params': params},
                              batch['feats'], batch['feats_lengths'],
                              batch['target'], batch['target_lengths'])
            return out['loss']

        grads[ckpt] = jax.grad(loss)(variables['params'])
    flat_a = jax.tree_util.tree_leaves(grads[False])
    flat_b = jax.tree_util.tree_leaves(grads[True])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_selective_attention_remat_same_grads():
    """gradient_checkpointing='selective' (recompute only the tagged
    (T, T) attention scores/softmax in backward, encoder.py
    _remat_layer) must be a pure memory/schedule change: grads equal
    the plain path."""
    from wenet_tpu.utils.init_model import init_model, init_variables
    rng = np.random.RandomState(0)
    batch = {'feats': jnp.asarray(rng.randn(2, 48, 80), jnp.float32),
             'feats_lengths': jnp.asarray([48, 40]),
             'target': jnp.asarray([[2, 3, 4, -1], [5, 6, -1, -1]],
                                   jnp.int32),
             'target_lengths': jnp.asarray([3, 2])}
    grads = {}
    variables0 = None
    for ckpt in (False, 'selective'):
        cfg = _cfg(ckpt)
        # dropout INSIDE the recomputed region must replay the same
        # mask (remat replays the same rng ops)
        cfg['encoder_conf']['attention_dropout_rate'] = 0.1
        model, configs = init_model(None, cfg)
        variables, _ = init_variables(model, configs)
        if variables0 is None:
            variables0 = variables
        else:
            variables = variables0

        def loss(params):
            out = model.apply({**variables, 'params': params},
                              batch['feats'], batch['feats_lengths'],
                              batch['target'], batch['target_lengths'],
                              train=True,
                              rngs={'dropout': jax.random.PRNGKey(3)})
            return out['loss']

        grads[ckpt] = jax.jit(jax.grad(loss))(variables['params'])
    flat_a = jax.tree_util.tree_leaves(grads[False])
    flat_b = jax.tree_util.tree_leaves(grads['selective'])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_tokenizers_picklable(tmp_path):
    """ref: test/wenet/text/test_parallel.py — tokenizers must survive
    pickling for multi-process dataloaders."""
    from wenet_tpu.text.char_tokenizer import CharTokenizer
    syms = {'<blank>': 0, '<unk>': 1, '你': 2, '好': 3,
            '<sos/eos>': 4}
    tok = CharTokenizer(syms)
    tok2 = pickle.loads(pickle.dumps(tok))
    assert tok2.tokenize('你好') == tok.tokenize('你好')

    try:
        from wenet_tpu.text.whisper_tokenizer import WhisperTokenizer
        wt = WhisperTokenizer(multilingual=False, num_languages=99)
        wt.tokenize('hello')  # force lazy build
        wt2 = pickle.loads(pickle.dumps(wt))
        assert wt2.tokenize('hello') == wt.tokenize('hello')
    except (ImportError, FileNotFoundError, OSError):
        pytest.skip('whisper tiktoken assets unavailable offline')
