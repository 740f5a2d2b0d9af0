"""Transducer tests: RNN-T loss vs brute-force enumeration, model loss,
greedy search."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wenet_tpu.ops.rnnt_loss import rnnt_loss_logits


def brute_force_rnnt(log_probs, labels, blank=0):
    """Exhaustive -log P over all monotonic alignments. log_probs:
    (T, U+1, V)."""
    T, Up1, V = log_probs.shape
    U = len(labels)
    from functools import lru_cache
    import math

    @lru_cache(maxsize=None)
    def ll(t, u):
        # log prob of reaching the END from state (t, u)
        if t == T - 1 and u == U:
            return float(log_probs[t, u, blank])
        cands = []
        if t < T - 1:
            cands.append(float(log_probs[t, u, blank]) + ll(t + 1, u))
        if u < U:
            cands.append(float(log_probs[t, u, labels[u]]) + ll(t, u + 1))
        if not cands:
            return -1e30
        m = max(cands)
        return m + math.log(sum(math.exp(c - m) for c in cands))

    return -ll(0, 0)


def test_rnnt_loss_matches_bruteforce():
    rng = np.random.RandomState(0)
    B, T, U, V = 3, 5, 3, 7
    logits = rng.randn(B, T, U + 1, V).astype(np.float32)
    labels = rng.randint(1, V, (B, U)).astype(np.int32)
    Ts = np.asarray([5, 4, 3], np.int32)
    Us = np.asarray([3, 2, 0], np.int32)
    loss = rnnt_loss_logits(jnp.asarray(logits), jnp.asarray(labels),
                            jnp.asarray(Ts), jnp.asarray(Us),
                            reduction='none')
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    for b in range(B):
        expect = brute_force_rnnt(np.asarray(logp[b])[:Ts[b]],
                                  list(labels[b][:Us[b]]))
        assert abs(float(loss[b]) - expect) < 1e-4, (b, float(loss[b]),
                                                     expect)


def test_rnnt_loss_grad_finite():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 6, 4, 8), jnp.float32)
    labels = jnp.asarray(rng.randint(1, 8, (2, 3)), jnp.int32)

    def f(x):
        return rnnt_loss_logits(x, labels, jnp.asarray([6, 5]),
                                jnp.asarray([3, 2]))

    g = jax.grad(f)(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    # occupancy gradient sums to ~0 per (t,u) cell of valid sequences
    # (softmax identity); just check scale sanity
    assert float(jnp.max(jnp.abs(g))) < 2.0


def _transducer_config():
    return {
        'input_dim': 40,
        'output_dim': 30,
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'cnn_module_kernel': 7},
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1, 'r_num_blocks': 1},
        'model': 'transducer',
        'model_conf': {'transducer_weight': 0.75, 'ctc_weight': 0.1,
                       'attention_weight': 0.15, 'reverse_weight': 0.3},
        'predictor': 'rnn',
        'predictor_conf': {'embed_size': 32, 'output_size': 32,
                           'embed_dropout': 0.1, 'hidden_size': 32,
                           'num_layers': 1},
        'joint': 'transducer_joint',
        'joint_conf': {'join_dim': 32, 'prejoin_linear': True},
    }


@pytest.fixture(scope='module')
def transducer_model():
    from wenet_tpu.utils.init_model import init_model, init_variables
    model, configs = init_model(None, _transducer_config())
    variables, _ = init_variables(model, configs)
    return model, variables


def test_transducer_loss(transducer_model):
    model, variables = transducer_model
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 64, 40), jnp.float32)
    fl = jnp.asarray([64, 48])
    tgt = jnp.asarray(rng.randint(1, 29, (2, 5)), jnp.int32)
    tl = jnp.asarray([5, 3])
    tgt = jnp.where(jnp.arange(5)[None] < tl[:, None], tgt, -1)
    out = model.apply(variables, feats, fl, tgt, tl)
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['loss_rnnt']))
    assert np.isfinite(float(out['loss_ctc']))
    assert np.isfinite(float(out['loss_att']))


def test_transducer_greedy(transducer_model):
    model, variables = transducer_model
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 64, 40), jnp.float32)
    fl = jnp.asarray([64, 48])
    enc, mask = model.apply(variables, feats, fl,
                            method=model.forward_encoder)
    enc_lens = jnp.sum(mask[:, 0, :], -1)
    tokens, n_emit = model.apply(variables, enc, enc_lens,
                                 method=model.greedy_search)
    tokens = np.asarray(tokens)
    n_emit = np.asarray(n_emit)
    assert tokens.shape[0] == 2
    for b in range(2):
        hyp = tokens[b, :n_emit[b]]
        assert all(t != 0 for t in hyp)


def test_predictor_step_matches_forward():
    """forward_step chained == full forward for the RNN predictor."""
    from wenet_tpu.models.transducer.predictor import RNNPredictor
    pred = RNNPredictor(voca_size=20, embed_size=16, output_size=16,
                        embed_dropout=0.0, hidden_size=16, num_layers=2)
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 20, (2, 6)), jnp.int32)
    variables = pred.init(jax.random.PRNGKey(0), tokens)
    full = pred.apply(variables, tokens)
    state = pred.init_state(2)
    padding = jnp.zeros((2, 1))
    outs = []
    for i in range(6):
        o, state = pred.apply(variables, tokens[:, i:i + 1], padding,
                              state, method=pred.forward_step)
        outs.append(o)
    step_out = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step_out),
                               atol=1e-5)
