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


def test_transducer_beam_search_runs(transducer_model):
    model, variables = transducer_model
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(2, 64, 40), jnp.float32)
    fl = jnp.asarray([64, 48])
    enc, mask = model.apply(variables, feats, fl,
                            method=model.forward_encoder)
    enc_lens = jnp.sum(mask[:, 0, :], -1)
    tokens, lens, scores = model.apply(variables, enc, enc_lens, 4,
                                       method=model.beam_search)
    tokens, lens, scores = map(np.asarray, (tokens, lens, scores))
    assert tokens.shape[:2] == (2, 4)
    assert np.all(np.diff(scores, axis=1) <= 1e-5)  # sorted
    assert np.all(lens <= tokens.shape[2])
    # greedy result should appear among beam hypotheses scores-wise:
    # beam's best score >= greedy path score is guaranteed by merging,
    # here we just check best hyp is finite and lens consistent
    assert np.all(np.isfinite(scores[:, 0]))


def test_transducer_beam_matches_exhaustive():
    """Tiny joint-table transducer: beam-search best must equal the
    exhaustive argmax_y P(y|x) computed with the (verified) RNN-T
    loss."""
    import itertools
    import flax.linen as fnn
    from wenet_tpu.models.transducer.transducer import Transducer

    V, T, E = 4, 3, 8

    class TinyPredictor(fnn.Module):
        voca_size: int = V
        out: int = E

        def setup(self):
            self.embed = fnn.Embed(self.voca_size, self.out,
                                   name='embed')

        def init_state(self, batch_size, dtype=jnp.float32):
            return (jnp.zeros((batch_size, 1), dtype),)

        def __call__(self, inputs, cache=None, train=False):
            return self.embed(inputs)

        def forward_step(self, inputs, padding, cache):
            return self.embed(inputs), cache

        def select_state(self, new, old, keep_new):
            return new

    class TinyJoint(fnn.Module):
        vocab_size: int = V

        def setup(self):
            self.lin = fnn.Dense(self.vocab_size, name='lin')

        def __call__(self, enc, pred, pre_project=True, train=False):
            if enc.ndim != 4:
                enc = enc[:, :, None, :]
            if pred.ndim != 4:
                pred = pred[:, None, :, :]
            return self.lin(jnp.tanh(enc + pred))

    from wenet_tpu.models.transformer.ctc import CTC
    from wenet_tpu.models.transformer.encoder import TransformerEncoder
    enc_mod = TransformerEncoder(input_size=8, output_size=E,
                                 attention_heads=2, linear_units=16,
                                 num_blocks=1, name='encoder')
    model = Transducer(vocab_size=V, encoder=enc_mod, decoder=None,
                       ctc=None, predictor=TinyPredictor(),
                       joint=TinyJoint(), blank=0,
                       ctc_weight=0.0, transducer_weight=1.0)
    rng = np.random.RandomState(3)
    enc_out = jnp.asarray(rng.randn(1, T, E), jnp.float32)
    # init params via a plain forward touch (creating params inside
    # beam_search's lax.scan is not allowed by linen)
    def touch(m):
        pred = m.predictor(jnp.zeros((1, 1), jnp.int32))
        return m.joint(jnp.zeros((1, 1, E)), pred)

    variables = model.init(jax.random.PRNGKey(0), method=touch)
    tokens, lens, scores = model.apply(variables, enc_out,
                                       jnp.asarray([T]), 4, 0.0, 1.0, 6,
                                       method=model.beam_search)
    best = [int(t) for t in
            np.asarray(tokens)[0, 0][:int(np.asarray(lens)[0, 0])]]
    best_score = float(np.asarray(scores)[0, 0])

    # brute-force replica of the reference breadthwise prefix beam
    # (search/prefix_beam_search.py:60-142): every frame each hyp
    # consumes exactly one symbol; equal prefixes log-add merged;
    # top-K kept. States are recomputed from the prefix (the predictor
    # state is a pure function of the emitted tokens).
    K = 4

    def pred_out_for(prefix):
        pred_in = jnp.asarray([[0] + list(prefix)], jnp.int32)
        po = model.apply(variables, pred_in,
                         method=lambda m, x: m.predictor(x))
        return po[:, -1:, :]  # last step output

    def joint_logp(t, prefix):
        po = pred_out_for(prefix)
        logits = model.apply(
            variables, enc_out[:, t:t + 1], po,
            method=lambda m, e, p: m.joint(e, p))
        return np.asarray(
            jax.nn.log_softmax(logits[0, 0, 0, :], -1))

    hyps = {(): 0.0}
    for t in range(T):
        pool = {}
        for prefix, sc in hyps.items():
            lp = joint_logp(t, prefix)
            order = np.argsort(-lp)[:K]   # first prune: top-K symbols
            for v in order:
                npfx = prefix if v == 0 else prefix + (int(v),)
                cand = sc + float(lp[v])
                if npfx in pool:
                    pool[npfx] = float(np.logaddexp(pool[npfx], cand))
                else:
                    pool[npfx] = cand
        hyps = dict(sorted(pool.items(), key=lambda kv: -kv[1])[:K])
    ref_best, ref_score = max(hyps.items(), key=lambda kv: kv[1])
    assert best == list(ref_best), (best, sorted(
        hyps.items(), key=lambda kv: -kv[1]))
    assert abs(best_score - ref_score) < 1e-3


def test_runner_rnnt_modes(transducer_model):
    from wenet_tpu.models.runner import AsrRunner
    model, variables = transducer_model
    runner = AsrRunner(model, variables)
    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(2, 64, 40), jnp.float32)
    fl = jnp.asarray([64, 48])
    res = runner.decode(['rnnt_greedy_search', 'rnnt_beam_search'],
                        feats, fl, beam_size=4)
    assert len(res['rnnt_greedy_search']) == 2
    assert len(res['rnnt_beam_search']) == 2
    r = res['rnnt_beam_search'][0]
    assert len(r.nbest) == 4 and len(r.nbest_scores) == 4


def test_rnnt_greedy_pipelined_matches_sequential(transducer_model):
    """decode_rnnt_greedy_batches (fused encoder+greedy program,
    dispatch-ahead pipeline) must reproduce the sequential
    runner.decode results batch for batch."""
    from wenet_tpu.models.runner import AsrRunner
    model, variables = transducer_model
    runner = AsrRunner(model, variables)
    rng = np.random.RandomState(6)
    batches = [(rng.randn(2, 64, 40).astype(np.float32),
                np.asarray([64, 40 + 8 * i])) for i in range(3)]
    piped = list(runner.decode_rnnt_greedy_batches(batches))
    assert len(piped) == 3
    for (feats, fl), got in zip(batches, piped):
        ref = runner.decode(['rnnt_greedy_search'], feats,
                            fl)['rnnt_greedy_search']
        assert [list(r.tokens) for r in got] == \
            [list(r.tokens) for r in ref]
