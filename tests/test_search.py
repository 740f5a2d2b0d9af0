"""Decode algorithm tests: vectorized prefix beam vs sequential golden."""

import jax
import jax.numpy as jnp
import numpy as np

from wenet_tpu.models.transformer.search import (attention_beam_search,
                                                 attention_rescoring,
                                                 ctc_greedy_search,
                                                 ctc_prefix_beam_search)
from wenet_tpu.utils.context_graph import (
    ContextGraph, ctc_prefix_beam_search_with_context)
from wenet_tpu.utils.ctc_utils import force_align


def random_logprobs(B, T, V, seed=0, peaky=True):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, T, V).astype(np.float32)
    if peaky:
        # make it look like ctc posteriors: blank-dominant
        x[:, :, 0] += 2.0
        idx = rng.randint(1, V, T)
        x[:, np.arange(T), idx] += rng.randn(T) * 3
    return jax.nn.log_softmax(jnp.asarray(x), axis=-1)


def test_ctc_greedy():
    probs = random_logprobs(2, 20, 10)
    lens = jnp.asarray([20, 15])
    res = ctc_greedy_search(probs, lens)
    assert len(res) == 2
    for r in res:
        assert all(t != 0 for t in r.tokens)


def test_prefix_beam_matches_sequential():
    B, T, V, K = 2, 25, 12, 6
    probs = random_logprobs(B, T, V, seed=3)
    lens = jnp.asarray([T, T - 7])
    vec = ctc_prefix_beam_search(probs, lens, K)
    # empty context graph == no biasing; sequential golden path
    graph = ContextGraph('', {}, context_list=[])
    seq = ctc_prefix_beam_search_with_context(np.asarray(probs),
                                              np.asarray(lens), K, graph)
    for b in range(B):
        assert list(vec[b].tokens) == list(seq[b].tokens), (
            vec[b].tokens, seq[b].tokens)
        assert np.allclose(vec[b].score, seq[b].score, atol=1e-3)
        # nbest prefixes should match as sets (tie order may differ)
        vset = {tuple(h) for h in vec[b].nbest}
        sset = {tuple(h) for h in seq[b].nbest}
        assert len(vset & sset) >= K - 1, (vset, sset)
        # timestamps: the reference's cur_token_prob/times update is
        # dict-iteration-order dependent; require same length and <=2
        # frame deviation rather than bit equality
        assert len(vec[b].times) == len(seq[b].times)
        assert all(abs(a - c) <= 2
                   for a, c in zip(vec[b].times, seq[b].times))


def test_prefix_beam_nbest_scores_sorted():
    probs = random_logprobs(1, 30, 20, seed=9)
    res = ctc_prefix_beam_search(probs, jnp.asarray([30]), 8)
    s = res[0].nbest_scores
    assert all(s[i] >= s[i + 1] - 1e-5 for i in range(len(s) - 1))


def test_context_biasing_boosts_phrase():
    V = 8
    T = 12
    rng = np.random.RandomState(0)
    x = rng.randn(1, T, V).astype(np.float32)
    probs = jax.nn.log_softmax(jnp.asarray(x), axis=-1)
    graph = ContextGraph('', {}, context_list=[[3, 4, 5]],
                         context_score=5.0)
    res = ctc_prefix_beam_search(probs, jnp.asarray([T]), 4,
                                 context_graph=graph)
    assert len(res[0].nbest) == 4


def test_force_align():
    # 3 frames, labels [1]; argmax path should align
    logp = jnp.log(jnp.asarray([[0.8, 0.1, 0.1],
                                [0.1, 0.8, 0.1],
                                [0.8, 0.1, 0.1]], jnp.float32))
    ali = force_align(logp, np.asarray([1]))
    assert ali == [0, 1, 0]


def test_attention_search_and_rescoring():
    from tests.test_smoke_core import batch, tiny_model
    model = tiny_model()
    feats, fl, tgt, tl = batch()
    variables = model.init(jax.random.PRNGKey(0), feats, fl, tgt, tl)
    encoder_out, encoder_mask = model.apply(variables, feats, fl,
                                            method=model.forward_encoder)
    res = attention_beam_search(model, variables, encoder_out,
                                encoder_mask, beam_size=3)
    assert len(res) == 2
    assert all(isinstance(t, int) for r in res for t in r.tokens)

    ctc_probs = model.apply(variables, encoder_out,
                            method=model.ctc_logprobs)
    enc_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1)
    ctc_res = ctc_prefix_beam_search(ctc_probs, enc_lens, 3)
    resc = attention_rescoring(model, variables, ctc_res, encoder_out,
                               enc_lens, ctc_weight=0.3,
                               reverse_weight=0.3)
    assert len(resc) == 2
    for b in range(2):
        assert tuple(resc[b].tokens) in {tuple(h) for h in
                                         ctc_res[b].nbest}
