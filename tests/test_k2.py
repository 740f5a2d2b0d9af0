"""K2-parity stack: dense FSA forward scoring, LF-MMI loss, HLG decode.

ref: wenet/models/k2/model.py:100-304 + tools/k2/{prepare_mmi,make_hlg}.sh
(the reference rides k2/icefall; this stack is TPU-native — see
wenet_tpu/ops/fsa.py and wenet_tpu/models/k2/model.py).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_tpu.lm.build_graph import build_den_graph
from wenet_tpu.lm.fst import TextFst
from wenet_tpu.ops.fsa import fsa_forward_score, fst_to_dense_arcs


def _brute_force_score(fst, logp, T):
    """Independent oracle: logsumexp over ALL accepting paths with
    exactly T emit arcs (eps arcs free, acyclic)."""
    totals = []

    def walk(state, t, w):
        if t == T:
            fc = fst.final_cost(state)
            if fc != float('inf'):
                totals.append(w - fc)
            # eps moves may still reach a final state
        for arc in fst.state_arcs(state):
            if arc.ilabel == 0:
                walk(arc.nextstate, t, w - arc.weight)
            elif t < T:
                walk(arc.nextstate, t + 1,
                     w - arc.weight + logp[t, arc.ilabel - 1])

    walk(fst.start, 0, 0.0)
    m = max(totals)
    return m + math.log(sum(math.exp(x - m) for x in totals))


def test_fsa_forward_matches_bruteforce():
    # den-style graph: ctc topology o token bigram over 2 units
    den = build_den_graph([[1, 2, 1], [2, 1], [1, 1, 2]], num_units=2)
    fsa = fst_to_dense_arcs(den)
    rng = np.random.RandomState(0)
    T, V = 4, 3  # blank + 2 units
    logits = rng.randn(T, V).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    got = float(fsa_forward_score(jnp.asarray(logp), jnp.asarray(T),
                                  fsa))
    want = _brute_force_score(den, logp, T)
    assert abs(got - want) < 1e-4, (got, want)


def test_fsa_forward_respects_length():
    den = build_den_graph([[1, 2]], num_units=2)
    fsa = fst_to_dense_arcs(den)
    rng = np.random.RandomState(1)
    logits = rng.randn(6, 3).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    short = float(fsa_forward_score(jnp.asarray(logp), jnp.asarray(3),
                                    fsa))
    want = _brute_force_score(den, logp[:3], 3)
    assert abs(short - want) < 1e-4


@pytest.fixture(scope='module')
def k2_setup(tmp_path_factory):
    """Tiny K2Model + den graph on disk."""
    from wenet_tpu.utils.init_model import init_model, init_variables
    lfmmi_dir = tmp_path_factory.mktemp('lfmmi')
    # 4-unit vocab (ctc ids 1..4), blank 0
    build_den_graph([[1, 2, 3], [2, 3, 4], [1, 4]], num_units=4,
                    outdir=lfmmi_dir.as_posix())
    configs = {
        'input_dim': 20, 'output_dim': 6,  # blank + 4 units + sos/eos
        'model': 'k2_model',
        'encoder': 'transformer',
        'encoder_conf': {'output_size': 16, 'attention_heads': 2,
                         'linear_units': 32, 'num_blocks': 1,
                         'dropout_rate': 0.0,
                         'positional_dropout_rate': 0.0},
        'decoder': 'transformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 32,
                         'num_blocks': 1, 'dropout_rate': 0.0,
                         'positional_dropout_rate': 0.0,
                         'self_attention_dropout_rate': 0.0,
                         'src_attention_dropout_rate': 0.0},
        'model_conf': {'ctc_weight': 0.5,
                       'lfmmi_dir': lfmmi_dir.as_posix()},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    return model, variables


def test_lfmmi_loss_trains(k2_setup):
    """LF-MMI loss is finite and differentiable; minimizing it raises
    the supervision's relative score (num - den), the MMI objective
    (ref k2/model.py:100-140)."""
    model, variables = k2_setup
    rng = np.random.RandomState(2)
    B, T, U = 2, 24, 3
    feats = jnp.asarray(rng.randn(B, T, 20), jnp.float32)
    feats_lens = jnp.asarray([T, T - 5])
    target = jnp.asarray([[1, 2, 3], [2, 3, -1]], jnp.int32)
    target_lens = jnp.asarray([3, 2])

    def loss_fn(params):
        out = model.apply({'params': params, **{k: v for k, v in
                                                variables.items()
                                                if k != 'params'}},
                          feats, feats_lens, target, target_lens)
        return out['loss'], out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables['params'])
    assert np.isfinite(float(loss))
    assert np.isfinite(float(out['loss_ctc']))
    gnorm = jnp.sqrt(sum(jnp.sum(g * g)
                         for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0

    # a few SGD steps must decrease the LF-MMI part
    params = variables['params']
    first = float(out['loss_ctc'])
    for _ in range(5):
        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        params = jax.tree_util.tree_map(lambda p, g: p - 0.05 * g,
                                        params, grads)
    (_, out), _ = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert float(out['loss_ctc']) < first


@pytest.fixture(scope='module')
def hlg_setup(tmp_path_factory):
    """HLG graph + a K2-style model whose vocab matches the units."""
    from wenet_tpu.lm.build_graph import build_hlg
    from wenet_tpu.utils.init_model import init_model, init_variables
    d = tmp_path_factory.mktemp('hlg')
    (d / 'units.txt').write_text('a 1\nb 2\n')
    (d / 'lexicon.txt').write_text('ab a b\nb b\n')
    (d / 'lm.arpa').write_text("""
\\data\\
ngram 1=4
ngram 2=3

\\1-grams:
-0.5\t<s>\t-0.3
-0.7\t</s>
-0.4\tab\t-0.2
-0.8\tb\t-0.1

\\2-grams:
-0.2\t<s> ab
-0.3\tab </s>
-0.9\tab b

\\end\\
""")
    out = d / 'lang'
    build_hlg((d / 'units.txt').as_posix(),
              (d / 'lexicon.txt').as_posix(),
              (d / 'lm.arpa').as_posix(), out.as_posix())
    import os
    os.rename(out / 'TLG.txt', out / 'HLG.txt')

    configs = {
        'input_dim': 20, 'output_dim': 5,  # blank a b + sos/eos
        'model': 'k2_model',
        'encoder': 'transformer',
        'encoder_conf': {'output_size': 16, 'attention_heads': 2,
                         'linear_units': 32, 'num_blocks': 1,
                         'dropout_rate': 0.0,
                         'positional_dropout_rate': 0.0},
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 32,
                         'num_blocks': 1, 'r_num_blocks': 1,
                         'dropout_rate': 0.0,
                         'positional_dropout_rate': 0.0,
                         'self_attention_dropout_rate': 0.0,
                         'src_attention_dropout_rate': 0.0},
        # reverse_weight > 0 so the right decoder's params exist for
        # hlg_rescore's fixed reverse pass (ref k2/model.py:272)
        'model_conf': {'ctc_weight': 0.5, 'reverse_weight': 0.3},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    return model, variables, out


def test_hlg_onebest_and_rescore(hlg_setup):
    """hlg_onebest matches a direct WFST search over the same
    posteriors; hlg_rescore returns one of the n-best and respects the
    decoder fusion scales (ref k2/model.py:142-304)."""
    from wenet_tpu.models.k2.model import hlg_onebest, hlg_rescore
    from wenet_tpu.runtime.wfst_beam_search import CtcWfstBeamSearch
    model, variables, lang = hlg_setup
    rng = np.random.RandomState(3)
    B, T = 2, 16
    speech = rng.randn(B, T, 20).astype(np.float32)
    speech_lens = np.asarray([T, T], np.int32)
    symbol_table = {'a': 1, 'b': 2}
    hlg = (lang / 'HLG.txt').as_posix()
    word = (lang / 'words.txt').as_posix()

    hyps = hlg_onebest(model, variables, speech, speech_lens, hlg=hlg,
                       word=word, symbol_table=symbol_table)
    assert len(hyps) == B

    # oracle: run the searcher directly on the model's posteriors
    enc, mask = model.apply(variables, jnp.asarray(speech),
                            jnp.asarray(speech_lens),
                            method=model.forward_encoder)
    probs = np.asarray(model.apply(variables, enc,
                                   method=model.ctc_activation))
    from wenet_tpu.lm.fst import TextFst, read_symbol_table
    fst = TextFst.read(hlg)
    words = read_symbol_table(word)
    dec = CtcWfstBeamSearch(fst, word_table=words, beam_size=10,
                            nbest_width=4)
    n = int(np.asarray(mask[0, 0]).sum())
    dec.search(probs[0, :n])
    dec.finalize_search()
    want = [symbol_table[ch] for w in dec.hypotheses[0]
            for ch in words[w]]
    assert hyps[0] == want

    res = hlg_rescore(model, variables, speech, speech_lens,
                      lm_scale=0.5, decoder_scale=0.3,
                      r_decoder_scale=0.3, hlg=hlg, word=word,
                      symbol_table=symbol_table)
    assert len(res) == B
    # each rescored hyp must be one of the searcher's n-best
    nbest_units = [[symbol_table[ch] for w in h for ch in words[w]]
                   for h in dec.hypotheses]
    assert res[0] in nbest_units


def test_fsa_eps_chain_counts_paths_once():
    """Regression: eps closure must use the frontier formulation —
    relaxing accumulated mass counts a length-k eps path C(depth,k)
    times and inflates every LF-MMI/HLG score."""
    import numpy as np
    import jax.numpy as jnp
    from wenet_tpu.lm.fst import Arc, TextFst
    from wenet_tpu.ops.fsa import fst_to_dense_arcs, fsa_forward_score
    fst = TextFst()
    fst.start = 0

    def add(s, d, il, w=0.0):
        fst.arcs.setdefault(s, []).append(Arc(il, 0, w, d))

    add(0, 1, 0)   # eps chain of depth 2
    add(1, 2, 0)
    add(0, 3, 1)   # one emitting arc from each chain state
    add(1, 3, 1)
    add(2, 3, 1)
    fst.finals[3] = 0.0
    dfsa = fst_to_dense_arcs(fst)
    score = fsa_forward_score(jnp.zeros((1, 2)), jnp.asarray(1), dfsa)
    # exactly 3 paths of weight 1 -> log 3 (the buggy closure gave log 4)
    assert abs(float(score) - np.log(3)) < 1e-4
