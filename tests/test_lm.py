"""LM subsystem: ARPA backoff scoring, shallow fusion in prefix beam
search, and TLG text-FST Viterbi decoding."""

import math

import numpy as np
import pytest

ARPA = """
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-0.7\t<s>\t-0.3
-0.9\t</s>
-0.5\ta\t-0.2
-0.6\tb\t-0.1
-1.2\t<unk>

\\2-grams:
-0.1\t<s> a
-0.2\ta b
-0.3\tb </s>
-1.5\ta a

\\end\\
"""

L10 = math.log(10.0)


@pytest.fixture
def lm(tmp_path):
    from wenet_tpu.lm.arpa import read_arpa
    p = tmp_path / 'lm.arpa'
    p.write_text(ARPA)
    return read_arpa(p.as_posix())


def test_arpa_scores(lm):
    # direct bigram hit
    assert lm.score_word(['<s>'], 'a') == pytest.approx(-0.1 * L10)
    # backoff: P(a|b) = backoff(b) + P(a) = -0.1 + -0.5
    assert lm.score_word(['b'], 'a') == pytest.approx((-0.1 - 0.5) * L10)
    # unk mapping
    assert lm.score_word([], 'zzz') == pytest.approx(-1.2 * L10)
    # full sequence <s> a b </s>
    want = (-0.1 - 0.2 - 0.3) * L10
    assert lm.score_sequence(['a', 'b']) == pytest.approx(want)


def test_shallow_fusion_rescores_beam(lm):
    from wenet_tpu.runtime.ctc_prefix_beam_search import (
        CtcPrefixBeamSearch)
    # vocab: 0 blank, 1 -> 'a', 2 -> 'b'; acoustics slightly prefer
    # "a a" over "a b", but LM strongly prefers "a b"
    T, V = 4, 3
    logits = np.full((T, V), -5.0, np.float32)
    logits[0, 1] = 2.0           # a
    logits[1, 0] = 2.0           # blank separator
    logits[2, 1] = 1.0           # second token: a slightly beats b
    logits[2, 2] = 0.9
    logits[3, 0] = 2.0
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    sym = {1: 'a', 2: 'b'}

    plain = CtcPrefixBeamSearch(4)
    plain.search(logp)
    assert plain.hypotheses[0] == [1, 1]

    fused = CtcPrefixBeamSearch(4, lm=lm, lm_weight=2.0,
                                symbol_table=sym)
    fused.search(logp)
    fused.finalize_search()
    assert fused.hypotheses[0] == [1, 2]  # LM flips it to "a b"


def test_tlg_decode(tmp_path):
    from wenet_tpu.lm.fst import TextFst
    from wenet_tpu.runtime.wfst_beam_search import CtcWfstBeamSearch
    # tokens: blank=0, x=1, y=2 (FST ilabels shifted +1)
    # words: 1="xy", 2="yx"; graph accepts either, cost prefers none
    # AT&T text: src dst ilabel olabel [cost]; final: state [cost]
    # repeat self-loops (ilabel -> eps) mirror the composed-in CTC
    # T topology (tools/fst/ctc_token_fst.py)
    tlg = """\
0 1 2 1
1 1 2 0
1 2 3 0
2 2 3 0
0 3 3 2
3 3 3 0
3 4 2 0
4 4 2 0
2 0.0
4 0.0
"""
    p = tmp_path / 'TLG.txt'
    p.write_text(tlg)
    fst = TextFst.read(p.as_posix())
    dec = CtcWfstBeamSearch(fst, word_table={1: 'xy', 2: 'yx'},
                            beam_size=2, blank_skip_thresh=0.95)
    # posteriors spelling x x blank y  -> word "xy"
    T, V = 4, 3
    logits = np.full((T, V), -4.0, np.float32)
    logits[0, 1] = 3.0
    logits[1, 1] = 3.0
    logits[2, 0] = 5.0  # blank (skipped via thresh)
    logits[3, 2] = 3.0
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    dec.search(logp)
    dec.finalize_search()
    assert dec.hypotheses[0] == [1]
    assert dec.words() == ['xy']
    assert dec.times[0] == [0]


def test_tlg_incremental_matches_single_shot(tmp_path):
    from wenet_tpu.lm.fst import TextFst
    from wenet_tpu.runtime.wfst_beam_search import CtcWfstBeamSearch
    tlg = """\
0 1 2 1
1 1 2 0
1 2 3 2
2 0 1 0
0 0.0
2 0.0
"""
    p = tmp_path / 'TLG.txt'
    p.write_text(tlg)
    fst = TextFst.read(p.as_posix())
    rng = np.random.RandomState(0)
    x = rng.randn(20, 4).astype(np.float32)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    a = CtcWfstBeamSearch(fst, beam_size=4)
    a.search(logp)
    b = CtcWfstBeamSearch(fst, beam_size=4)
    b.search(logp[:9])
    b.search(logp[9:])
    assert a.hypotheses == b.hypotheses
    np.testing.assert_allclose(a.likelihood, b.likelihood, atol=1e-6)


def test_offline_nbest_lm_rescore(lm):
    from wenet_tpu.bin.recognize import _lm_rescore
    from wenet_tpu.models.transformer.search import DecodeResult
    id2sym = {1: 'a', 2: 'b'}
    r = DecodeResult(tokens=[1, 1], score=-1.0,
                     nbest=[[1, 1], [1, 2]],
                     nbest_scores=[-1.0, -1.1],
                     nbest_times=[[0, 2], [0, 3]])
    out = _lm_rescore(r, lm, lm_weight=2.0, id2sym=id2sym)
    assert out.tokens == [1, 2]       # LM prefers "a b"
    assert out.times == [0, 3]
