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


# ---------------------------------------------------------------------------
# pure-python TLG build pipeline (wenet_tpu/lm/build_graph.py)
# ---------------------------------------------------------------------------
WORD_ARPA = """
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
"""


@pytest.fixture
def tlg_dir(tmp_path):
    """Tiny lexicon + 2-gram ARPA -> TLG via the python builder."""
    (tmp_path / 'units.txt').write_text('a 1\nb 2\n')
    (tmp_path / 'lexicon.txt').write_text('ab a b\nb b\n')
    (tmp_path / 'lm.arpa').write_text(WORD_ARPA)
    from wenet_tpu.lm.build_graph import build_tlg
    out = tmp_path / 'lang'
    build_tlg((tmp_path / 'units.txt').as_posix(),
              (tmp_path / 'lexicon.txt').as_posix(),
              (tmp_path / 'lm.arpa').as_posix(), out.as_posix())
    return out


def _viterbi_accept(fst, ilabels):
    """Best -log cost of accepting `ilabels` (eps moves free-form DP);
    independent of the decoder — used as the golden oracle."""
    import heapq as hq
    start = (fst.start, 0)
    dist = {start: 0.0}
    pq = [(0.0, fst.start, 0)]
    best = float('inf')
    while pq:
        cost, state, i = hq.heappop(pq)
        if cost > dist.get((state, i), float('inf')):
            continue
        if i == len(ilabels):
            fc = fst.final_cost(state)
            if fc != float('inf'):
                best = min(best, cost + fc)
        for arc in fst.state_arcs(state):
            if arc.ilabel == 0:
                ni, ncost = i, cost + arc.weight
            elif i < len(ilabels) and arc.ilabel == ilabels[i]:
                ni, ncost = i + 1, cost + arc.weight
            else:
                continue
            key = (arc.nextstate, ni)
            if ncost < dist.get(key, float('inf')):
                dist[key] = ncost
                hq.heappush(pq, (ncost, arc.nextstate, ni))
    return best


def test_build_g_matches_arpa_scores(tmp_path):
    """G acceptance cost == -NgramLM.score_sequence for every word
    sequence (the G graph must encode exactly Katz backoff)."""
    from wenet_tpu.lm.arpa import read_arpa
    from wenet_tpu.lm.build_graph import build_g_fst
    p = tmp_path / 'lm.arpa'
    p.write_text(WORD_ARPA)
    lm = read_arpa(p.as_posix())
    word_ids = {'<eps>': 0, 'ab': 1, 'b': 2}
    g = build_g_fst(lm, word_ids)
    for seq in (['ab'], ['ab', 'b'], ['b'], ['b', 'ab'],
                ['ab', 'ab'], ['b', 'b', 'ab']):
        want = -lm.score_sequence(seq)
        got = _viterbi_accept(g, [word_ids[w] for w in seq])
        assert abs(got - want) < 1e-6, (seq, got, want)


def test_build_tlg_end_to_end_decode(tlg_dir):
    """Golden path: posteriors spelling `a a <blk> b` must decode to
    word 'ab' with cost == acoustic viterbi + LM(ab) (hand-computed;
    ref semantics: runtime/core/decoder/ctc_wfst_beam_search.cc
    including blank handling via explicit T arcs)."""
    from wenet_tpu.lm.fst import TextFst, read_symbol_table
    from wenet_tpu.runtime.wfst_beam_search import CtcWfstBeamSearch
    fst = TextFst.read((tlg_dir / 'TLG.txt').as_posix())
    words = read_symbol_table((tlg_dir / 'words.txt').as_posix())
    dec = CtcWfstBeamSearch(fst, word_table=words, beam_size=4,
                            blank_skip_thresh=1.1)  # no frame skipping
    # ctc ids: blank=0, a=1, b=2
    T, V = 4, 3
    logits = np.full((T, V), -3.0, np.float32)
    logits[0, 1] = 3.0   # a
    logits[1, 1] = 2.0   # a (repeat, collapses via T)
    logits[2, 0] = 4.0   # blank (explicit blank arc, no skip)
    logits[3, 2] = 3.0   # b
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    dec.search(logp)
    dec.finalize_search()
    assert dec.words() == ['ab']
    # golden cost: acoustic best path + LM score of "ab"
    acoustic = -(logp[0, 1] + logp[1, 1] + logp[2, 0] + logp[3, 2])
    lm_cost = (0.2 + 0.3) * L10  # P(ab|<s>) + P(</s>|ab)
    np.testing.assert_allclose(-dec.likelihood[0], acoustic + lm_cost,
                               atol=1e-5)
    # with frame timestamps from the emitting arc
    assert dec.times[0] == [0]


def test_tlg_nbest_distinct_word_sequences(tlg_dir):
    """Lattice-style n-best: acoustics spelling `a b <blk> b` support
    both 'ab b' and 'ab' — n-best must contain BOTH word sequences
    with correctly ordered costs (round-1 gap: nbest was just distinct
    final states)."""
    from wenet_tpu.lm.fst import TextFst, read_symbol_table
    from wenet_tpu.runtime.wfst_beam_search import CtcWfstBeamSearch
    fst = TextFst.read((tlg_dir / 'TLG.txt').as_posix())
    words = read_symbol_table((tlg_dir / 'words.txt').as_posix())
    dec = CtcWfstBeamSearch(fst, word_table=words, beam_size=4,
                            blank_skip_thresh=1.1, nbest_width=4)
    T, V = 4, 3
    logits = np.full((T, V), -1.0, np.float32)
    logits[0, 1] = 3.0   # a
    logits[1, 2] = 3.0   # b
    logits[2, 0] = 1.5   # blank-ish (b also plausible)
    logits[3, 2] = 1.5   # b-ish
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    dec.search(logp)
    dec.finalize_search()
    hyp_words = [tuple(words[w] for w in h) for h in dec.hypotheses]
    assert ('ab',) in hyp_words
    assert ('ab', 'b') in hyp_words
    lik = dec.likelihood
    assert all(lik[i] >= lik[i + 1] for i in range(len(lik) - 1))


def test_compose_combined_eps_move():
    """Regression: Mohri filter's combined eps2:eps1 move — an A
    output-eps arc adjacent to a B input-eps arc (e.g. LM backoff right
    after blank self-loops) must survive composition, exactly once."""
    from wenet_tpu.lm.build_graph import _add_arc, compose
    from wenet_tpu.lm.fst import TextFst

    a = TextFst()
    a.start = 0
    _add_arc(a, 0, 1, 5, 0)      # x : eps
    a.finals[1] = 0.0
    b = TextFst()
    b.start = 0
    _add_arc(b, 0, 1, 0, 7)      # eps : y
    b.finals[1] = 0.0
    c = compose(a, b)
    assert any(arc.ilabel == 5 and arc.olabel == 7
               for arcs in c.arcs.values() for arc in arcs)

    # and no path duplication (log-semiring correctness): two A eps
    # arcs + one B eps arc -> exactly one composed path
    a2 = TextFst()
    a2.start = 0
    _add_arc(a2, 0, 1, 5, 0)
    _add_arc(a2, 1, 2, 6, 0)
    a2.finals[2] = 0.0
    c2 = compose(a2, b)

    def count_paths(f, s, seen=0):
        n = 1 if s in f.finals else 0
        for arc in f.state_arcs(s):
            n += count_paths(f, arc.nextstate)
        return n

    assert count_paths(c2, c2.start) == 1
