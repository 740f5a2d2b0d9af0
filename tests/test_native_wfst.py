"""C++ lattice WFST decoder (runtime/cpp/wfst_lattice_decoder.cc) vs
the python token-passing searcher: one-best agreement, real-lattice
n-best, incremental==single-shot, blank skip, split costs.

ref: runtime/core/decoder/ctc_wfst_beam_search.{h,cc} + kaldi
lattice-faster-online-decoder semantics."""

import math

import numpy as np
import pytest

from wenet_tpu.runtime.native_wfst import (NativeCtcWfstBeamSearch,
                                           _load, make_wfst_searcher)

pytestmark = pytest.mark.skipif(_load() is None,
                                reason='libwfst.so not buildable')

# same toy TLG as tests/test_lm.py::test_tlg_decode
TOY_TLG = """\
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

ARPA = """
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-0.7\t<s>\t-0.3
-0.9\t</s>
-0.5\taa\t-0.2
-0.6\tbb\t-0.1
-1.2\t<unk>

\\2-grams:
-0.1\t<s> aa
-0.2\taa bb
-0.3\tbb </s>
-1.5\taa aa

\\end\\
"""


def _softmax_logp(logits):
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


@pytest.fixture
def toy_path(tmp_path):
    p = tmp_path / 'TLG.txt'
    p.write_text(TOY_TLG)
    return p.as_posix()


def _toy_posteriors():
    T, V = 4, 3
    logits = np.full((T, V), -4.0, np.float32)
    logits[0, 1] = 3.0
    logits[1, 1] = 3.0
    logits[2, 0] = 5.0  # blank (skipped via thresh)
    logits[3, 2] = 3.0
    return _softmax_logp(logits)


def test_native_toy_decode(toy_path):
    dec = NativeCtcWfstBeamSearch(toy_path,
                                  word_table={1: 'xy', 2: 'yx'},
                                  beam_size=2, blank_skip_thresh=0.95)
    logp = _toy_posteriors()
    dec.search(logp)
    dec.finalize_search()
    assert dec.hypotheses[0] == [1]
    assert dec.words() == ['xy']
    assert dec.times[0] == [0]
    # ctc-token alignment (reference Inputs()): x=1 then y=2, merged
    assert dec.inputs[0] == [1, 2]


def test_native_incremental_matches_single_shot(toy_path):
    logp = _toy_posteriors()
    one = NativeCtcWfstBeamSearch(toy_path, blank_skip_thresh=0.95)
    one.search(logp)
    one.finalize_search()
    inc = NativeCtcWfstBeamSearch(toy_path, blank_skip_thresh=0.95)
    for i in range(logp.shape[0]):
        inc.search(logp[i:i + 1])
    inc.finalize_search()
    assert one.hypotheses == inc.hypotheses
    np.testing.assert_allclose(one.likelihood, inc.likelihood,
                               rtol=1e-5)


def test_native_partial_before_finalize(toy_path):
    dec = NativeCtcWfstBeamSearch(toy_path, blank_skip_thresh=0.95)
    logp = _toy_posteriors()
    dec.search(logp[:2])
    # after "x x": best partial path is inside word 1 ("xy"), with
    # word olabel already crossed on the first arc
    assert dec.hypotheses == [[1]]
    dec.search(logp[2:])
    dec.finalize_search()
    assert dec.hypotheses[0] == [1]


@pytest.fixture(scope='module')
def real_tlg(tmp_path_factory):
    """TLG over units {a,b}, words {aa='a a', bb='b b'} built by the
    pure-python pipeline (lm/build_graph.build_tlg)."""
    d = tmp_path_factory.mktemp('tlg')
    (d / 'units.txt').write_text('a 1\nb 2\n')
    (d / 'lexicon.txt').write_text('aa a a\nbb b b\n')
    (d / 'lm.arpa').write_text(ARPA)
    from wenet_tpu.lm.build_graph import build_tlg
    fst = build_tlg(str(d / 'units.txt'), str(d / 'lexicon.txt'),
                    str(d / 'lm.arpa'), str(d))
    return fst, str(d / 'TLG.txt')


def test_native_matches_python_onebest(real_tlg):
    from wenet_tpu.runtime.wfst_beam_search import CtcWfstBeamSearch
    fst, path = real_tlg
    rng = np.random.RandomState(0)
    V = 3  # blank, a, b
    for trial in range(5):
        T = rng.randint(6, 14)
        logits = rng.randn(T, V).astype(np.float32) * 2.0
        logp = _softmax_logp(logits)
        py = CtcWfstBeamSearch(fst, beam_size=5,
                               blank_skip_thresh=1.1)  # no skipping
        py.search(logp)
        py.finalize_search()
        cc = NativeCtcWfstBeamSearch(path, beam_size=5,
                                     blank_skip_thresh=1.1)
        cc.search(logp)
        cc.finalize_search()
        assert cc.hypotheses, f'trial {trial}: native returned no hyps'
        assert cc.hypotheses[0] == py.hypotheses[0], f'trial {trial}'
        np.testing.assert_allclose(cc.likelihood[0], py.likelihood[0],
                                   rtol=1e-4, atol=1e-4)


def test_native_nbest_is_distinct_and_ordered(real_tlg):
    _, path = real_tlg
    rng = np.random.RandomState(3)
    V = 3
    # ambiguous posteriors: both words stay plausible
    T = 8
    logits = rng.randn(T, V).astype(np.float32) * 0.5
    logp = _softmax_logp(logits)
    dec = NativeCtcWfstBeamSearch(path, beam_size=5,
                                  blank_skip_thresh=1.1)
    dec.search(logp)
    dec.finalize_search()
    hyps = dec.hypotheses
    assert len(hyps) >= 2  # the lattice yields real alternatives
    assert len({tuple(h) for h in hyps}) == len(hyps)
    lik = dec.likelihood
    assert all(lik[i] >= lik[i + 1] - 1e-6 for i in range(len(lik) - 1))
    # split costs sum back to the likelihood
    for (gc, ac), l in zip(dec.split_costs(), lik):
        assert math.isclose(-(gc + ac), l, rel_tol=1e-5, abs_tol=1e-5)


def test_make_wfst_searcher_native_and_fallback(real_tlg, toy_path):
    fst, path = real_tlg
    s = make_wfst_searcher(None, fst_path=path, beam_size=3)
    assert isinstance(s, NativeCtcWfstBeamSearch)
    # TextFst object gets serialized for the native decoder
    s2 = make_wfst_searcher(fst, beam_size=3)
    assert isinstance(s2, NativeCtcWfstBeamSearch)
    logp = _softmax_logp(np.random.RandomState(1)
                         .randn(6, 3).astype(np.float32))
    s.search(logp)
    s.finalize_search()
    s2.search(logp)
    s2.finalize_search()
    assert s.hypotheses[0] == s2.hypotheses[0]


def test_native_blank_skip_matches_python(toy_path):
    """Frames above blank_skip_thresh are skipped identically."""
    from wenet_tpu.lm.fst import TextFst
    from wenet_tpu.runtime.wfst_beam_search import CtcWfstBeamSearch
    logp = _toy_posteriors()
    py = CtcWfstBeamSearch(TextFst.read(toy_path),
                           blank_skip_thresh=0.95)
    py.search(logp)
    py.finalize_search()
    cc = NativeCtcWfstBeamSearch(toy_path, blank_skip_thresh=0.95)
    cc.search(logp)
    cc.finalize_search()
    assert cc.hypotheses[0] == py.hypotheses[0]


@pytest.mark.slow
def test_asr_decoder_with_native_tlg(tmp_path):
    """Full serving surface: streaming AsrDecoder with a TLG — the
    native lattice searcher is picked up automatically."""
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.text.char_tokenizer import CharTokenizer
    from wenet_tpu.utils.init_model import init_model, init_variables

    syms = {'<blank>': 0, '<unk>': 1}
    for i, ch in enumerate('abcd'):
        syms[ch] = i + 2
    syms['<sos/eos>'] = len(syms)
    configs = {
        'input_dim': 80, 'output_dim': len(syms),
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 1,
                         'cnn_module_kernel': 7, 'causal': True,
                         'use_dynamic_chunk': True,
                         'cnn_module_norm': 'layer_norm'},
        'decoder': 'transformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1},
        'model_conf': {'ctc_weight': 0.3},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    tokenizer = CharTokenizer(syms)

    # units in ctc-id order (after blank); words over those units
    (tmp_path / 'units.txt').write_text('<unk> 1\na 2\nb 3\nc 4\nd 5\n')
    (tmp_path / 'lexicon.txt').write_text('ab a b\ncd c d\n')
    (tmp_path / 'lm.arpa').write_text(ARPA.replace('aa', 'ab')
                                      .replace('bb', 'cd'))
    from wenet_tpu.lm.build_graph import build_tlg
    build_tlg(str(tmp_path / 'units.txt'),
              str(tmp_path / 'lexicon.txt'),
              str(tmp_path / 'lm.arpa'), str(tmp_path))
    from wenet_tpu.lm.fst import read_symbol_table
    words = read_symbol_table(str(tmp_path / 'words.txt'))

    dec = AsrDecoder(model, variables, tokenizer,
                     DecodeOptions(chunk_size=4, num_left_chunks=2,
                                   beam_size=3),
                     tlg_fst=str(tmp_path / 'TLG.txt'),
                     word_table=words)
    assert isinstance(dec.searcher, NativeCtcWfstBeamSearch)
    rng = np.random.RandomState(0)
    wav = (0.2 * rng.randn(16000)).astype(np.float32)
    for i in range(0, len(wav), 3200):
        dec.accept_waveform(wav[i:i + 3200])
        dec.decode()
    dec.set_input_finished()
    dec.decode()
    dec.rescoring()
    assert dec.result
    assert isinstance(dec.result[0].sentence, str)
