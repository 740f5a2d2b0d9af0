"""Pipeline golden tests over the REFERENCE's own test fixtures
(/root/reference/test/resources: real speech wavs, an externally
produced UIO tar shard, real symbol tables) — the closest WER-parity
proxy available without corpus downloads (VERDICT.md round-1 item #8;
mirrors the reference's own fixture strategy, SURVEY.md §4).
"""

import json
import os

import numpy as np
import pytest

RES = '/root/reference/test/resources'
AISHELL_WAV = f'{RES}/aishell-BAC009S0724W0121.wav'
LIBRI_WAV = f'{RES}/librispeech-1995-1837-0001.wav'
AISHELL_TXT = '广州市房地产中介协会分析'
LIBRI_TXT = ('IT WAS THE FIRST GREAT SORROW OF HIS LIFE IT WAS NOT SO '
             'MUCH THE LOSS OF THE COTTON ITSELF BUT THE FANTASY THE '
             'HOPES THE DREAMS BUILT AROUND IT')

pytestmark = pytest.mark.skipif(not os.path.isdir(RES),
                                reason='reference fixtures not present')


def test_wav_reader_matches_scipy():
    """Our RIFF parser against scipy.io.wavfile (independent oracle)
    on both real fixture wavs (ref runtime/core/frontend/wav.h)."""
    from scipy.io import wavfile

    from wenet_tpu.dataset.audio import read_wav
    for path in (AISHELL_WAV, LIBRI_WAV):
        sr_ref, data_ref = wavfile.read(path)
        wav, sr = read_wav(path)
        assert sr == sr_ref
        # ours is float in [-1, 1), scipy gives int16
        want = data_ref.astype(np.float32) / 32768.0
        np.testing.assert_allclose(wav[0], want, atol=1e-6)


def test_fbank_real_speech_native_matches_python():
    """Kaldi fbank: jittable python op vs the native C++ kernel on REAL
    speech (prior coverage used synthetic noise only)."""
    from wenet_tpu.dataset.audio import read_wav
    from wenet_tpu.ops.fbank import compute_fbank_np
    from wenet_tpu.runtime.native_fbank import NativeFbank, available
    if not available():
        pytest.skip('native fbank lib not built')
    wav, sr = read_wav(AISHELL_WAV)
    assert sr == 16000
    samples = wav[0] * 32768.0
    ours = compute_fbank_np(samples, num_mel_bins=80, dither=0.0)
    native = NativeFbank(num_mel_bins=80).compute(samples)
    assert native.shape == ours.shape
    np.testing.assert_allclose(native, ours, atol=2e-3, rtol=2e-3)


@pytest.fixture(scope='module')
def fixture_lists(tmp_path_factory):
    """data.list with absolute paths + the reference's OWN tar shard."""
    d = tmp_path_factory.mktemp('ref_fixture')
    entries = [
        {'key': 'test/resources/dataset/aishell-BAC009S0724W0121',
         'wav': AISHELL_WAV, 'txt': AISHELL_TXT},
        {'key': 'test/resources/dataset/librispeech-1995-1837-0001',
         'wav': LIBRI_WAV, 'txt': LIBRI_TXT},
    ]
    with open(d / 'data.list', 'w', encoding='utf8') as f:
        for e in entries:
            f.write(json.dumps(e, ensure_ascii=False) + '\n')
    with open(d / 'shard.list', 'w') as f:
        f.write(f'{RES}/dataset/shards/shards_000000000.tar\n')
    return d


def _tokenizer():
    from wenet_tpu.text.char_tokenizer import CharTokenizer
    syms = {'<blank>': 0, '<unk>': 1}
    for ch in sorted(set(AISHELL_TXT + LIBRI_TXT.replace(' ', '▁'))):
        syms.setdefault(ch, len(syms))
    syms['<sos/eos>'] = len(syms)
    return CharTokenizer(syms)


def test_raw_equals_shard_on_reference_tar(fixture_lists):
    """The UIO tar reader must yield features identical to the raw path
    when fed the reference repo's own externally-created shard
    (ref test/wenet/dataset/test_datapipes.py:41-74 invariant)."""
    from wenet_tpu.dataset.dataset import Dataset
    conf = {
        'list_shuffle': False, 'shuffle': False, 'sort': False,
        'spec_aug': False,
        'filter_conf': {'max_length': 102400, 'min_length': 0,
                        'token_min_length': 1},
        'fbank_conf': {'num_mel_bins': 80, 'dither': 0.0},
        'batch_conf': {'batch_type': 'static', 'batch_size': 2},
    }
    tok = _tokenizer()
    raw = list(Dataset('raw', str(fixture_lists / 'data.list'), tok,
                       conf))
    shard = list(Dataset('shard', str(fixture_lists / 'shard.list'),
                         tok, conf))
    assert len(raw) == len(shard) == 1
    rb, sb = raw[0], shard[0]
    # order inside the tar matches data.list (aishell, then librispeech)
    assert list(rb['keys']) == list(sb['keys'])
    np.testing.assert_array_equal(rb['feats_lengths'],
                                  sb['feats_lengths'])
    np.testing.assert_allclose(rb['feats'], sb['feats'], atol=1e-6)
    np.testing.assert_array_equal(rb['target'], sb['target'])


def test_char_tokenizer_roundtrip_on_fixture_transcripts():
    tok = _tokenizer()
    _, ids = tok.tokenize(AISHELL_TXT)
    assert tok.detokenize(ids)[0] == AISHELL_TXT


def test_reference_symbol_tables_load():
    """Real symbol-table fixtures parse and are consistent."""
    from wenet_tpu.lm.fst import read_symbol_table
    words = read_symbol_table(f'{RES}/aishell2.words.txt')
    assert len(words) > 1000
    libri = read_symbol_table(f'{RES}/librispeech.words.txt')
    assert len(libri) > 1000


def test_bpe_tokenizer_on_reference_model():
    """Reference BPE model round-trip (gated: sentencepiece optional
    in this image)."""
    pytest.importorskip('sentencepiece')
    from wenet_tpu.text.bpe_tokenizer import BpeTokenizer
    tok = BpeTokenizer(
        f'{RES}/librispeech.train_960_unigram5000.bpemodel',
        f'{RES}/librispeech.words.txt')
    _, ids = tok.tokenize(LIBRI_TXT)
    assert len(ids) > 10
    assert tok.detokenize(ids)[0] == LIBRI_TXT


def test_shard_streams_over_http(fixture_lists):
    """UIO must stream shards from URLs, not just local paths
    (ref datapipes.py:365-427 + processor.py:73-93 parse_url): serve
    the reference's tar over a local http server and assert feature
    equality with the local-path read."""
    import functools
    import http.server
    import threading

    from wenet_tpu.dataset.dataset import Dataset
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=f'{RES}/dataset/shards')
    srv = http.server.ThreadingHTTPServer(('127.0.0.1', 0), handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        port = srv.server_address[1]
        url_list = fixture_lists / 'shard_url.list'
        url_list.write_text(
            f'http://127.0.0.1:{port}/shards_000000000.tar\n')
        conf = {
            'list_shuffle': False, 'shuffle': False, 'sort': False,
            'spec_aug': False,
            'filter_conf': {'max_length': 102400, 'min_length': 0,
                            'token_min_length': 1},
            'fbank_conf': {'num_mel_bins': 80, 'dither': 0.0},
            'batch_conf': {'batch_type': 'static', 'batch_size': 2},
        }
        tok = _tokenizer()
        local = list(Dataset('shard', str(fixture_lists / 'shard.list'),
                             tok, conf))
        remote = list(Dataset('shard', str(url_list), tok, conf))
        assert len(local) == len(remote) == 1
        np.testing.assert_allclose(local[0]['feats'],
                                   remote[0]['feats'], atol=1e-6)
        assert list(local[0]['keys']) == list(remote[0]['keys'])
    finally:
        srv.shutdown()
