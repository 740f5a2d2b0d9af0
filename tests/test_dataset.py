"""Data pipeline tests: raw == shard features, batching, processors."""

import json
import os
import tarfile

import numpy as np
import pytest

from wenet_tpu.dataset.audio import read_wav, write_wav
from wenet_tpu.dataset.dataset import Dataset
from wenet_tpu.text.char_tokenizer import CharTokenizer

SYMS = {'<blank>': 0, '<unk>': 1, '你': 2, '好': 3, 'a': 4, 'b': 5,
        '<sos/eos>': 6}


@pytest.fixture(scope='module')
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('data')
    rng = np.random.RandomState(0)
    entries = []
    for i in range(6):
        sr = 16000
        wav = (0.2 * rng.randn(sr + i * 1600)).astype(np.float32)
        path = d / f'utt{i}.wav'
        write_wav(str(path), wav, sr)
        entries.append({'key': f'utt{i}', 'wav': str(path),
                        'txt': '你好' if i % 2 else 'ab'})
    with open(d / 'data.list', 'w') as f:
        for e in entries:
            f.write(json.dumps(e, ensure_ascii=False) + '\n')
    # tar shard with same content
    tar_path = d / 'shard0.tar'
    with tarfile.open(tar_path, 'w') as tar:
        for e in entries:
            tar.add(e['wav'], arcname=e['key'] + '.wav')
            txt = (d / 'tmp.txt')
            txt.write_text(e['txt'])
            tar.add(str(txt), arcname=e['key'] + '.txt')
    with open(d / 'shard.list', 'w') as f:
        f.write(str(tar_path) + '\n')
    return d


CONF = {
    'list_shuffle': False,
    'shuffle': False,
    'sort': False,
    'spec_aug': False,
    'filter_conf': {'max_length': 2000, 'min_length': 10},
    'fbank_conf': {'num_mel_bins': 40, 'dither': 0.0},
    'batch_conf': {'batch_type': 'static', 'batch_size': 3},
}


def _tok():
    return CharTokenizer(SYMS)


def test_wav_roundtrip(data_dir):
    wav, sr = read_wav(str(data_dir / 'utt0.wav'))
    assert sr == 16000 and wav.shape[0] == 1
    assert np.abs(wav).max() <= 1.0


def test_raw_equals_shard_features(data_dir):
    raw = Dataset('raw', str(data_dir / 'data.list'), _tok(), CONF)
    shard = Dataset('shard', str(data_dir / 'shard.list'), _tok(), CONF)
    raw_batches = list(raw)
    shard_batches = list(shard)
    assert len(raw_batches) == len(shard_batches) == 2
    for rb, sb in zip(raw_batches, shard_batches):
        assert rb['keys'] == sb['keys']
        np.testing.assert_allclose(rb['feats'], sb['feats'], atol=1e-5)
        np.testing.assert_array_equal(rb['target'], sb['target'])


def test_batch_contents(data_dir):
    ds = Dataset('raw', str(data_dir / 'data.list'), _tok(), CONF)
    batch = next(iter(ds))
    B, T, D = batch['feats'].shape
    assert B == 3 and D == 40
    assert batch['feats_lengths'].max() <= T
    assert (batch['target'] >= -1).all()
    # sorted desc by length within batch
    fl = batch['feats_lengths']
    assert all(fl[i] >= fl[i + 1] for i in range(len(fl) - 1))


def test_dynamic_batch_and_pad_multiple(data_dir):
    conf = dict(CONF)
    conf['batch_conf'] = {'batch_type': 'dynamic',
                          'max_frames_in_batch': 500}
    conf['pad_conf'] = {'pad_to_multiple': 64}
    ds = Dataset('raw', str(data_dir / 'data.list'), _tok(), conf)
    for batch in ds:
        assert batch['feats'].shape[1] % 64 == 0
        frames = batch['feats'].shape[0] * batch['feats'].shape[1]


def test_speed_perturb_and_specaug(data_dir):
    conf = dict(CONF)
    conf['speed_perturb'] = True
    conf['spec_aug'] = True
    conf['spec_sub'] = True
    conf['spec_aug_conf'] = {'num_t_mask': 2, 'num_f_mask': 2,
                             'max_t': 10, 'max_f': 5}
    ds = Dataset('raw', str(data_dir / 'data.list'), _tok(), conf)
    batches = list(ds)
    assert len(batches) >= 1


def test_shard_partition(data_dir):
    conf = dict(CONF)
    ds0 = Dataset('raw', str(data_dir / 'data.list'), _tok(), conf,
                  num_shards=2, shard_id=0)
    ds1 = Dataset('raw', str(data_dir / 'data.list'), _tok(), conf,
                  num_shards=2, shard_id=1)
    k0 = [k for b in ds0 for k in b['keys']]
    k1 = [k for b in ds1 for k in b['keys']]
    assert set(k0).isdisjoint(k1)
    assert len(k0) + len(k1) == 6


def test_kaldi_io_roundtrip(tmp_path):
    from wenet_tpu.dataset import kaldi_io
    rng = np.random.RandomState(0)
    mats = {'utt1': rng.randn(7, 13).astype(np.float32),
            'utt2': rng.randn(3, 13).astype(np.float32)}
    ark = str(tmp_path / 'feats.ark')
    scp = str(tmp_path / 'feats.scp')
    kaldi_io.write_ark_scp(ark, mats, scp)
    # ark streaming
    got = dict(kaldi_io.read_mat_ark(ark))
    assert set(got) == {'utt1', 'utt2'}
    np.testing.assert_allclose(got['utt1'], mats['utt1'])
    # scp random access
    got2 = dict(kaldi_io.read_mat_scp(scp))
    np.testing.assert_allclose(got2['utt2'], mats['utt2'])
    # vectors
    with open(str(tmp_path / 'v.ark'), 'wb') as f:
        off = kaldi_io.write_vec_flt(f, mats['utt1'][0], 'v1')
    v = kaldi_io.read_vec_flt(str(tmp_path / 'v.ark') + f':{off}')
    np.testing.assert_allclose(v, mats['utt1'][0])


def test_wav_distortion():
    from wenet_tpu.dataset import wav_distortion as wd
    rng = np.random.RandomState(0)
    x = (0.5 * rng.randn(1600)).astype(np.float32).clip(-1, 1)
    y = wd.distort(x, 'max_distortion', {'max_db': -6})
    assert np.abs(y).max() <= wd.db2amp(-6) + 1e-6
    y = wd.distort(x, 'quad_distortion')
    assert y.shape == x.shape and np.abs(y).max() <= 1.0
    y = wd.distort(x, 'gain_db', {'db': -20})
    np.testing.assert_allclose(y, np.clip(x * wd.db2amp(-20), -1, 1),
                               atol=1e-6)
    y = wd.distort(x, 'jag_distortion', {'point_rate': 0.1})
    assert (y == 0).sum() >= (x == 0).sum()
    assert wd.distort(x, 'none') is x
    s = wd.distort_wav_sample({'wav': x}, 'quad_distortion', rate=1.0)
    assert s['wav'].shape == x.shape


def test_tar_member_corruption_skips_one_sample(tmp_path):
    """One bad member invalidates only its sample, not the shard."""
    import tarfile as tf
    from wenet_tpu.dataset.datapipes import tar_source
    d = tmp_path
    wav = (0.1 * np.random.RandomState(0).randn(8000)).astype(
        np.float32)
    from wenet_tpu.dataset.audio import write_wav
    write_wav(str(d / 'a.wav'), wav, 16000)
    bad = d / 'bad.txt'
    bad.write_bytes(b'\xff\xfe invalid \xff utf8 \x80')
    good_txt = d / 'good.txt'
    good_txt.write_text('hello')
    tar_path = d / 's.tar'
    with tf.open(tar_path, 'w') as tar:
        tar.add(str(d / 'a.wav'), arcname='utt_bad.wav')
        tar.add(str(bad), arcname='utt_bad.txt')      # undecodable
        tar.add(str(d / 'a.wav'), arcname='utt_good.wav')
        tar.add(str(good_txt), arcname='utt_good.txt')
    out = list(tar_source([str(tar_path)]))
    keys = [x['key'] for x in out]
    assert keys == ['utt_good']  # bad sample dropped, shard continues


def test_prefetch_survives_abandoned_iterator():
    """Abandoning a prefetch iterator mid-stream must release the
    worker thread (epoch-break / wenet_join path)."""
    import threading
    from wenet_tpu.dataset.datapipes import DataPipe, _Gen

    def src():
        yield from range(10000)

    before = threading.active_count()
    for _ in range(5):
        it = iter(_Gen(src).prefetch(2))
        for _, x in zip(range(3), it):
            pass
        it.close()
    # give workers a beat to observe the stop flag
    import time
    time.sleep(1.2)
    assert threading.active_count() <= before + 1


def test_list_shuffle_host_consistent_before_shard(data_dir):
    """The pre-shard list shuffle must be deterministic across hosts
    so host shards partition (not resample) the data."""
    conf = {'batch_conf': {'batch_type': 'static', 'batch_size': 1},
            'fbank_conf': {'num_mel_bins': 23},
            'filter_conf': {'max_length': 102400,
                            'token_max_length': 100},
            'shuffle': False, 'sort': False, 'spec_aug': False}
    tok = CharTokenizer(SYMS)
    keys = []
    for shard_id in range(2):
        ds = Dataset('raw', str(data_dir / 'data.list'), tok, conf,
                     partition=True, num_shards=2, shard_id=shard_id)
        keys.append({b['keys'][0] for b in ds})
    assert keys[0] | keys[1] == {f'utt{i}' for i in range(6)}
    assert not (keys[0] & keys[1])


def test_prefetch_delivers_done_with_slow_consumer():
    """End-of-stream sentinel must be DELIVERED even when the queue is
    full at producer exit (slow consumer) — a dropped sentinel hangs
    the epoch."""
    import time
    from wenet_tpu.dataset.datapipes import _Gen

    def src():
        yield from range(6)

    out = []
    for x in _Gen(src).prefetch(2):
        time.sleep(0.05)  # consumer slower than producer
        out.append(x)
    assert out == list(range(6))
