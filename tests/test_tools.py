"""Tests for the kaldi-style tools/ utilities added for data prep
parity: data-dir ops, segment, cmvn conversion, fbank ark/scp,
shard extraction/cmvn, SPHERE decode, lexicon prep.

ref: the corresponding scripts under /root/reference/tools/."""

import json
import os
import struct
import subprocess
import sys
import tarfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, 'tools')


def run_tool(args, **kw):
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, check=True,
                          **kw)


def data_dir_main(argv):
    """In-process data_dir invocation (each subprocess pays ~2s of
    interpreter+jax-preimport in this environment; one subprocess
    smoke test still covers the CLI surface)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'tools_data_dir', os.path.join(TOOLS, 'data_dir.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(argv)


@pytest.fixture(scope='module')
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('tooldata')
    from wenet_tpu.dataset.audio import write_wav
    rng = np.random.RandomState(0)
    rows = []
    for i in range(4):
        sr = 16000
        wav = (0.1 * rng.randn(sr // 2 + i * 800)).astype(np.float32)
        path = d / f'utt{i}.wav'
        write_wav(str(path), wav, sr)
        rows.append((f'utt{i}', str(path), 'ab' if i % 2 else '你好'))
    with open(d / 'wav.scp', 'w') as f:
        for k, p, _ in rows:
            f.write(f'{k} {p}\n')
    with open(d / 'text', 'w') as f:
        for k, _, t in rows:
            f.write(f'{k} {t}\n')
    with open(d / 'utt2spk', 'w') as f:
        for k, _, _ in rows:
            f.write(f'{k} spk{int(k[-1]) % 2}\n')
    with open(d / 'data.list', 'w') as f:
        for k, p, t in rows:
            f.write(json.dumps({'key': k, 'wav': p, 'txt': t},
                               ensure_ascii=False) + '\n')
    return d


def test_data_dir_fix_validate_subset(data_dir, tmp_path):
    # break sortedness + add an orphan key, then fix
    d = tmp_path / 'dd'
    data_dir_main(['copy', str(data_dir), str(d)])
    with open(d / 'text', 'a') as f:
        f.write('zzz-orphan some text\n')
    # orphan key must fail validation (CLI smoke: real subprocess)
    r = subprocess.run([sys.executable, f'{TOOLS}/data_dir.py',
                        'validate', str(d)], capture_output=True,
                       text=True, cwd=REPO)
    assert r.returncode != 0
    data_dir_main(['fix', str(d)])
    data_dir_main(['validate', str(d)])
    with open(d / 'spk2utt') as f:
        spk2utt = dict(line.split(maxsplit=1) for line in f)
    assert set(spk2utt) == {'spk0', 'spk1'}

    sub = tmp_path / 'sub'
    data_dir_main(['subset', str(d), str(sub), '--n', '2', '--first'])
    with open(sub / 'wav.scp') as f:
        assert len(f.readlines()) == 2

    sub2 = tmp_path / 'sub2'
    data_dir_main(['subset', str(d), str(sub2), '--n', '2', '--last'])
    comb = tmp_path / 'comb'
    data_dir_main(['combine', str(comb), str(sub), str(sub2)])
    data_dir_main(['validate', str(comb)])
    with open(comb / 'wav.scp') as f:
        assert len(f.readlines()) == 4


def test_filter_scp_and_sym2int(data_dir, tmp_path):
    ids = tmp_path / 'ids'
    ids.write_text('utt1\nutt3\n')
    r = run_tool([f'{TOOLS}/data_dir.py', 'filter_scp', str(ids),
                  str(data_dir / 'wav.scp')])
    assert sorted(x.split()[0] for x in r.stdout.splitlines()) == \
        ['utt1', 'utt3']

    tab = tmp_path / 'syms'
    tab.write_text('<unk> 1\na 4\nb 5\n')
    inp = tmp_path / 'text'
    inp.write_text('utt0 a b c\n')
    r = run_tool([f'{TOOLS}/data_dir.py', 'sym2int', str(tab), str(inp),
                  '--field', '2', '--map_oov', '<unk>'])
    assert r.stdout.strip() == 'utt0 4 5 1'


def test_segment(data_dir, tmp_path):
    seg = tmp_path / 'segments'
    seg.write_text('utt0-seg1 utt0 0.0 0.25\nutt0-seg2 utt0 0.25 0.5\n')
    out = tmp_path / 'seg.scp'
    run_tool([f'{TOOLS}/segment.py', '--segments', str(seg),
              '--input', str(data_dir / 'wav.scp'),
              '--output', str(out)])
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    assert lines[0].split()[0] == 'utt0-seg1'
    assert lines[0].split()[1].endswith(',0.0,0.25')


def test_cmvn_kaldi2json(tmp_path):
    # text kaldi cmvn: [ m1..mD count v1..vD 0 ]
    d = 4
    means = np.arange(1, d + 1, dtype=np.float64)
    var = np.arange(1, d + 1, dtype=np.float64)**2
    count = 100.0
    txt = '[ ' + ' '.join(map(str, means)) + f' {count} ' + \
        ' '.join(map(str, var)) + ' 0 ]'
    src = tmp_path / 'cmvn.txt'
    src.write_text(txt)
    out = tmp_path / 'cmvn.json'
    run_tool([f'{TOOLS}/cmvn_kaldi2json.py', str(src), str(out)])
    info = json.loads(out.read_text())
    assert info['mean_stat'] == means.tolist()
    assert info['var_stat'] == var.tolist()
    assert info['frame_num'] == count

    # binary kaldi cmvn (2 x D+1 matrix) through kaldi_io
    from wenet_tpu.dataset.kaldi_io import write_mat
    stats = np.vstack([np.append(means, count),
                       np.append(var, 0.0)]).astype(np.float32)
    binpath = tmp_path / 'cmvn.bin'
    with open(binpath, 'wb') as f:
        write_mat(f, stats)
    out2 = tmp_path / 'cmvn2.json'
    run_tool([f'{TOOLS}/cmvn_kaldi2json.py', str(binpath), str(out2)])
    info2 = json.loads(out2.read_text())
    np.testing.assert_allclose(info2['mean_stat'], means, rtol=1e-6)


def test_compute_fbank_feats_and_shapes(data_dir, tmp_path):
    ark = tmp_path / 'feats.ark'
    scp = tmp_path / 'feats.scp'
    run_tool([f'{TOOLS}/compute_fbank_feats.py', '--num_mel_bins', '23',
              str(data_dir / 'wav.scp'), str(ark), str(scp)])
    from wenet_tpu.dataset.audio import read_wav
    from wenet_tpu.dataset.kaldi_io import read_mat_scp
    from wenet_tpu.ops.fbank import compute_fbank_np
    got = dict(read_mat_scp(str(scp)))
    assert len(got) == 4
    wav, sr = read_wav(str(data_dir / 'utt1.wav'))
    want = compute_fbank_np(wav[0] * (1 << 15), num_mel_bins=23)
    np.testing.assert_allclose(got['utt1'], want, atol=1e-4)

    shapes = tmp_path / 'shape.scp'
    run_tool([f'{TOOLS}/feat_to_shape.py', str(scp), str(shapes)])
    row = dict(line.split() for line in shapes.read_text().splitlines())
    assert row['utt1'] == f'{want.shape[0]},23'


@pytest.fixture(scope='module')
def shard_dir(data_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp('shards')
    tar_path = d / 'shards_000.tar'
    with open(data_dir / 'data.list') as f:
        entries = [json.loads(x) for x in f]
    with tarfile.open(tar_path, 'w') as tar:
        for e in entries:
            tar.add(e['wav'], arcname=e['key'] + '.wav')
            txt = d / 'tmp.txt'
            txt.write_text(e['txt'])
            tar.add(str(txt), arcname=e['key'] + '.txt')
    lst = d / 'shards.list'
    lst.write_text(str(tar_path) + '\n')
    return d


def test_extract_shard_data(shard_dir, tmp_path):
    out = tmp_path / 'raw'
    run_tool([f'{TOOLS}/extract_shard_data.py', '--shard_list',
              str(shard_dir / 'shards.list'), '--output_dir', str(out)])
    with open(out / 'text') as f:
        text = dict(line.split(maxsplit=1) for line in f)
    assert len(text) == 4 and text['utt2'].strip() == '你好'
    from wenet_tpu.dataset.audio import read_wav
    wav, sr = read_wav(str(out / 'shards_000' / 'utt0.wav'))
    assert sr == 16000 and wav.shape[-1] == 8000


def test_compute_shard_cmvn_stats(shard_dir, data_dir, tmp_path):
    out = tmp_path / 'global_cmvn'
    run_tool([f'{TOOLS}/compute_shard_cmvn_stats.py', '--num_mel_bins',
              '23', '--num_workers', '1', '--shard_list',
              str(shard_dir / 'shards.list'), '--out_cmvn', str(out)])
    info = json.loads(out.read_text())
    from wenet_tpu.dataset.audio import read_wav
    from wenet_tpu.ops.fbank import compute_fbank_np
    mean = np.zeros(23)
    frames = 0
    for i in range(4):
        wav, _ = read_wav(str(data_dir / f'utt{i}.wav'))
        feat = compute_fbank_np(wav[0] * (1 << 15), num_mel_bins=23)
        mean += feat.sum(0)
        frames += feat.shape[0]
    assert info['frame_num'] == frames
    np.testing.assert_allclose(info['mean_stat'], mean, rtol=1e-5)


def test_remove_longshortdata(data_dir, tmp_path):
    out = tmp_path / 'filtered.list'
    run_tool([f'{TOOLS}/remove_longshortdata.py', '--data_file',
              str(data_dir / 'data.list'), '--output_data_file',
              str(out), '--min_input_len', '0.6'])
    kept = [json.loads(x)['key'] for x in out.read_text().splitlines()]
    # utt0 is 0.5s, utt2 is 0.6s: only utt2/utt3 pass min_input_len=0.6
    assert kept == ['utt2', 'utt3']


def _write_sph(path, samples, rate):
    """Minimal NIST SPHERE writer (pcm 16-bit little-endian)."""
    channels, n = samples.shape
    header = (f'NIST_1A\n   1024\n'
              f'sample_rate -i {rate}\n'
              f'channel_count -i {channels}\n'
              f'sample_n_bytes -i 2\n'
              f'sample_byte_format -s2 01\n'
              f'sample_count -i {n}\n'
              f'sample_coding -s3 pcm\n'
              f'end_head\n')
    with open(path, 'wb') as f:
        f.write(header.encode().ljust(1024))
        f.write(samples.T.astype('<i2').tobytes())


def test_sph2wav(tmp_path):
    rng = np.random.RandomState(1)
    samples = (rng.randn(2, 8000) * 3000).astype(np.int16)
    sph = tmp_path / 'x.sph'
    _write_sph(str(sph), samples, 8000)

    out = tmp_path / 'x.wav'
    run_tool([f'{TOOLS}/sph2wav.py', str(sph), str(out),
              '--channel', '2'])
    from wenet_tpu.dataset.audio import read_wav
    wav, sr = read_wav(str(out))
    assert sr == 8000
    np.testing.assert_allclose(wav[0] * 32768.0, samples[1], atol=1.0)

    # scp + segments mode with channel suffixes
    scp = tmp_path / 'sph.scp'
    scp.write_text(f'sw1 {sph}\n')
    seg = tmp_path / 'segments'
    seg.write_text('sw1-A-0001 sw1-A 0.0 0.5\nsw1-B-0001 sw1-B 0.5 1.0\n')
    outscp = tmp_path / 'wav.scp'
    run_tool([f'{TOOLS}/sph2wav.py', '--scp', str(scp), '--segments',
              str(seg), '--wav_dir', str(tmp_path / 'wavs'),
              '--outscp', str(outscp)])
    got = dict(line.split() for line in outscp.read_text().splitlines())
    assert set(got) == {'sw1-A-0001', 'sw1-B-0001'}
    wav, sr = read_wav(got['sw1-B-0001'])
    np.testing.assert_allclose(wav[0] * 32768.0, samples[1, 4000:8000],
                               atol=1.0)


def test_prepare_dict_and_char(tmp_path):
    units = tmp_path / 'units.txt'
    units.write_text('你 2\n好 3\na 4\nb 5\n')
    raw = tmp_path / 'raw_lexicon.txt'
    raw.write_text('你好 x\nab y\n坏词 z\nSIL s\n')
    out = tmp_path / 'lexicon.txt'
    run_tool([f'{TOOLS}/fst/prepare_dict.py', str(units), str(raw),
              str(out)])
    lex = dict(line.split(maxsplit=1)
               for line in out.read_text().splitlines())
    assert lex == {'你好': '你 好', 'ab': 'a b'}  # OOV 坏词 + SIL dropped

    lang = tmp_path / 'lang'
    words = tmp_path / 'wordlist'
    words.write_text('你好\nab\n')
    run_tool([f'{TOOLS}/k2/prepare_char.py', str(units), str(words),
              str(lang)])
    for name in ('lexicon.txt', 'tokens.txt', 'words.txt', 'L.txt'):
        assert (lang / name).exists()
    from wenet_tpu.lm.fst import TextFst
    fst = TextFst.read(str(lang / 'L.txt'))
    assert fst.start in fst.finals


def test_ctc_token_fst_corrected(tmp_path):
    units = tmp_path / 'tokens.txt'
    units.write_text('<eps> 0\n<blank> 1\na 2\nb 3\n#0 4\n')
    r = run_tool([f'{TOOLS}/fst/ctc_token_fst_corrected.py', str(units)])
    lines = [x.split() for x in r.stdout.splitlines()]
    arcs = [x for x in lines if len(x) == 4]
    finals = [x for x in lines if len(x) == 1]
    assert ['0', '0', '1', '0'] in arcs       # blank self-loop
    assert ['1', '2', '3', '3'] in arcs       # direct a->b transition
    assert len(finals) == 3                   # states 0,1,2 final


def test_analyze_dataset(data_dir, tmp_path):
    out = tmp_path / 'analyze'
    run_tool([f'{TOOLS}/analyze_dataset.py', '--data_type', 'raw',
              '--data_list', str(data_dir / 'data.list'),
              '--output_dir', str(out), '--num_thread', '1'])
    summary = json.loads((out / 'summary.json').read_text())
    assert summary['duration_sec']['num'] == 4
    utt2dur = dict(line.split()
                   for line in (out / 'utt2dur').read_text().splitlines())
    assert abs(float(utt2dur['utt0']) - 0.5) < 1e-3


def test_data_dir_segments_keys(tmp_path):
    """Regression: in a segments-based dir, wav.scp is keyed by
    RECORDING id, not utt id — fix/validate/subset must not intersect
    it against the utt tables (which would empty the dir)."""
    d = tmp_path / 'segdir'
    d.mkdir()
    (d / 'wav.scp').write_text('rec1 /x/rec1.wav\nrec2 /x/rec2.wav\n')
    (d / 'segments').write_text(
        'rec1-0001 rec1 0.0 1.0\nrec1-0002 rec1 1.0 2.0\n'
        'rec2-0001 rec2 0.0 1.5\n')
    (d / 'text').write_text(
        'rec1-0001 ab\nrec1-0002 cd\nrec2-0001 ef\n')
    (d / 'utt2spk').write_text(
        'rec1-0001 spkA\nrec1-0002 spkA\nrec2-0001 spkB\n')
    data_dir_main(['validate', str(d)])
    data_dir_main(['fix', str(d)])
    # wav.scp must survive intact — not be emptied by key intersection
    assert len((d / 'wav.scp').read_text().splitlines()) == 2
    assert len((d / 'text').read_text().splitlines()) == 3

    sub = tmp_path / 'segsub'
    data_dir_main(['subset', str(d), str(sub), '--n', '2', '--first'])
    # first 2 utts are both rec1 -> wav.scp keeps only rec1
    assert (sub / 'text').read_text().count('\n') == 2
    assert (sub / 'wav.scp').read_text().splitlines() == \
        ['rec1 /x/rec1.wav']
