"""End-to-end slice: train a tiny model on synthetic data via
bin/train.py, then decode with bin/recognize.py (in-process)."""

import json
import os
import sys

import numpy as np
import pytest
import yaml

from wenet_tpu.dataset.audio import write_wav

SYMS = ['<blank>', '<unk>', '你', '好', '世', '界', '<sos/eos>']


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp('e2e')
    rng = np.random.RandomState(0)
    entries = []
    for i in range(8):
        sr = 16000
        wav = (0.2 * rng.randn(sr // 2)).astype(np.float32)
        path = d / f'utt{i}.wav'
        write_wav(str(path), wav, sr)
        entries.append({'key': f'utt{i}', 'wav': str(path),
                        'txt': '你好世界'[:(i % 3) + 2]})
    with open(d / 'data.list', 'w') as f:
        for e in entries:
            f.write(json.dumps(e, ensure_ascii=False) + '\n')
    with open(d / 'units.txt', 'w') as f:
        for i, s in enumerate(SYMS):
            f.write(f'{s} {i}\n')
    config = {
        'encoder': 'conformer',
        'encoder_conf': {
            'output_size': 32, 'attention_heads': 2, 'linear_units': 64,
            'num_blocks': 2, 'cnn_module_kernel': 7,
            'use_dynamic_chunk': True, 'causal': True,
            'cnn_module_norm': 'layer_norm',
        },
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1, 'r_num_blocks': 1},
        'model_conf': {'ctc_weight': 0.3, 'lsm_weight': 0.1,
                       'reverse_weight': 0.3},
        'tokenizer': 'char',
        'tokenizer_conf': {'symbol_table_path': str(d / 'units.txt'),
                           'non_lang_syms_path': None},
        'dataset_conf': {
            'filter_conf': {'max_length': 2000, 'min_length': 0,
                            'token_min_length': 1},
            'fbank_conf': {'num_mel_bins': 40, 'dither': 0.0},
            'batch_conf': {'batch_type': 'static', 'batch_size': 4},
            'shuffle': False, 'list_shuffle': False, 'sort': False,
            'spec_aug': False,
        },
        'grad_clip': 5.0,
        'accum_grad': 1,
        'max_epoch': 1,
        'log_interval': 1,
        'optim': 'adam',
        'optim_conf': {'lr': 0.002},
        'scheduler': 'warmuplr',
        'scheduler_conf': {'warmup_steps': 4},
    }
    with open(d / 'train.yaml', 'w') as f:
        yaml.dump(config, f)
    return d


def _run_main(module_main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module_main()
    finally:
        sys.argv = old


def test_train_then_recognize(workdir):
    from wenet_tpu.bin.train import main as train_main
    from wenet_tpu.bin.recognize import main as recognize_main
    model_dir = str(workdir / 'exp')
    _run_main(train_main, [
        'train.py', '--config', str(workdir / 'train.yaml'),
        '--train_data', str(workdir / 'data.list'),
        '--cv_data', str(workdir / 'data.list'),
        '--model_dir', model_dir,
        '--tensorboard_dir', str(workdir / 'tb'),
    ])
    assert os.path.exists(os.path.join(model_dir, 'train.yaml'))
    assert os.path.exists(os.path.join(model_dir, 'final'))

    result_dir = str(workdir / 'results')
    _run_main(recognize_main, [
        'recognize.py', '--config',
        os.path.join(model_dir, 'train.yaml'),
        '--test_data', str(workdir / 'data.list'),
        '--checkpoint', os.path.join(model_dir, 'final'),
        '--result_dir', result_dir,
        '--batch_size', '4', '--beam_size', '3',
        '--ctc_weight', '0.3', '--reverse_weight', '0.3',
        '--modes', 'ctc_greedy_search', 'ctc_prefix_beam_search',
        'attention', 'attention_rescoring',
    ])
    for mode in ('ctc_greedy_search', 'ctc_prefix_beam_search',
                 'attention', 'attention_rescoring'):
        path = os.path.join(result_dir, mode, 'text')
        assert os.path.exists(path)
        lines = open(path, encoding='utf8').read().strip().split('\n')
        assert len(lines) == 8
        assert all(line.split()[0].startswith('utt') for line in lines)
    seq_rescoring = {line.split()[0]: line.split()[1:] for line in open(
        os.path.join(result_dir, 'attention_rescoring', 'text'),
        encoding='utf8').read().strip().split('\n')}

    # rescoring-ONLY invocation takes the software-pipelined batch path
    # (recognize.py decode_rescoring_batches) — hypotheses must match
    # the sequential run above exactly
    pipe_dir = str(workdir / 'results_pipelined')
    _run_main(recognize_main, [
        'recognize.py', '--config',
        os.path.join(model_dir, 'train.yaml'),
        '--test_data', str(workdir / 'data.list'),
        '--checkpoint', os.path.join(model_dir, 'final'),
        '--result_dir', pipe_dir,
        '--batch_size', '4', '--beam_size', '3',
        '--ctc_weight', '0.3', '--reverse_weight', '0.3',
        '--modes', 'attention_rescoring',
    ])
    pipe = {line.split()[0]: line.split()[1:] for line in open(
        os.path.join(pipe_dir, 'attention_rescoring', 'text'),
        encoding='utf8').read().strip().split('\n')}
    assert pipe == seq_rescoring  # hypotheses bit-identical, not just keys

    # greedy-ONLY invocation takes the pipelined ctc-greedy batch path
    # (recognize.py decode_ctc_greedy_batches) — hypotheses must match
    # the sequential multi-mode run above exactly
    seq_greedy = {line.split()[0]: line.split()[1:] for line in open(
        os.path.join(result_dir, 'ctc_greedy_search', 'text'),
        encoding='utf8').read().strip().split('\n')}
    gpipe_dir = str(workdir / 'results_greedy_pipelined')
    _run_main(recognize_main, [
        'recognize.py', '--config',
        os.path.join(model_dir, 'train.yaml'),
        '--test_data', str(workdir / 'data.list'),
        '--checkpoint', os.path.join(model_dir, 'final'),
        '--result_dir', gpipe_dir,
        '--batch_size', '4',
        '--modes', 'ctc_greedy_search',
    ])
    gpipe = {line.split()[0]: line.split()[1:] for line in open(
        os.path.join(gpipe_dir, 'ctc_greedy_search', 'text'),
        encoding='utf8').read().strip().split('\n')}
    assert gpipe == seq_greedy

    # prefix-beam-ONLY invocation takes the pipelined beam batch path
    # (recognize.py decode_prefix_beam_batches)
    seq_beam = {line.split()[0]: line.split()[1:] for line in open(
        os.path.join(result_dir, 'ctc_prefix_beam_search', 'text'),
        encoding='utf8').read().strip().split('\n')}
    bpipe_dir = str(workdir / 'results_beam_pipelined')
    _run_main(recognize_main, [
        'recognize.py', '--config',
        os.path.join(model_dir, 'train.yaml'),
        '--test_data', str(workdir / 'data.list'),
        '--checkpoint', os.path.join(model_dir, 'final'),
        '--result_dir', bpipe_dir,
        '--batch_size', '4', '--beam_size', '3',
        '--modes', 'ctc_prefix_beam_search',
    ])
    bpipe = {line.split()[0]: line.split()[1:] for line in open(
        os.path.join(bpipe_dir, 'ctc_prefix_beam_search', 'text'),
        encoding='utf8').read().strip().split('\n')}
    assert bpipe == seq_beam

    # attention-ONLY invocation takes the pipelined AR-beam batch path
    # (recognize.py decode_attention_batches)
    seq_att = {line.split()[0]: line.split()[1:] for line in open(
        os.path.join(result_dir, 'attention', 'text'),
        encoding='utf8').read().strip().split('\n')}
    apipe_dir = str(workdir / 'results_attention_pipelined')
    _run_main(recognize_main, [
        'recognize.py', '--config',
        os.path.join(model_dir, 'train.yaml'),
        '--test_data', str(workdir / 'data.list'),
        '--checkpoint', os.path.join(model_dir, 'final'),
        '--result_dir', apipe_dir,
        '--batch_size', '4', '--beam_size', '3',
        '--modes', 'attention',
    ])
    apipe = {line.split()[0]: line.split()[1:] for line in open(
        os.path.join(apipe_dir, 'attention', 'text'),
        encoding='utf8').read().strip().split('\n')}
    assert apipe == seq_att

    # hlg decode over a python-built HLG (k2-parity path,
    # ref recognize.py:144-167 + tools/k2/make_hlg.sh)
    from wenet_tpu.lm.build_graph import build_hlg
    (workdir / 'lexicon.txt').write_text('你好 你 好\n世界 世 界\n好 好\n',
                                         encoding='utf8')
    (workdir / 'words.arpa').write_text("""
\\data\\
ngram 1=5

\\1-grams:
-0.5\t<s>
-0.7\t</s>
-0.4\t你好
-0.6\t世界
-0.8\t好

\\end\\
""", encoding='utf8')
    lang = workdir / 'hlg_lang'
    build_hlg(str(workdir / 'units.txt'), str(workdir / 'lexicon.txt'),
              str(workdir / 'words.arpa'), str(lang))
    os.rename(lang / 'TLG.txt', lang / 'HLG.txt')
    _run_main(recognize_main, [
        'recognize.py', '--config',
        os.path.join(model_dir, 'train.yaml'),
        '--test_data', str(workdir / 'data.list'),
        '--checkpoint', os.path.join(model_dir, 'final'),
        '--result_dir', result_dir,
        '--batch_size', '4', '--beam_size', '3',
        '--modes', 'hlg_onebest', 'hlg_rescore',
        '--hlg', str(lang / 'HLG.txt'), '--word',
        str(lang / 'words.txt'),
        '--lm_scale', '0.5', '--decoder_scale', '0.3',
        '--r_decoder_scale', '0.3',
    ])
    for mode in ('hlg_onebest', 'hlg_rescore'):
        path = os.path.join(result_dir, mode, 'text')
        lines = open(path, encoding='utf8').read().strip().split('\n')
        assert len(lines) == 8


def test_embedding_api_on_trained_model(workdir):
    """wenet_api-style embedding surface over the e2e-trained model."""
    import json
    import numpy as np
    from wenet_tpu.runtime import api
    model_dir = str(workdir / 'exp')
    if not os.path.exists(os.path.join(model_dir, 'final')):
        import pytest
        pytest.skip('train e2e test must run first')
    h = api.wenet_init(model_dir)
    api.wenet_set_nbest(h, 2)
    api.wenet_set_timestamp(h, 1)
    api.wenet_reset(h)
    rng = np.random.RandomState(0)
    pcm = (np.clip(0.2 * rng.randn(16000), -1, 1) * 32767).astype(
        '<i2').tobytes()
    out = json.loads(api.wenet_decode(h, pcm, last=1))
    assert out['type'] == 'final_result'
    assert isinstance(out['nbest'], list) and out['nbest']
    assert 'sentence' in out['nbest'][0]
    api.wenet_free(h)


def test_average_model_over_epochs(workdir):
    """Average two saved epochs and verify the result loads + is the
    arithmetic mean (ref bin/average_model.py)."""
    from wenet_tpu.bin.average_model import main as avg_main
    import orbax.checkpoint as ocp
    from wenet_tpu.utils.checkpoint import save_checkpoint

    def load_orbax(path):
        return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    model_dir = str(workdir / 'exp')
    if not os.path.exists(os.path.join(model_dir, 'epoch_0')):
        import pytest
        pytest.skip('train e2e must run first')
    # synthesize a second epoch by perturbing epoch_0
    import jax
    import jax.numpy as jnp
    v0 = load_orbax(os.path.join(model_dir, 'epoch_0'))
    v1 = jax.tree_util.tree_map(
        lambda x: x + 1.0 if hasattr(x, 'dtype') and
        jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, v0)
    save_checkpoint(v1, os.path.join(model_dir, 'epoch_1'),
                    {'epoch': 1, 'cv_loss': 1.0, 'tag': 'epoch_1'})
    dst = os.path.join(model_dir, 'avg_2')
    _run_main(avg_main, ['average_model.py', '--dst_model', dst,
                         '--src_path', model_dir, '--num', '2'])
    va = load_orbax(dst)
    leaves0 = jax.tree_util.tree_leaves(v0)
    leavesa = jax.tree_util.tree_leaves(va)
    import numpy as np
    checked = 0
    for a, b in zip(leaves0, leavesa):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating) and a.size > 1:
            np.testing.assert_allclose(np.asarray(b), a + 0.5,
                                       atol=1e-5)
            checked += 1
    assert checked > 10


def test_decoder_main_rtf(workdir):
    """decoder_main over the e2e-trained model: result file + RTF path
    (ref decoder_main.cc flow)."""
    from wenet_tpu.bin.decoder_main import main as dec_main
    model_dir = str(workdir / 'exp')
    if not os.path.exists(os.path.join(model_dir, 'final')):
        import pytest
        pytest.skip('train e2e must run first')
    scp = workdir / 'wav.scp'
    with open(scp, 'w') as f:
        for i in range(2):
            f.write(f'utt{i} {workdir}/utt{i}.wav\n')
    result = workdir / 'decoded.txt'
    dec_main(['--model_dir', model_dir, '--wav_scp', str(scp),
              '--result_file', str(result), '--chunk_size', '4',
              '--num_left_chunks', '2', '--beam_size', '3'])
    lines = open(result, encoding='utf-8').read().strip().split('\n')
    assert len(lines) == 2
    assert lines[0].startswith('utt0')


def test_label_checker(workdir):
    from wenet_tpu.bin.label_checker import main as lc_main
    model_dir = str(workdir / 'exp')
    if not os.path.exists(os.path.join(model_dir, 'final')):
        import pytest
        pytest.skip('train e2e must run first')
    scp = workdir / 'wav2.scp'
    with open(scp, 'w') as f:
        f.write(f'utt0 {workdir}/utt0.wav\n')
    text = workdir / 'check_text'
    with open(text, 'w') as f:
        f.write('utt0 你好\n')
    out = workdir / 'check_out'
    lc_main(['--model_dir', model_dir, '--wav_scp', str(scp),
             '--text', str(text), '--result_file', str(out)])
    content = open(out, encoding='utf-8').read()
    assert 'utt0' in content and ('OK' in content or
                                  'SUSPICIOUS' in content or
                                  'TOO_SHORT' in content)


def test_cli_transcribe_and_align(workdir, capsys):
    """`wenet-tpu` CLI paths over the trained model (ref cli flow +
    --align forced alignment)."""
    import sys
    from wenet_tpu.cli.transcribe import main as cli_main
    model_dir = str(workdir / 'exp')
    if not os.path.exists(os.path.join(model_dir, 'final')):
        import pytest
        pytest.skip('train e2e must run first')
    wav = f'{workdir}/utt0.wav'
    old = sys.argv
    try:
        sys.argv = ['wenet-tpu', '-m', model_dir, '-t', wav]
        cli_main()
        out1 = capsys.readouterr().out
        assert "'text'" in out1
        sys.argv = ['wenet-tpu', '-m', model_dir, '--align',
                    '--label', '你好', wav]
        cli_main()
        out2 = capsys.readouterr().out
        assert "'tokens'" in out2 and '你' in out2
    finally:
        sys.argv = old


def test_train_on_device_frontend(workdir, tmp_path):
    """on_device_frontend mode: raw wavs batched, fbank+SpecAug fused
    into the jitted train step; training completes and loss is
    finite."""
    import yaml
    from wenet_tpu.bin.train import main as train_main
    cfg = yaml.safe_load(open(workdir / 'train.yaml'))
    cfg['dataset_conf']['on_device_frontend'] = True
    cfg['dataset_conf']['spec_aug'] = True
    cfg['dataset_conf']['spec_aug_conf'] = {'num_t_mask': 1,
                                            'num_f_mask': 1,
                                            'max_t': 10, 'max_f': 5}
    cfg['max_epoch'] = 1
    p = tmp_path / 'odf.yaml'
    p.write_text(yaml.dump(cfg))
    model_dir = str(tmp_path / 'exp_odf')
    _run_main(train_main, [
        'train.py', '--config', str(p),
        '--train_data', str(workdir / 'data.list'),
        '--cv_data', str(workdir / 'data.list'),
        '--model_dir', model_dir,
        '--tensorboard_dir', str(tmp_path / 'tb'),
    ])
    assert os.path.exists(os.path.join(model_dir, 'final'))


def test_train_profile_dir_writes_trace(workdir):
    """--profile_dir produces an xprof/xplane trace (SURVEY §5
    profiling aux subsystem; the reference has no profiler)."""
    import glob

    from wenet_tpu.bin.train import main as train_main
    model_dir = str(workdir / 'exp_prof')
    prof_dir = str(workdir / 'prof')
    _run_main(train_main, [
        'train.py', '--config', str(workdir / 'train.yaml'),
        '--train_data', str(workdir / 'data.list'),
        '--cv_data', str(workdir / 'data.list'),
        '--model_dir', model_dir,
        '--tensorboard_dir', str(workdir / 'tb_prof'),
        '--profile_dir', prof_dir,
        '--profile_start_step', '1', '--profile_steps', '1',
    ])
    traces = glob.glob(os.path.join(prof_dir, '**', '*.xplane.pb'),
                       recursive=True) + \
        glob.glob(os.path.join(prof_dir, '**', '*.trace.json*'),
                  recursive=True)
    assert traces, f'no trace files under {prof_dir}'
