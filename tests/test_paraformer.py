"""Paraformer tests: LFR, CIF edge values, model loss + decode.

(The former numpy "sequential_cif" mirror test is retired: CIF numerics
are now proven against the REAL reference model in
test_reference_parity_zoo.py — loss includes the CIF quantity terms and
decode includes the fire-peak timestamps.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wenet_tpu.models.paraformer.cif import cif, cif_without_hidden
from wenet_tpu.models.paraformer.layers import lfr


def test_cif_without_hidden():
    alphas = jnp.asarray([[0.4, 0.4, 0.4, 0.4]])
    fires = np.asarray(cif_without_hidden(alphas, 1.0))
    np.testing.assert_allclose(fires[0], [0.4, 0.8, 1.2, 0.6], atol=1e-6)


def test_lfr_shapes_and_content():
    B, T, D, m, n = 2, 13, 4, 7, 6
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, D).astype(np.float32)
    lens = jnp.asarray([13, 10])
    out, new_len = lfr(jnp.asarray(x), lens, m, n)
    out = np.asarray(out)
    assert out.shape == (B, (T + n - 1) // n, m * D)
    # first output frame stacks [pad(head)*3, x0..x3] with left=3
    left = 3
    first = np.concatenate([np.repeat(x[0, :1], left, 0),
                            x[0, :m - left]], 0).reshape(-1)
    np.testing.assert_allclose(out[0, 0], first, atol=1e-6)


@pytest.fixture(scope='module')
def paraformer_model():
    from wenet_tpu.utils.init_model import init_model, init_variables
    configs = {
        'input_dim': 280,  # 40 mel * lfr_m 7
        'output_dim': 50,
        'lfr_conf': {'lfr_m': 7, 'lfr_n': 6},
        'encoder': 'sanm_encoder',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'kernel_size': 7},
        'decoder': 'sanm_decoder',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 2, 'att_layer_num': 2,
                         'kernel_size': 7},
        'model': 'paraformer',
        'model_conf': {'ctc_weight': 0.3, 'lsm_weight': 0.1,
                       'sampler': True, 'sampling_ratio': 0.75,
                       'add_eos': True},
        'predictor': 'cif_predictor',
        'predictor_conf': {'idim': 32, 'l_order': 1, 'r_order': 1,
                           'tail_threshold': 0.45},
        'tokenizer_conf': {'special_tokens': {'<sos>': 48, '<eos>': 49}},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    return model, variables


def test_paraformer_loss(paraformer_model):
    model, variables = paraformer_model
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 60, 40), jnp.float32)
    fl = jnp.asarray([60, 45])
    tgt = jnp.asarray(rng.randint(1, 47, (2, 5)), jnp.int32)
    tl = jnp.asarray([5, 3])
    tgt = jnp.where(jnp.arange(5)[None] < tl[:, None], tgt, -1)
    out = model.apply(variables, feats, fl, tgt, tl, train=True,
                      chunk_rng=jax.random.PRNGKey(3),
                      rngs={'dropout': jax.random.PRNGKey(1)})
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['loss_quantity']))
    assert np.isfinite(float(out['loss_quantity_tp']))


def test_paraformer_decode(paraformer_model):
    model, variables = paraformer_model
    from wenet_tpu.models.runner import AsrRunner
    runner = AsrRunner(model, variables)
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 60, 40).astype(np.float32)
    fl = np.asarray([60, 45])
    results = runner.decode(
        ['paraformer_greedy_search', 'ctc_greedy_search'], feats, fl)
    assert len(results['paraformer_greedy_search']) == 2
    for r in results['paraformer_greedy_search']:
        assert r.times is not None
        assert len(r.times) == len(r.tokens)
    assert len(results['ctc_greedy_search']) == 2


def test_funasr_converter_renames():
    from wenet_tpu.models.paraformer.convert import (build_config,
                                                     convert_state_dict)
    sd = {
        'predictor.cif_output2.weight': 1,
        'predictor.cif_conv1d.weight': 2,
        'predictor.upsample_cnn.weight': 3,
        'predictor.blstm.weight_ih_l0': 4,
        'decoder.embed.0.weight': 5,
        'encoder.encoders.0.self_attn.linear_q_k_v.weight': 6,
    }
    out = convert_state_dict(sd)
    assert out['predictor.tp_output.weight'] == 1
    assert out['predictor.predictor.cif_conv1d.weight'] == 2
    assert out['predictor.tp_upsample_cnn.weight'] == 3
    assert out['predictor.tp_blstm.weight_ih_l0'] == 4
    assert out['embed.weight'] == 5
    assert 'encoder.encoders.0.self_attn.linear_q_k_v.weight' in out
    cfg = build_config({'encoder_conf': {'output_size': 512,
                                         'pos_enc_class': 'x',
                                         'selfattention_layer_type': 'y'},
                        'decoder_conf': {}, 'predictor_conf':
                        {'upsample_type': 'cnn', 'use_cif1_cnn': True,
                         'idim': 512}},
                       'units.txt', 'seg', 'cmvn', 8404)
    assert cfg['encoder'] == 'sanm_encoder'
    assert cfg['encoder_conf']['input_layer'] == 'paraformer_dummy'
    assert 'pos_enc_class' not in cfg['encoder_conf']
    assert cfg['cif_predictor_conf'] == {'idim': 512}
    assert cfg['lfr_conf'] == {'lfr_m': 7, 'lfr_n': 6}


def test_paraformer_pipelined_matches_sequential(paraformer_model):
    """decode_paraformer_batches (dispatch-ahead pipeline, single fused
    device program) must reproduce the sequential runner.decode results
    batch for batch."""
    model, variables = paraformer_model
    from wenet_tpu.models.runner import AsrRunner
    runner = AsrRunner(model, variables)
    rng = np.random.RandomState(2)
    batches = []
    for i in range(3):
        feats = rng.randn(2, 60, 40).astype(np.float32)
        fl = np.asarray([60, 45 + i])
        batches.append((feats, fl))

    piped = list(runner.decode_paraformer_batches(batches))
    assert len(piped) == len(batches)
    for (feats, fl), got in zip(batches, piped):
        ref = runner.decode(['paraformer_greedy_search'], feats,
                            fl)['paraformer_greedy_search']
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            assert list(a.tokens) == list(b.tokens)
            assert list(a.times) == list(b.times)
            np.testing.assert_allclose(a.confidence, b.confidence,
                                       rtol=1e-6)

    piped_b = list(runner.decode_paraformer_batches(
        batches, mode='paraformer_beam_search'))
    for (feats, fl), got in zip(batches, piped_b):
        ref = runner.decode(['paraformer_beam_search'], feats,
                            fl)['paraformer_beam_search']
        for a, b in zip(got, ref):
            assert list(a.tokens) == list(b.tokens)
            np.testing.assert_allclose(a.score, b.score, rtol=1e-6)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        list(runner.decode_paraformer_batches(batches, mode='nope'))


def test_recognize_paraformer_pipelined_branch(paraformer_model,
                                               tmp_path):
    """bin/recognize.py with a paraformer-only mode takes the
    dispatch-ahead pipelined branch; its written hypotheses must match
    a sequential two-mode invocation of the same checkpoint."""
    import json
    import os
    import yaml

    from wenet_tpu.dataset.audio import write_wav
    from wenet_tpu.utils.checkpoint import save_checkpoint
    from wenet_tpu.bin.recognize import main as recognize_main

    model, variables = paraformer_model
    ckpt = str(tmp_path / 'model' / 'final')
    save_checkpoint(variables, ckpt)

    rng = np.random.RandomState(3)
    entries = []
    for i in range(6):
        sr = 16000
        wav = (0.2 * rng.randn(sr // 4 + 800 * i)).astype(np.float32)
        path = tmp_path / f'utt{i}.wav'
        write_wav(str(path), wav, sr)
        entries.append({'key': f'utt{i}', 'wav': str(path), 'txt': 'ab'})
    with open(tmp_path / 'data.list', 'w') as f:
        for e in entries:
            f.write(json.dumps(e) + '\n')
    with open(tmp_path / 'units.txt', 'w') as f:
        for i, s in enumerate(['<blank>', '<unk>', 'a', 'b']
                              + [f't{k}' for k in range(44)]
                              + ['<sos>', '<eos>']):
            f.write(f'{s} {i}\n')

    config = {
        'input_dim': 280, 'output_dim': 50,
        'lfr_conf': {'lfr_m': 7, 'lfr_n': 6},
        'encoder': 'sanm_encoder',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'kernel_size': 7},
        'decoder': 'sanm_decoder',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 2, 'att_layer_num': 2,
                         'kernel_size': 7},
        'model': 'paraformer',
        'model_conf': {'ctc_weight': 0.3, 'lsm_weight': 0.1,
                       'sampler': True, 'sampling_ratio': 0.75,
                       'add_eos': True},
        'predictor': 'cif_predictor',
        'predictor_conf': {'idim': 32, 'l_order': 1, 'r_order': 1,
                           'tail_threshold': 0.45},
        'tokenizer': 'char',
        'tokenizer_conf': {'symbol_table_path': str(tmp_path / 'units.txt'),
                           'non_lang_syms_path': None,
                           'special_tokens': {'<sos>': 48, '<eos>': 49}},
        'dataset_conf': {
            'filter_conf': {'max_length': 4000, 'min_length': 0},
            'fbank_conf': {'num_mel_bins': 40, 'dither': 0.0},
            'batch_conf': {'batch_type': 'static', 'batch_size': 2},
            'shuffle': False, 'list_shuffle': False, 'sort': False,
            'spec_aug': False,
        },
    }
    with open(tmp_path / 'train.yaml', 'w') as f:
        yaml.dump(config, f)

    def run(result_dir, modes):
        old = os.sys.argv
        os.sys.argv = ['recognize.py', '--config',
                       str(tmp_path / 'train.yaml'),
                       '--test_data', str(tmp_path / 'data.list'),
                       '--checkpoint', ckpt,
                       '--result_dir', result_dir,
                       '--batch_size', '2',
                       '--modes'] + modes
        try:
            recognize_main()
        finally:
            os.sys.argv = old

    seq_dir = str(tmp_path / 'seq')
    # two modes -> generic sequential loop
    run(seq_dir, ['paraformer_greedy_search', 'ctc_greedy_search'])
    pipe_dir = str(tmp_path / 'pipe')
    # single paraformer mode -> pipelined branch
    run(pipe_dir, ['paraformer_greedy_search'])

    def read(d):
        path = os.path.join(d, 'paraformer_greedy_search', 'text')
        lines = open(path, encoding='utf8').read().strip().split('\n')
        return {line.split()[0]: line.split()[1:] for line in lines}

    seq, pipe = read(seq_dir), read(pipe_dir)
    assert len(seq) == 6
    assert pipe == seq


def test_paraformer_pipelined_quantized(paraformer_model):
    """int8 weight-only runner through the pipelined batch path must
    match its own sequential decode (regression: the fused pipeline
    program once skipped dequantization)."""
    from wenet_tpu.models.runner import AsrRunner
    model, variables = paraformer_model
    rng = np.random.RandomState(5)
    feats = rng.randn(2, 60, 40).astype(np.float32)
    fl = np.asarray([60, 50])
    r_q = AsrRunner(model, variables, quantize=True)
    piped = list(r_q.decode_paraformer_batches([(feats, fl)]))
    seq = r_q.decode(['paraformer_greedy_search'], feats,
                     fl)['paraformer_greedy_search']
    assert [list(r.tokens) for r in piped[0]] == \
        [list(r.tokens) for r in seq]
