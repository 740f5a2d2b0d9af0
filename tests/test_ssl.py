"""SSL pretraining model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

IDIM = 40


def _enc(num_blocks=2):
    from wenet_tpu.models.transformer.encoder import ConformerEncoder
    return ConformerEncoder(input_size=IDIM, output_size=32,
                            attention_heads=2, linear_units=64,
                            num_blocks=num_blocks, cnn_module_kernel=7,
                            dropout_rate=0.0)


def _batch(B=2, T=96, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(B, T, IDIM), jnp.float32),
            jnp.asarray([T, T - 20]))


def test_mask_indices():
    from wenet_tpu.models.ssl.mask import compute_mask_indices
    pad = jnp.zeros((4, 50), bool).at[1, 30:].set(True)
    m = compute_mask_indices(jax.random.PRNGKey(0), pad, 0.2, 5,
                             min_masks=2)
    m = np.asarray(m)
    assert m.shape == (4, 50)
    assert m.sum(1).min() >= 5  # at least min_masks spans
    assert not m[1, 30:].any()  # padded region never masked


def test_bestrq_loss():
    from wenet_tpu.models.ssl.bestrq_model import BestRQModel
    model = BestRQModel(encoder=_enc(), num_mel_bins=IDIM,
                        embedding_dim=16, num_embeddings=32,
                        num_codebooks=2, mask_prob=0.05)
    feats, lens = _batch()
    variables = model.init(jax.random.PRNGKey(0), feats, lens)
    out = model.apply(variables, feats, lens, train=True,
                      chunk_rng=jax.random.PRNGKey(1),
                      rngs={'dropout': jax.random.PRNGKey(2)},
                      mutable=['batch_stats'])[0]
    assert np.isfinite(float(out['loss']))
    assert 0.0 <= float(out['codes_acc']) <= 1.0


def test_wav2vec2_loss():
    from wenet_tpu.models.ssl.wav2vec2_model import Wav2vec2Model
    model = Wav2vec2Model(encoder=_enc(), embedding_dim=32,
                          num_embeddings=32, num_codebooks=2,
                          mask_prob=0.1, num_negatives=4,
                          diversity_weight=0.1)
    feats, lens = _batch()
    variables = model.init(jax.random.PRNGKey(0), feats, lens)
    out = model.apply(variables, feats, lens, steps=100, train=True,
                      chunk_rng=jax.random.PRNGKey(1),
                      rngs={'dropout': jax.random.PRNGKey(2)},
                      mutable=['batch_stats'])[0]
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['code_ppl']))


def test_w2vbert_loss():
    from wenet_tpu.models.ssl.w2vbert_model import W2VBERTModel
    model = W2VBERTModel(encoder=_enc(num_blocks=2), embedding_dim=32,
                         num_embeddings=32, num_codebooks=2,
                         mask_prob=0.1, num_negatives=4,
                         contrastive_blocks=1, masked_blocks=1)
    feats, lens = _batch()
    variables = model.init(jax.random.PRNGKey(0), feats, lens)
    out = model.apply(variables, feats, lens, train=True,
                      chunk_rng=jax.random.PRNGKey(1),
                      rngs={'dropout': jax.random.PRNGKey(2)},
                      mutable=['batch_stats'])[0]
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['loss_mlm']))
    assert np.isfinite(float(out['loss_contrastive']))


def test_ssl_registry():
    from wenet_tpu.utils.init_model import init_model
    configs = {
        'input_dim': IDIM, 'output_dim': 10,
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'cnn_module_kernel': 7},
        'model': 'bestrq_model',
        'model_conf': {'num_mel_bins': IDIM, 'embedding_dim': 16,
                       'num_embeddings': 32, 'mask_prob': 0.05},
    }
    model, _ = init_model(None, configs)
    assert type(model).__name__ == 'BestRQModel'


# ---------------------------------------------------------------------------
# untranscribed-audio (wav-only) pretraining pipeline
# (ref wenet/models/ssl/init_dataset.py:156 — no tokenizer, no txt)
# ---------------------------------------------------------------------------
@pytest.fixture(scope='module')
def ssl_workdir(tmp_path_factory):
    import json

    import yaml

    from wenet_tpu.dataset.audio import write_wav
    d = tmp_path_factory.mktemp('ssl_e2e')
    rng = np.random.RandomState(0)
    with open(d / 'data.list', 'w') as f:
        for i in range(8):
            sr = 16000
            wav = (0.2 * rng.randn(sr // 2)).astype(np.float32)
            path = d / f'utt{i}.wav'
            write_wav(str(path), wav, sr)
            # wav-only entries: NO txt key
            f.write(json.dumps({'key': f'utt{i}',
                                'wav': str(path)}) + '\n')
    config = {
        'dataset': 'ssl',
        'encoder': 'conformer',
        'encoder_conf': {
            'output_size': 32, 'attention_heads': 2, 'linear_units': 64,
            'num_blocks': 2, 'cnn_module_kernel': 7,
            'cnn_module_norm': 'layer_norm',
        },
        'model': 'bestrq_model',
        'model_conf': {'num_mel_bins': 40, 'embedding_dim': 8,
                       'num_embeddings': 16, 'num_codebooks': 1,
                       'mask_prob': 0.05, 'mask_length': 4,
                       'min_masks': 1},
        'dataset_conf': {
            'filter_conf': {'max_length': 2000, 'min_length': 0},
            'fbank_conf': {'num_mel_bins': 40, 'dither': 0.0},
            'batch_conf': {'batch_type': 'static', 'batch_size': 4},
            'shuffle': False, 'list_shuffle': False, 'sort': False,
            'spec_aug': False,
        },
        'grad_clip': 5.0, 'accum_grad': 1, 'max_epoch': 1,
        'log_interval': 1,
        'optim': 'adam', 'optim_conf': {'lr': 0.002},
        'scheduler': 'warmuplr', 'scheduler_conf': {'warmup_steps': 4},
    }
    with open(d / 'train.yaml', 'w') as f:
        yaml.dump(config, f)
    return d


@pytest.mark.slow
def test_bestrq_pretrain_wav_only_e2e(ssl_workdir):
    """bin/train.py end-to-end on a wav-only data.list (no tokenizer,
    `dataset: ssl`) — the reference's ssl init_dataset analog."""
    import os
    import sys

    from wenet_tpu.bin.train import main as train_main
    d = ssl_workdir
    model_dir = str(d / 'exp')
    argv = ['train.py', '--config', str(d / 'train.yaml'),
            '--train_data', str(d / 'data.list'),
            '--cv_data', str(d / 'data.list'),
            '--model_dir', model_dir,
            '--tensorboard_dir', str(d / 'tb')]
    old = sys.argv
    sys.argv = argv
    try:
        train_main()
    finally:
        sys.argv = old
    assert os.path.exists(os.path.join(model_dir, 'train.yaml'))
    assert os.path.exists(os.path.join(model_dir, 'final'))


@pytest.mark.slow
def test_bestrq_pretrain_loss_decreases(ssl_workdir):
    """A few adam steps on the wav-only pipeline reduce the BEST-RQ
    masked-prediction loss."""
    import yaml

    from wenet_tpu.dataset.dataset import Dataset
    from wenet_tpu.utils.init_model import init_model, init_variables
    from wenet_tpu.utils.train_utils import (
        create_train_state, init_optimizer_and_scheduler,
        make_train_step)
    d = ssl_workdir
    configs = yaml.safe_load(open(d / 'train.yaml'))
    configs['input_dim'] = 40
    configs['output_dim'] = 1
    ds = Dataset('raw', str(d / 'data.list'), None,
                 configs['dataset_conf'])
    batches = list(ds)
    assert batches and 'txt' not in batches[0]
    model, configs = init_model(None, configs)
    variables, configs = init_variables(model, configs)
    configs.setdefault('optim', 'adam')
    configs.setdefault('optim_conf', {'lr': 0.002})
    tx, schedule = init_optimizer_and_scheduler(configs)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx, schedule))
    key = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(10):
        for b in batches:
            feed = {k: jnp.asarray(v) for k, v in b.items()
                    if k in ('feats', 'feats_lengths', 'target',
                             'target_lengths')}
            state, metrics = step(state, feed, key)
            losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
