"""Every shipped recipe config must construct via the registries.

Model sizes are shrunk before init (eval_shape only — no compute) so
the sweep stays fast; what's validated is the config-key wiring
(encoder/decoder/model/predictor/joint/lora/cif registries), mirroring
the reference's test_init_model.py registry sweep."""

import glob
import os

import pytest

import jax
import jax.numpy as jnp

from wenet_tpu.utils.config import load_config
from wenet_tpu.utils.init_model import init_model

CONFIGS = sorted(glob.glob('examples/**/conf/*.yaml', recursive=True))

_SHRINK = {
    'num_blocks': 2, 'r_num_blocks': 1, 'linear_units': 64,
    'cgmlp_linear_units': 64, 'att_layer_num': 2, 'reduce_idx': 0,
    'recover_idx': 1,
}


def _shrink(conf: dict):
    for k, v in list(conf.items()):
        if isinstance(v, dict):
            _shrink(v)
        elif k in _SHRINK:
            conf[k] = _SHRINK[k]


@pytest.mark.parametrize('path', CONFIGS,
                         ids=[os.path.basename(p) for p in CONFIGS])
def test_config_constructs(path):
    configs = load_config(path)
    _shrink(configs)
    configs['cmvn'] = None           # recipe data files absent in CI
    configs.pop('cmvn_conf', None)
    mel = configs.get('dataset_conf', {}).get(
        'fbank_conf', configs.get('dataset_conf', {}).get(
            'log_mel_spectrogram_conf', {})).get('num_mel_bins', 80)
    configs['input_dim'] = mel
    if 'lfr_conf' in configs:  # paraformer: model sees stacked frames
        configs['input_dim'] = mel * configs['lfr_conf'].get('lfr_m', 7)
    configs.setdefault('output_dim', 100)
    if configs.get('model') == 'whisper':
        # shrunk whisper still needs heads | output size consistency
        configs['encoder_conf']['attention_heads'] = 4
        configs['encoder_conf']['output_size'] = 64
        configs['decoder_conf']['attention_heads'] = 4
    model, configs = init_model(None, configs)

    feats = jnp.zeros((1, 32, mel), jnp.float32)
    lens = jnp.asarray([32])
    tgt = jnp.zeros((1, 4), jnp.int32)
    tgt_lens = jnp.asarray([4])
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), feats,
                            lens, tgt, tgt_lens)
    assert 'params' in shapes
