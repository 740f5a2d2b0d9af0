"""jax.export StableHLO artifact round-trip (analog of the reference's
export_jit/export_onnx tests, ref test/wenet/bin/)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export as jexport


@pytest.fixture(scope='module')
def tiny_setup(tmp_path_factory):
    from wenet_tpu.utils.init_model import init_model, init_variables
    configs = {
        'input_dim': 80, 'output_dim': 12,
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
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
    return model, variables, configs


def test_export_chunk_roundtrip(tiny_setup):
    from wenet_tpu.bin.export_model import export_encoder_chunk
    from wenet_tpu.models.transformer.streaming import StreamingConfig
    model, variables, configs = tiny_setup
    cfg = StreamingConfig(decoding_chunk_size=4,
                          num_decoding_left_chunks=2,
                          subsampling_rate=model.encoder.subsampling_rate,
                          right_context=model.encoder.right_context)
    exp, args = export_encoder_chunk(model, variables, cfg, 80)
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(*args[0].shape).astype(np.float32))
    args = (xs,) + args[1:]
    reloaded = jexport.deserialize(exp.serialize())
    got = reloaded.call(*args)
    ys, att, cnn = model.apply(variables, *args,
                               method=model.forward_encoder_chunk)
    logp = model.apply(variables, ys, method=model.ctc_activation)
    np.testing.assert_allclose(got[0], ys, atol=1e-5)
    np.testing.assert_allclose(got[1], logp, atol=1e-5)


def test_export_full_symbolic_dims(tiny_setup):
    from wenet_tpu.bin.export_model import export_encoder_full
    model, variables, configs = tiny_setup
    exp, constraint = export_encoder_full(model, variables, 80)
    # constraint derived from the real subsampling geometry
    sub = model.encoder.subsampling_rate
    base = model.encoder.right_context + sub
    assert constraint == f'{sub}*t + {base}'
    reloaded = jexport.deserialize(exp.serialize())
    rng = np.random.RandomState(1)
    for B, T in ((2, sub * 8 + base), (1, sub * 13 + base)):
        speech = jnp.asarray(rng.randn(B, T, 80).astype(np.float32))
        lens = jnp.full((B,), T, jnp.int32)
        out, mask, logp = reloaded.call(speech, lens)
        ref_out, ref_mask = model.apply(
            variables, speech, lens, method=model.forward_encoder)
        np.testing.assert_allclose(out, ref_out, atol=1e-5)


def test_export_main_writes_artifacts(tiny_setup, tmp_path):
    import yaml
    from wenet_tpu.bin.export_model import main
    from wenet_tpu.utils.checkpoint import save_checkpoint
    model, variables, configs = tiny_setup
    ckpt = str(tmp_path / 'model')
    save_checkpoint(variables, ckpt)
    cfg_path = tmp_path / 'train.yaml'
    cfg_path.write_text(yaml.dump(configs))
    out_dir = tmp_path / 'export'
    main(['--config', str(cfg_path), '--checkpoint', ckpt,
          '--output_dir', str(out_dir), '--chunk_size', '4',
          '--num_left_chunks', '2', '--beam', '3',
          '--max_hyp_len', '16'])
    names = set(os.listdir(out_dir))
    assert {'encoder_chunk.stablehlo', 'encoder_full.stablehlo',
            'decoder_rescore.stablehlo', 'export_meta.json'} <= names
    meta = json.loads((out_dir / 'export_meta.json').read_text())
    assert meta['subsampling_rate'] == 4


def test_exported_asr_decoder_streaming(tiny_setup, tmp_path):
    """Full serving loop from StableHLO artifacts only (the
    OnnxAsrModel-parity path) — must match the flax AsrDecoder."""
    import yaml
    from wenet_tpu.bin.export_model import main
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.runtime.exported_model import ExportedAsrDecoder
    from wenet_tpu.runtime.feature_pipeline import FeaturePipelineConfig
    from wenet_tpu.text.char_tokenizer import CharTokenizer
    from wenet_tpu.utils.checkpoint import save_checkpoint
    model, variables, configs = tiny_setup
    ckpt = str(tmp_path / 'model')
    save_checkpoint(variables, ckpt)
    cfg_path = tmp_path / 'train.yaml'
    cfg_path.write_text(yaml.dump(configs))
    out_dir = tmp_path / 'export'
    main(['--config', str(cfg_path), '--checkpoint', ckpt,
          '--output_dir', str(out_dir), '--chunk_size', '4',
          '--num_left_chunks', '2', '--beam', '3',
          '--max_hyp_len', '16'])

    syms = {'<blank>': 0, '<unk>': 1}
    for i, ch in enumerate('abcdefghij'):
        syms[ch] = i + 2
    tokenizer = CharTokenizer(syms)
    rng = np.random.RandomState(0)
    wav = (0.2 * rng.randn(16000)).astype(np.float32)

    def run(dec):
        for i in range(0, len(wav), 3200):
            dec.accept_waveform(wav[i:i + 3200])
            dec.decode()
        dec.set_input_finished()
        dec.decode()
        dec.rescoring()
        return dec.result[0].sentence

    exp_dec = ExportedAsrDecoder(
        str(out_dir), tokenizer,
        DecodeOptions(chunk_size=4, num_left_chunks=2, beam_size=3),
        FeaturePipelineConfig(num_mel_bins=80))
    flax_dec = AsrDecoder(
        model, variables, tokenizer,
        DecodeOptions(chunk_size=4, num_left_chunks=2, beam_size=3),
        FeaturePipelineConfig(num_mel_bins=80))
    assert run(exp_dec) == run(flax_dec)
