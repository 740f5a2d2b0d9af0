"""SenseVoice + FireRed construction/loss tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_firered_loss_and_attention_decode():
    from wenet_tpu.utils.init_model import init_model, init_variables
    configs = {
        'input_dim': 40, 'output_dim': 40,
        'encoder': 'firered_conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'cnn_module_kernel': 7,
                         'cnn_module_norm': 'layer_norm'},
        'decoder': 'transformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1},
        'model': 'firered',
        'model_conf': {'ctc_weight': 0.0, 'lsm_weight': 0.1},
        'tokenizer_conf': {'special_tokens': {'sos': 38, 'eos': 39}},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 64, 40), jnp.float32)
    fl = jnp.asarray([64, 48])
    tgt = jnp.asarray(rng.randint(1, 37, (2, 5)), jnp.int32)
    tl = jnp.asarray([5, 3])
    tgt = jnp.where(jnp.arange(5)[None] < tl[:, None], tgt, -1)
    out = model.apply(variables, feats, fl, tgt, tl)
    assert np.isfinite(float(out['loss']))
    # AR decode smoke
    from wenet_tpu.models.runner import AsrRunner
    runner = AsrRunner(model, variables)
    res = runner.decode(['attention'], np.asarray(feats),
                        np.asarray(fl), beam_size=2)
    assert len(res['attention']) == 2


def test_sensevoice_loss():
    from wenet_tpu.utils.init_model import init_model, init_variables
    V = 60
    configs = {
        'input_dim': 280,  # 40 mel * lfr 7
        'output_dim': V,
        'lfr_conf': {'lfr_m': 7, 'lfr_n': 6},
        'encoder': 'sanm_encoder_with_tp',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'tp_blocks': 1, 'kernel_size': 7},
        'decoder': None,
        'model': 'sensevoice_small',
        'model_conf': {'ctc_weight': 1.0, 'lsm_weight': 0.1},
        'tokenizer_conf': {'special_tokens': {'<s>': 1, '</s>': 2}},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 62, 40), jnp.float32)
    fl = jnp.asarray([62, 50])
    # target = [lid, event, emo, itn, text...]
    text = rng.randint(16, V - 2, (2, 6))
    ctx = np.asarray([[3, 1, 2, 15]] * 2)
    tgt = jnp.asarray(np.concatenate([ctx, text], axis=1), jnp.int32)
    tl = jnp.asarray([10, 8])
    out = model.apply(variables, feats, fl, tgt, tl)
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['loss_context']))


def test_firered_converter_renames():
    from wenet_tpu.models.firered.convert import convert_state_dict
    sd = {
        'encoder.layer_stack.0.mhsa.w_qs.weight': 1,
        'encoder.layer_stack.0.ffn1.net.1.weight': 2,
        'encoder.layer_stack.0.ffn1.net.0.weight': 3,
        'encoder.layer_stack.0.conv.pre_layer_norm.weight': 4,
        'encoder.layer_stack.0.conv.batch_norm.weight': 5,
        'decoder.layer_stack.1.cross_attn.fc.weight': 6,
        'decoder.token_embedding.weight': 7,
    }
    out = convert_state_dict(sd)
    assert out['encoder.encoders.0.self_attn.linear_q.weight'] == 1
    assert out['encoder.encoders.0.feed_forward_macaron.w_1.weight'] == 2
    assert out['encoder.encoders.0.norm_ff_macaron.weight'] == 3
    assert out['encoder.encoders.0.norm_conv.weight'] == 4
    assert out['encoder.encoders.0.conv_module.norm.weight'] == 5
    assert out['decoder.decoders.1.src_attn.linear_out.weight'] == 6
    assert out['decoder.embed.0.weight'] == 7


def test_sensevoice_converter_config():
    from wenet_tpu.models.sensevoice.convert import (build_config,
                                                     convert_state_dict)
    cfg = build_config({'encoder_conf': {'output_size': 512,
                                         'pos_enc_class': 'x',
                                         'selfattention_layer_type': 'y'}},
                       'chn_jpn_yue_eng_ko_spectok.bpe.model')
    assert cfg['encoder'] == 'sanm_encoder_with_tp'
    assert cfg['model'] == 'sensevoice_small'
    assert cfg['lfr_conf']['lfr_m'] == 7
    sd = convert_state_dict({'a.weight': 1,
                             'bn.num_batches_tracked': 2})
    assert sd == {'a.weight': 1}


def test_sensevoice_greedy_pipelined_matches_sequential():
    """SenseVoice rides the pipelined ctc-greedy batch path (its
    forward_encoder embeds the lid/itn prompt frames inside the same
    fused program) — results must match the sequential decoder."""
    from wenet_tpu.models.runner import AsrRunner
    from wenet_tpu.utils.init_model import init_model, init_variables
    V = 60
    configs = {
        'input_dim': 280,
        'output_dim': V,
        'lfr_conf': {'lfr_m': 7, 'lfr_n': 6},
        'encoder': 'sanm_encoder_with_tp',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'tp_blocks': 1, 'kernel_size': 7},
        'decoder': None,
        'model': 'sensevoice_small',
        'model_conf': {'ctc_weight': 1.0, 'lsm_weight': 0.1},
        'tokenizer_conf': {'special_tokens': {'<s>': 1, '</s>': 2}},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    runner = AsrRunner(model, variables)
    rng = np.random.RandomState(7)
    batches = [(rng.randn(2, 62, 40).astype(np.float32),
                np.asarray([62, 50 + i])) for i in range(2)]
    piped = list(runner.decode_ctc_greedy_batches(batches))
    for (feats, fl), got in zip(batches, piped):
        ref = runner.decode(['ctc_greedy_search'], feats,
                            fl)['ctc_greedy_search']
        assert [list(r.tokens) for r in got] == \
            [list(r.tokens) for r in ref]
