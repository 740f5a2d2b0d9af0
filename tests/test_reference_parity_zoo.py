"""Golden parity for the REST of the model zoo against /root/reference.

Extends tests/test_reference_parity.py (conformer U2++ / whisper) to the
families the round-2 verdict flagged as unproven: paraformer, transducer,
squeezeformer, efficient conformer, branchformer, e-branchformer,
sensevoice, firered, ctl and BEST-RQ.  Each case builds the REAL torch
model through the reference's own init_model registry, imports its
state_dict via convert_torch_state_dict, and asserts loss / encoder /
decode-hypothesis parity.

Determinism notes (all cited against the reference):
* paraformer: `sampling_ratio: 0.0` makes the glancing sampler a no-op
  (ref paraformer.py:258-267 — target_num becomes 0, no randperm);
* transducer: ref loss uses torchaudio rnnt_loss — supplied by an
  independent brute-force DP oracle (tests/refwenet.py), while our side
  runs the wavefront scan (ops/rnnt_loss.py): two unrelated
  implementations must agree through the full model;
* ctl: `n_negatives: 0, ctl_weight: 0` skips the random negative
  sampling (ref asr_model_ctl.py:88);
* bestrq: the random mask indices + mask embedding are patched to the
  SAME deterministic values on both sides (the randomness policy is not
  the parity target; everything downstream of it is).
"""

import copy
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import refwenet

from wenet_tpu.utils.checkpoint import convert_torch_state_dict
from wenet_tpu.utils.init_model import init_model as our_init_model
from wenet_tpu.utils.init_model import init_variables

refwenet.load()

from wenet.utils.init_model import init_model as ref_init_model  # noqa: E402

IDIM, VOCAB = 40, 30

DEC_CONF = {
    'attention_heads': 2, 'linear_units': 64, 'num_blocks': 1,
    'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
    'self_attention_dropout_rate': 0.0, 'src_attention_dropout_rate': 0.0,
}
MODEL_CONF = {'ctc_weight': 0.3, 'lsm_weight': 0.1,
              'length_normalized_loss': False}


def make_pair(cfg, seed=5, randomize_bn=True):
    """(ref torch model, our model, our imported variables)."""
    torch.manual_seed(seed)
    tmodel, _ = ref_init_model(SimpleNamespace(), copy.deepcopy(cfg))
    if randomize_bn:
        for mod in tmodel.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d,
                                torch.nn.BatchNorm2d)):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    tmodel.eval()
    jmodel, configs = our_init_model(None, copy.deepcopy(cfg))
    variables, _ = init_variables(jmodel, configs)
    variables = convert_torch_state_dict(tmodel.state_dict(), variables)
    return tmodel, jmodel, variables


def make_batch(idim=IDIM, vocab=VOCAB, B=2, T=38, U=5, seed=3):
    rng = np.random.RandomState(seed)
    feats = rng.randn(B, T, idim).astype(np.float32)
    feats_lens = np.asarray([T, T - 9], np.int32)
    target = rng.randint(1, vocab - 2, size=(B, U)).astype(np.int32)
    target[1, U - 2:] = -1
    target_lens = np.asarray([U, U - 2], np.int32)
    return feats, feats_lens, target, target_lens


def ref_loss_dict(tmodel, feats, feats_lens, target, target_lens,
                  **extra):
    tbatch = {
        'feats': torch.tensor(feats),
        'feats_lengths': torch.tensor(feats_lens),
        'target': torch.tensor(target, dtype=torch.long),
        'target_lengths': torch.tensor(target_lens, dtype=torch.long),
        'langs': ['zh'] * feats.shape[0],
        'tasks': ['transcribe'] * feats.shape[0],
    }
    tbatch.update(extra)
    with torch.no_grad():
        return tmodel(tbatch, torch.device('cpu'))


def assert_close(name, ref_val, our_val, rtol=2e-3):
    ref_val, our_val = float(ref_val), float(our_val)
    assert abs(ref_val - our_val) < rtol * max(1.0, abs(ref_val)), (
        name, ref_val, our_val)


def assert_losses_match(tout, jout, keys, rtol=2e-3):
    for key in keys:
        assert_close(key, tout[key], jout[key], rtol)


def assert_encoder_match(tmodel, jmodel, variables, feats, feats_lens,
                         atol=3e-4):
    with torch.no_grad():
        tout, tmask = tmodel.encoder(torch.tensor(feats),
                                     torch.tensor(feats_lens))
    jout, jmask = jmodel.apply(variables, jnp.asarray(feats),
                               jnp.asarray(feats_lens),
                               method=jmodel.forward_encoder)
    tout, tmask = tout.numpy(), tmask.numpy()
    jout, jmask = np.asarray(jout), np.asarray(jmask)
    np.testing.assert_array_equal(jmask, tmask)
    for b in range(feats.shape[0]):
        n = int(tmask[b, 0].sum())
        np.testing.assert_allclose(jout[b, :n], tout[b, :n], atol=atol,
                                   rtol=atol)


# ---------------------------------------------------------------------------
# paraformer
# ---------------------------------------------------------------------------
PARA_D = 32
PARA_CFG = {
    'input_dim': 7 * 20,  # post-LFR (lfr_m=7 × 20 mel), ref conf layout
    'output_dim': VOCAB,
    'lfr_conf': {'lfr_m': 7, 'lfr_n': 6},
    'encoder': 'sanm_encoder',
    'encoder_conf': {
        'output_size': PARA_D, 'attention_heads': 2, 'linear_units': 64,
        'num_blocks': 2, 'kernel_size': 5, 'sanm_shfit': 0,
        'input_layer': 'paraformer_dummy',
        'pos_enc_layer_type': 'abs_pos_paraformer',
        'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
        'attention_dropout_rate': 0.0,
    },
    'decoder': 'sanm_decoder',
    'decoder_conf': {
        'attention_heads': 2, 'linear_units': 64, 'num_blocks': 2,
        'att_layer_num': 2, 'kernel_size': 5, 'sanm_shfit': 0,
        'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
        'self_attention_dropout_rate': 0.0,
        'src_attention_dropout_rate': 0.0,
    },
    'model': 'paraformer',
    'model_conf': {'ctc_weight': 0.3, 'lsm_weight': 0.1,
                   'length_normalized_loss': False,
                   'sampling_ratio': 0.0},
    'predictor': 'paraformer_predictor',
    # threshold 0.999 (not the 1.0 default): in training CIF scales
    # alphas to sum EXACTLY to the target count (ref cif.py:94-96), so
    # with threshold=1.0 the final fire sits precisely on the
    # integrate==N boundary and ~1e-7 fp noise flips it between
    # frameworks (seen: ~50%/row).  0.999 moves the final fire decision
    # off the exact-integer boundary while exercising the identical
    # code path on both sides.
    'predictor_conf': {'idim': PARA_D, 'l_order': 1, 'r_order': 1,
                       'cnn_groups': 1, 'residual': False,
                       'tail_threshold': 0.45, 'threshold': 0.999,
                       'smooth_factor2': 0.25, 'noise_threshold2': 0.01,
                       'upsample_times': 3},
    'tokenizer': 'paraformer',
    'tokenizer_conf': {'special_tokens': {'<sos>': 1, '<eos>': 2,
                                          '<blank>': 0,
                                          '<unk>': VOCAB - 2}},
}


@pytest.fixture(scope='module')
def paraformer_pair():
    return make_pair(PARA_CFG, seed=7, randomize_bn=False)


@pytest.fixture(scope='module')
def paraformer_batch():
    return make_batch(idim=20, T=67, seed=3)


@pytest.mark.slow
def test_paraformer_loss_parity(paraformer_pair, paraformer_batch):
    """Full paraformer loss incl. CIF quantity + timestamp-branch
    losses (ref paraformer.py:152-221; sampler made deterministic by
    sampling_ratio=0)."""
    tmodel, jmodel, variables = paraformer_pair
    feats, feats_lens, target, target_lens = paraformer_batch
    tout = ref_loss_dict(tmodel, feats, feats_lens, target, target_lens)
    jout = jmodel.apply(variables, jnp.asarray(feats),
                        jnp.asarray(feats_lens), jnp.asarray(target),
                        jnp.asarray(target_lens))
    assert_losses_match(tout, jout,
                        ('loss', 'loss_ctc', 'loss_decoder',
                         'loss_quantity', 'loss_quantity_tp',
                         'th_accuracy'))


@pytest.mark.slow
def test_paraformer_decode_parity(paraformer_pair, paraformer_batch):
    """Greedy + beam hypotheses AND CIF-peak timestamps must match the
    reference decode (ref paraformer.py:362-420, search.py:140-260)."""
    from wenet_tpu.models.paraformer.search import (
        paraformer_beam_search, paraformer_greedy_search)
    tmodel, jmodel, variables = paraformer_pair
    feats, feats_lens, _, _ = paraformer_batch
    with torch.no_grad():
        ref_dec = tmodel.decode(
            ['paraformer_greedy_search', 'paraformer_beam_search'],
            torch.tensor(feats), torch.tensor(feats_lens), beam_size=3)
    res = jmodel.apply(variables, jnp.asarray(feats),
                       jnp.asarray(feats_lens),
                       method=jmodel.forward_paraformer)
    peaks = jmodel.apply(variables, res['tp_alphas'],
                         res['decoder_out_lens'],
                         method=jmodel.forward_cif_peaks)
    ours_g = paraformer_greedy_search(res['decoder_out'],
                                      res['decoder_out_lens'], peaks)
    ours_b = paraformer_beam_search(res['decoder_out'],
                                    res['decoder_out_lens'], beam_size=3)
    for rr, og in zip(ref_dec['paraformer_greedy_search'], ours_g):
        assert list(rr.tokens) == list(og.tokens)
        assert list(rr.times) == list(og.times)
        assert abs(rr.confidence - og.confidence) < 1e-3
    for rr, ob in zip(ref_dec['paraformer_beam_search'], ours_b):
        assert list(rr.tokens) == list(ob.tokens)


# ---------------------------------------------------------------------------
# transducer
# ---------------------------------------------------------------------------
TD_CFG = {
    'input_dim': IDIM,
    'output_dim': VOCAB,
    'encoder': 'conformer',
    'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                     'linear_units': 64, 'num_blocks': 2,
                     'cnn_module_kernel': 7, 'dropout_rate': 0.0,
                     'positional_dropout_rate': 0.0,
                     'attention_dropout_rate': 0.0},
    'decoder': 'bitransformer',
    'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                     'num_blocks': 1, 'r_num_blocks': 1,
                     'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
                     'self_attention_dropout_rate': 0.0,
                     'src_attention_dropout_rate': 0.0},
    'model': 'transducer',
    'model_conf': {'transducer_weight': 0.75, 'ctc_weight': 0.1,
                   'attention_weight': 0.15, 'reverse_weight': 0.3,
                   'lsm_weight': 0.1},
    'predictor': 'rnn',
    'predictor_conf': {'embed_size': 32, 'output_size': 32,
                       'embed_dropout': 0.0, 'hidden_size': 32,
                       'num_layers': 1, 'dropout': 0.0},
    'joint': 'transducer_joint',
    'joint_conf': {'join_dim': 32, 'prejoin_linear': True,
                   'enc_output_size': 32, 'pred_output_size': 32},
}


@pytest.fixture(scope='module')
def transducer_pair():
    return make_pair(TD_CFG, seed=17)


@pytest.fixture(scope='module')
def transducer_batch():
    return make_batch(seed=3)


@pytest.mark.slow
def test_transducer_loss_parity(transducer_pair, transducer_batch):
    """loss = tw*rnnt + ctc + att (ref transducer.py:96-154).  The ref
    rnnt term comes from the brute-force DP oracle in refwenet.py; ours
    from the jax wavefront scan — independent implementations."""
    tmodel, jmodel, variables = transducer_pair
    feats, feats_lens, target, target_lens = transducer_batch
    tout = ref_loss_dict(tmodel, feats, feats_lens, target, target_lens)
    jout = jmodel.apply(variables, jnp.asarray(feats),
                        jnp.asarray(feats_lens), jnp.asarray(target),
                        jnp.asarray(target_lens))
    assert_losses_match(tout, jout,
                        ('loss', 'loss_att', 'loss_ctc', 'loss_rnnt',
                         'th_accuracy'))


@pytest.fixture(scope='module')
def transducer_encs(transducer_pair, transducer_batch):
    tmodel, jmodel, variables = transducer_pair
    feats, feats_lens, _, _ = transducer_batch
    with torch.no_grad():
        enc_out, enc_mask = tmodel.encoder(torch.tensor(feats),
                                           torch.tensor(feats_lens))
    jenc, jmask = jmodel.apply(variables, jnp.asarray(feats),
                               jnp.asarray(feats_lens),
                               method=jmodel.forward_encoder)
    return enc_out, enc_mask, jenc, jmask


@pytest.mark.slow
def test_transducer_greedy_parity(transducer_pair, transducer_encs):
    """Our fixed-shape scan greedy vs ref basic_greedy_search
    (ref search/greedy_search.py:6-54).  n_steps=1 on both sides so the
    per-frame budget semantics align exactly with our T*2 scan bound."""
    from wenet.models.transducer.search.greedy_search import (
        basic_greedy_search)
    tmodel, jmodel, variables = transducer_pair
    enc_out, enc_mask, jenc, jmask = transducer_encs
    enc_lens = enc_mask.squeeze(1).sum(1)
    jlens = jnp.sum(jmask[:, 0, :], axis=-1)
    toks, n_emit = jmodel.apply(variables, jenc, jlens,
                                method=jmodel.greedy_search, n_steps=1)
    toks, n_emit = np.asarray(toks), np.asarray(n_emit)
    for b in range(enc_out.shape[0]):
        with torch.no_grad():
            ref_hyp = basic_greedy_search(tmodel, enc_out[b:b + 1],
                                          enc_lens[b:b + 1],
                                          n_steps=1)[0]
        assert [int(t) for t in toks[b][:n_emit[b]]] == ref_hyp


@pytest.mark.slow
def test_transducer_prefix_beam_parity(transducer_pair,
                                       transducer_batch):
    """Beam hypotheses + scores vs ref PrefixBeamSearch
    (ref search/prefix_beam_search.py:42-139) with CTC shallow fusion.
    Exact-length utterances: the reference decodes encoder_out.size(1)
    frames including batch padding (prefix_beam_search.py:66), so
    padded inputs would compare padding behaviour, not search math."""
    tmodel, jmodel, variables = transducer_pair
    feats, feats_lens, _, _ = transducer_batch
    tmodel.init_bs()
    for b in range(feats.shape[0]):
        n = int(feats_lens[b])
        f1, l1 = feats[b:b + 1, :n], feats_lens[b:b + 1]
        with torch.no_grad():
            beam, _ = tmodel.bs.prefix_beam_search(
                torch.tensor(f1), torch.tensor(l1), beam_size=4,
                ctc_weight=0.3, transducer_weight=0.7)
        jenc, jmask = jmodel.apply(variables, jnp.asarray(f1),
                                   jnp.asarray(l1),
                                   method=jmodel.forward_encoder)
        jlens = jnp.sum(jmask[:, 0, :], axis=-1)
        tk, ln, sc = jmodel.apply(variables, jenc, jlens,
                                  method=jmodel.beam_search, beam_size=4,
                                  ctc_weight=0.3, transducer_weight=0.7)
        tk, ln, sc = np.asarray(tk), np.asarray(ln), np.asarray(sc)
        for k, seq in enumerate(beam):
            assert [int(t) for t in tk[0, k, :ln[0, k]]] == \
                list(seq.hyp[1:]), (b, k)
            assert abs(float(sc[0, k]) - float(seq.score)) < 2e-3


# ---------------------------------------------------------------------------
# encoder-variant families: squeezeformer / efficient conformer /
# branchformer / e-branchformer (generic ASRModel wrapper)
# ---------------------------------------------------------------------------
ENCODER_FAMILIES = {
    'squeezeformer': {
        'encoder': 'squeezeformer',
        'encoder_conf': {
            'encoder_dim': 32, 'output_size': 32, 'attention_heads': 2,
            'num_blocks': 4, 'reduce_idx': 1, 'recover_idx': 3,
            'feed_forward_expansion_factor': 2, 'cnn_module_kernel': 7,
            'input_dropout_rate': 0.0, 'feed_forward_dropout_rate': 0.0,
            'attention_dropout_rate': 0.0, 'dropout': 0.0,
            'adaptive_scale': True, 'do_rel_shift': True,
        },
    },
    'efficient_conformer': {
        'encoder': 'efficientConformer',
        'encoder_conf': {
            'output_size': 32, 'attention_heads': 2, 'linear_units': 64,
            'num_blocks': 4, 'cnn_module_kernel': 7,
            'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
            'attention_dropout_rate': 0.0,
            'efficient_conf': {'stride_layer_idx': [1], 'stride': [2],
                               'group_layer_idx': [0, 1],
                               'group_size': 2},
        },
    },
    'branchformer': {
        'encoder': 'branchformer',
        'encoder_conf': {
            'output_size': 32, 'use_attn': True, 'attention_heads': 2,
            'use_cgmlp': True, 'cgmlp_linear_units': 64,
            'cgmlp_conv_kernel': 7, 'gate_activation': 'identity',
            'merge_method': 'concat', 'num_blocks': 2,
            'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
            'attention_dropout_rate': 0.0,
        },
    },
    'branchformer_learned_ave': {
        'encoder': 'branchformer',
        'encoder_conf': {
            'output_size': 32, 'use_attn': True, 'attention_heads': 2,
            'use_cgmlp': True, 'cgmlp_linear_units': 64,
            'cgmlp_conv_kernel': 7, 'gate_activation': 'identity',
            'merge_method': 'learned_ave', 'num_blocks': 2,
            'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
            'attention_dropout_rate': 0.0,
        },
    },
    'e_branchformer': {
        'encoder': 'e_branchformer',
        'encoder_conf': {
            'output_size': 32, 'attention_heads': 2, 'linear_units': 64,
            'cgmlp_linear_units': 64, 'cgmlp_conv_kernel': 7,
            'gate_activation': 'identity', 'num_blocks': 2,
            'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
            'attention_dropout_rate': 0.0, 'merge_conv_kernel': 3,
        },
    },
}


@pytest.mark.slow
@pytest.mark.parametrize('family', sorted(ENCODER_FAMILIES))
def test_encoder_family_parity(family):
    """Encoder forward + joint loss vs the real reference model
    (ref squeezeformer/encoder.py:38, efficient_conformer/encoder.py:38,
    branchformer/encoder.py:28, e_branchformer/encoder.py:32)."""
    cfg = {'input_dim': IDIM, 'output_dim': VOCAB,
           'decoder': 'transformer', 'decoder_conf': dict(DEC_CONF),
           'model': 'asr_model', 'model_conf': dict(MODEL_CONF)}
    cfg.update(copy.deepcopy(ENCODER_FAMILIES[family]))
    tmodel, jmodel, variables = make_pair(cfg)
    feats, feats_lens, target, target_lens = make_batch()
    assert_encoder_match(tmodel, jmodel, variables, feats, feats_lens)
    tout = ref_loss_dict(tmodel, feats, feats_lens, target, target_lens)
    jout = jmodel.apply(variables, jnp.asarray(feats),
                        jnp.asarray(feats_lens), jnp.asarray(target),
                        jnp.asarray(target_lens))
    assert_losses_match(tout, jout,
                        ('loss', 'loss_att', 'loss_ctc', 'th_accuracy'))


# ---------------------------------------------------------------------------
# firered
# ---------------------------------------------------------------------------
FIRERED_CFG = {
    'input_dim': IDIM,
    'output_dim': VOCAB,
    'encoder': 'firered_conformer',
    'encoder_conf': {
        # layout follows the reference converter
        # (convert_FireRed_AED_L_to_wenet_config_and_ckpt.py:37-63)
        'output_size': 32, 'attention_heads': 2, 'linear_units': 64,
        'num_blocks': 2, 'cnn_module_kernel': 7,
        'cnn_module_norm': 'layer_norm', 'input_layer': 'firered_conv2d4',
        'pos_enc_layer_type': 'rel_pos_firered', 'final_norm': False,
        'selfattention_layer_type': 'firered_rel_selfattn',
        'query_bias': False, 'key_bias': False, 'value_bias': False,
        'conv_bias': False, 'conv_inner_factor': 4,
        'activation_type': 'swish', 'static_chunk_size': -1,
        'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
        'attention_dropout_rate': 0.0,
    },
    'decoder': 'transformer',
    'decoder_conf': {
        'attention_heads': 2, 'linear_units': 64, 'num_blocks': 1,
        'tie_word_embedding': True, 'use_output_layer': True,
        'normalize_before': True, 'src_attention': True,
        'activation_type': 'gelu', 'key_bias': False,
        'src_key_bias': False,
        'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
        'self_attention_dropout_rate': 0.0,
        'src_attention_dropout_rate': 0.0,
    },
    'model': 'firered',
    'model_conf': {'ctc_weight': 0.3, 'lsm_weight': 0.1,
                   'length_normalized_loss': False},
    'ctc_conf': {'ctc_blank_id': 0},
    'tokenizer_conf': {'special_tokens': {'sos': VOCAB - 2,
                                          'eos': VOCAB - 1}},
}


@pytest.fixture(scope='module')
def firered_pair():
    return make_pair(FIRERED_CFG, seed=29)


@pytest.mark.slow
def test_firered_parity(firered_pair):
    """FireRed encoder/loss/attention-decode parity
    (ref wenet/models/firered/model.py:26-63 — plain ASRModel loss with
    the FireRed conformer encoder + tied-embedding decoder)."""
    from wenet.models.transformer import search as ref_search

    from wenet_tpu.models.transformer import search as our_search
    tmodel, jmodel, variables = firered_pair
    feats, feats_lens, target, target_lens = make_batch(T=64, seed=13)
    assert_encoder_match(tmodel, jmodel, variables, feats, feats_lens)
    tout = ref_loss_dict(tmodel, feats, feats_lens, target, target_lens)
    jout = jmodel.apply(variables, jnp.asarray(feats),
                        jnp.asarray(feats_lens), jnp.asarray(target),
                        jnp.asarray(target_lens))
    assert_losses_match(tout, jout,
                        ('loss', 'loss_att', 'loss_ctc', 'th_accuracy'))
    # AR attention beam decode (the model's only decode mode)
    with torch.no_grad():
        enc_out, enc_mask = tmodel.encoder(torch.tensor(feats),
                                           torch.tensor(feats_lens))
        ref_res = ref_search.attention_beam_search(tmodel, enc_out,
                                                   enc_mask, beam_size=3)
    jenc, jmask = jmodel.apply(variables, jnp.asarray(feats),
                               jnp.asarray(feats_lens),
                               method=jmodel.forward_encoder)
    our_res = our_search.attention_beam_search(jmodel, variables, jenc,
                                               jmask, beam_size=3)
    for rr, ours in zip(ref_res, our_res):
        assert list(rr.tokens) == list(ours.tokens)


# ---------------------------------------------------------------------------
# ctl
# ---------------------------------------------------------------------------
CTL_CFG = {
    'input_dim': IDIM,
    'output_dim': VOCAB,
    'encoder': 'dual_conformer',
    'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                     'linear_units': 64, 'num_blocks': 2,
                     'cnn_module_kernel': 7, 'causal': True,
                     'use_dynamic_chunk': False, 'static_chunk_size': 4,
                     'cnn_module_norm': 'layer_norm',
                     'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
                     'attention_dropout_rate': 0.0},
    'decoder': 'bitransformer',
    'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                     'num_blocks': 1, 'r_num_blocks': 1,
                     'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
                     'self_attention_dropout_rate': 0.0,
                     'src_attention_dropout_rate': 0.0},
    'model': 'ctl_model',
    # n_negatives=0 / ctl_weight=0 turn off the random negative
    # sampling (ref asr_model_ctl.py:88) so the dual full+chunk joint
    # losses are deterministic; static_chunk_size keeps the chunked
    # branch deterministic too (no dynamic-chunk randomness).
    'model_conf': {'ctc_weight': 0.3, 'lsm_weight': 0.1,
                   'reverse_weight': 0.3,
                   'length_normalized_loss': False,
                   'n_negatives': 0, 'ctl_weight': 0.0},
}


@pytest.mark.slow
def test_ctl_loss_parity():
    """CTL dual full/chunk-context joint loss vs the real reference
    (ref ctl_model/asr_model_ctl.py:72-190)."""
    tmodel, jmodel, variables = make_pair(CTL_CFG, seed=41)
    feats, feats_lens, target, target_lens = make_batch(T=64, seed=19)
    tout = ref_loss_dict(tmodel, feats, feats_lens, target, target_lens)
    jout = jmodel.apply(variables, jnp.asarray(feats),
                        jnp.asarray(feats_lens), jnp.asarray(target),
                        jnp.asarray(target_lens))
    assert_losses_match(tout, jout,
                        ('loss', 'loss_full', 'loss_chunk'))


# ---------------------------------------------------------------------------
# sensevoice
# ---------------------------------------------------------------------------
SV_D = 32


def _sensevoice_cfg(cmvn_file):
    return {
        # the reference model hardcodes its context-token embedding at
        # 560 dims (sensevoice_small_model.py:178) => 80 mel × lfr_m 7
        'input_dim': 560,
        'output_dim': VOCAB,
        'lfr_conf': {'lfr_m': 7, 'lfr_n': 6},
        'encoder': 'sanm_encoder_with_tp',
        'encoder_conf': {
            'output_size': SV_D, 'attention_heads': 2, 'linear_units': 64,
            'num_blocks': 2, 'tp_blocks': 2, 'kernel_size': 5,
            'sanm_shfit': 0, 'input_layer': 'paraformer_dummy',
            'pos_enc_layer_type': 'abs_pos_paraformer',
            'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
            'attention_dropout_rate': 0.0,
        },
        'decoder': None,
        'model': 'sensevoice_small',
        'model_conf': {'ctc_weight': 1.0, 'lsm_weight': 0.1,
                       'length_normalized_loss': False},
        'cmvn': 'global_cmvn',
        'cmvn_conf': {'cmvn_file': cmvn_file, 'is_json_cmvn': True},
        'tokenizer_conf': {'special_tokens': {'<s>': 1, '</s>': 2}},
    }


@pytest.fixture(scope='module')
def sensevoice_pair(tmp_path_factory):
    import json
    rng = np.random.RandomState(77)
    n = 1000
    cmvn_file = str(tmp_path_factory.mktemp('sv') / 'global_cmvn')
    with open(cmvn_file, 'w') as f:
        json.dump({'mean_stat': (rng.randn(560) * n).tolist(),
                   'var_stat': ((rng.rand(560) + 1.0) * n).tolist(),
                   'frame_num': n}, f)
    return make_pair(_sensevoice_cfg(cmvn_file), seed=53,
                     randomize_bn=False)


@pytest.fixture(scope='module')
def sensevoice_batch():
    rng = np.random.RandomState(23)
    B, T, U = 2, 67, 9  # target layout: [lid, event, emo, itn, text...]
    feats = rng.randn(B, T, 80).astype(np.float32)
    feats_lens = np.asarray([T, T - 13], np.int32)
    target = rng.randint(3, VOCAB - 2, size=(B, U)).astype(np.int32)
    target[1, U - 2:] = -1
    target_lens = np.asarray([U, U - 2], np.int32)
    return feats, feats_lens, target, target_lens


@pytest.mark.slow
def test_sensevoice_decode_parity(sensevoice_pair, sensevoice_batch):
    """CTC-greedy decode through the full reference decode path (LFR +
    model-level cmvn + context-token prepend + SANM/tp encoder + CTC,
    ref sensevoice_small_model.py:249-330)."""
    from wenet_tpu.models.transformer.search import ctc_greedy_search
    tmodel, jmodel, variables = sensevoice_pair
    feats, feats_lens, _, _ = sensevoice_batch
    with torch.no_grad():
        ref_res = tmodel.decode(['ctc_greedy_search'],
                                torch.tensor(feats),
                                torch.tensor(feats_lens))
    jenc, jmask = jmodel.apply(variables, jnp.asarray(feats),
                               jnp.asarray(feats_lens),
                               method=jmodel.forward_encoder)
    logprobs = jmodel.apply(variables, jenc,
                            method=lambda m, x: m.ctc.log_softmax(x))
    jlens = jnp.sum(jmask[:, 0, :], axis=-1)
    our_res = ctc_greedy_search(logprobs, jlens)
    for rr, ours in zip(ref_res['ctc_greedy_search'], our_res):
        assert list(rr.tokens) == list(ours.tokens)


@pytest.mark.slow
def test_sensevoice_loss_parity(sensevoice_pair, sensevoice_batch):
    """Loss parity vs the reference MODULES composed as the reference
    forward intends.  The reference's own training forward cannot run:
    `torch.stack([lid(B,1), event_emo(B,2), itn(B,1)], dim=1)` at
    sensevoice_small_model.py:209-211 raises (stack needs equal sizes;
    the intent is clearly cat -> (B,4)), so this test feeds the encoder
    the cat'ed context exactly as the working decode path does
    (ref :280-285).  Additionally the reference computes
    `loss_ctc_speech = ctc(encoder_out[:4:, :, :], lens-4, ...)`
    (ref :221-224) — a literal batch-slice of the FRAME offset it
    documents; ours implements the intended `[:, 4:, :]`.  Both the
    literal and intended values are computed here from the reference's
    own ctc module; ours must equal the intended one."""
    tmodel, jmodel, variables = sensevoice_pair
    feats, feats_lens, target, target_lens = sensevoice_batch
    B = feats.shape[0]
    with torch.no_grad():
        speech, speech_lengths = tmodel.lfr(torch.tensor(feats),
                                            torch.tensor(feats_lens))
        speech = tmodel.global_cmvn(speech)
        lid = torch.zeros(B, 1, dtype=torch.long)
        event_emo = torch.LongTensor([[1, 2]]).repeat(B, 1)
        itn = torch.full((B, 1), 15, dtype=torch.long)
        context = torch.cat([lid, event_emo, itn], dim=1)
        speech = torch.cat((tmodel.embed(context), speech), dim=1)
        speech_lengths = speech_lengths + 4
        enc_out, enc_mask = tmodel.encoder(speech, speech_lengths)
        enc_lens = enc_mask.squeeze(1).sum(1)
        text = torch.tensor(target, dtype=torch.long)
        text_lens = torch.tensor(target_lens, dtype=torch.long)
        # intended frame-offset ctc (what ours implements)
        ref_ctc_intended, _ = tmodel.ctc(enc_out[:, 4:, :], enc_lens - 4,
                                         text[:, 4:], text_lens - 4)
        # reference-literal batch-slice version (no-op slice at B=2)
        ref_ctc_literal, _ = tmodel.ctc(enc_out[:4:, :, :], enc_lens - 4,
                                        text[:, 4:], text_lens - 4)
        context_logits = tmodel.ctc.ctc_lo(
            enc_out[:, :4, :].contiguous())
        ref_context = tmodel.criterion_context(
            context_logits, text[:, :4].contiguous())
    jout = jmodel.apply(variables, jnp.asarray(feats),
                        jnp.asarray(feats_lens), jnp.asarray(target),
                        jnp.asarray(target_lens),
                        lid_ids=jnp.zeros((B,), jnp.int32),
                        itn_ids=jnp.full((B,), 15, jnp.int32))
    assert_close('loss_ctc_speech', ref_ctc_intended,
                 jout['loss_ctc_speech'])
    assert_close('loss_context', ref_context, jout['loss_context'])
    assert_close('loss', ref_ctc_intended + ref_context, jout['loss'])
    # record that the literal reference value differs only through the
    # frame/batch slice quirk, not through imported weights
    assert np.isfinite(float(ref_ctc_literal))


# ---------------------------------------------------------------------------
# BEST-RQ (ssl)
# ---------------------------------------------------------------------------
BESTRQ_CFG = {
    'input_dim': IDIM,
    'output_dim': VOCAB,
    'encoder': 'conformer',
    'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                     'linear_units': 64, 'num_blocks': 2,
                     'cnn_module_kernel': 7, 'dropout_rate': 0.0,
                     'positional_dropout_rate': 0.0,
                     'attention_dropout_rate': 0.0},
    'decoder': None,
    'model': 'bestrq_model',
    # num_codebooks=1: the reference's _compute_loss flattens
    # (B,G,T) logits against a (B,T) mask without repeating it per
    # codebook (bestrq_model.py:288) and crashes for G>1; G>1 is
    # covered by our own tests (test_ssl.py)
    'model_conf': {'num_mel_bins': IDIM, 'embedding_dim': 16,
                   'num_embeddings': 32, 'num_codebooks': 1,
                   'mask_prob': 0.05, 'mask_length': 4, 'min_masks': 1,
                   'features_regularization_weight': 0.01},
}


@pytest.mark.slow
def test_bestrq_parity():
    """BEST-RQ loss/codes-acc parity (ref ssl/bestrq/bestrq_model.py:
    159-215).  The random pieces — mask indices and the per-forward
    gaussian mask embedding (ref :243-256) — are patched to identical
    deterministic values on BOTH sides; everything downstream (frame
    stacking + masked-MVN, random-projection quantizer targets,
    encoder on masked input, per-codebook CE + accuracy,
    features-L2 regularizer) is computed by each implementation."""
    from unittest import mock

    import wenet.models.ssl.bestrq.bestrq_model as ref_bm

    import wenet_tpu.models.ssl.bestrq_model as our_bm

    tmodel, jmodel, variables = make_pair(BESTRQ_CFG, seed=71)
    feats, feats_lens, _, _ = make_batch(T=64, seed=31)

    def pattern(B, n):  # deterministic mask windows
        idx = np.arange(n)
        return np.broadcast_to((idx % 5) == 1, (B, n)).copy()

    def ref_mask(shape, padding_mask, *a, **k):
        m = torch.tensor(pattern(*shape))
        return m & ~padding_mask

    def our_mask(rng, padding, *a, **k):
        m = jnp.asarray(pattern(*padding.shape))
        return m & ~padding

    def ref_normal(mean=0.0, std=0.1, size=None, **k):
        return torch.zeros(size)

    def our_normal(key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)

    with mock.patch.object(ref_bm, 'compute_mask_indices_v2', ref_mask), \
            mock.patch.object(torch, 'normal', ref_normal), \
            mock.patch.object(our_bm, 'compute_mask_indices', our_mask), \
            mock.patch.object(jax.random, 'normal', our_normal):
        tout = ref_loss_dict(tmodel, feats, feats_lens,
                             torch.zeros(2, 3, dtype=torch.long),
                             np.asarray([3, 3]))
        # train=False: the ref model is in eval() (batchnorm running
        # stats); the masking path runs regardless of the flag
        jout = jmodel.apply(variables, jnp.asarray(feats),
                            jnp.asarray(feats_lens), train=False,
                            chunk_rng=jax.random.PRNGKey(0),
                            rngs={'dropout': jax.random.PRNGKey(1)})
    assert_losses_match(tout, jout, ('loss', 'th_accuracy'))
    assert_close('features_l2', tout['features_l2'], jout['features_l2'])
    assert_close('num_codes', tout['num_codes'], jout['num_codes'])


@pytest.mark.slow
def test_efficient_conformer_streaming_parity():
    """Our fixed-shape progressive-downsampling streaming (base-
    resolution caches, repeat_interleave re-expansion) vs the
    reference's own forward_chunk_by_chunk (ref efficient_conformer/
    encoder.py:297-530; its shared-attention tensor-cache crash is
    shimmed in refwenet.py so the otherwise-untouched math can run)."""
    from wenet_tpu.models.transformer.streaming import (
        StreamingConfig, forward_chunk_by_chunk)
    cfg = {'input_dim': IDIM, 'output_dim': VOCAB,
           'encoder': 'efficientConformer',
           'encoder_conf': {
               'output_size': 32, 'attention_heads': 2,
               'linear_units': 64, 'num_blocks': 4,
               'cnn_module_kernel': 7, 'causal': True,
               'use_dynamic_chunk': True,
               'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
               'attention_dropout_rate': 0.0,
               'efficient_conf': {'stride_layer_idx': [1],
                                  'stride': [2],
                                  'group_layer_idx': [0, 1],
                                  'group_size': 2}},
           'decoder': 'transformer', 'decoder_conf': dict(DEC_CONF),
           'model': 'asr_model', 'model_conf': dict(MODEL_CONF)}
    tmodel, jmodel, variables = make_pair(cfg, seed=3)
    rng = np.random.RandomState(1)
    T = 128
    feats = rng.randn(1, T, IDIM).astype(np.float32)
    with torch.no_grad():
        ref_ys, _ = tmodel.encoder.forward_chunk_by_chunk(
            torch.tensor(feats), decoding_chunk_size=4,
            num_decoding_left_chunks=2)
    ref_ys = ref_ys.numpy()
    enc = jmodel.encoder
    scfg = StreamingConfig(decoding_chunk_size=4,
                           num_decoding_left_chunks=2,
                           subsampling_rate=enc.subsampling_rate,
                           right_context=enc.right_context)
    ys, _ = forward_chunk_by_chunk(jmodel, variables,
                                   jnp.asarray(feats), scfg)
    ys = np.asarray(ys)
    n = min(ys.shape[1], ref_ys.shape[1])
    assert n >= 14
    np.testing.assert_allclose(ys[:, :n], ref_ys[:, :n], atol=3e-4,
                               rtol=3e-4)


@pytest.mark.slow
@pytest.mark.parametrize('T', [147, 128])
def test_squeezeformer_streaming_parity(T):
    """Fixed-shape U-net streaming (base-resolution caches, window-
    geometry rel_shift emulation for the partially-filled cache AND
    the padded tail chunk) vs the reference's own
    forward_chunk_by_chunk with its dynamically grown cache and
    true-length tail chunk (ref squeezeformer/encoder.py:268-407).
    T=147 keeps every decoding window full; T=128 ends on a partial
    chunk (3 of 4 frames valid)."""
    from wenet_tpu.models.transformer.streaming import (
        StreamingConfig, forward_chunk_by_chunk)
    cfg = {'input_dim': IDIM, 'output_dim': VOCAB,
           'encoder': 'squeezeformer',
           'encoder_conf': {
               'encoder_dim': 32, 'output_size': 32,
               'attention_heads': 2, 'num_blocks': 4, 'reduce_idx': 1,
               'recover_idx': 3, 'feed_forward_expansion_factor': 2,
               'cnn_module_kernel': 7, 'input_dropout_rate': 0.0,
               'feed_forward_dropout_rate': 0.0,
               'attention_dropout_rate': 0.0, 'dropout': 0.0,
               'adaptive_scale': True, 'do_rel_shift': True,
               'causal': True, 'use_dynamic_chunk': True},
           'decoder': 'transformer', 'decoder_conf': dict(DEC_CONF),
           'model': 'asr_model', 'model_conf': dict(MODEL_CONF)}
    tmodel, jmodel, variables = make_pair(cfg, seed=5)
    rng = np.random.RandomState(2)
    feats = rng.randn(1, T, IDIM).astype(np.float32)
    with torch.no_grad():
        ref_ys, _ = tmodel.encoder.forward_chunk_by_chunk(
            torch.tensor(feats), decoding_chunk_size=4,
            num_decoding_left_chunks=2)
    ref_ys = ref_ys.numpy()
    enc = jmodel.encoder
    scfg = StreamingConfig(decoding_chunk_size=4,
                           num_decoding_left_chunks=2,
                           subsampling_rate=enc.subsampling_rate,
                           right_context=enc.right_context)
    ys, _ = forward_chunk_by_chunk(jmodel, variables,
                                   jnp.asarray(feats), scfg)
    ys = np.asarray(ys)
    n = min(ys.shape[1], ref_ys.shape[1])
    assert n >= 30
    np.testing.assert_allclose(ys[:, :n], ref_ys[:, :n], atol=3e-4,
                               rtol=3e-4)


STREAMING_FAMILIES = {
    'branchformer': {
        'encoder': 'branchformer',
        'encoder_conf': {
            'output_size': 32, 'use_attn': True, 'attention_heads': 2,
            'use_cgmlp': True, 'cgmlp_linear_units': 64,
            'cgmlp_conv_kernel': 7, 'gate_activation': 'identity',
            'merge_method': 'concat', 'num_blocks': 2,
            'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
            'attention_dropout_rate': 0.0,
            'causal': True, 'use_dynamic_chunk': True},
    },
    'branchformer_learned_ave': {
        'encoder': 'branchformer',
        'encoder_conf': {
            'output_size': 32, 'use_attn': True, 'attention_heads': 2,
            'use_cgmlp': True, 'cgmlp_linear_units': 64,
            'cgmlp_conv_kernel': 7, 'gate_activation': 'identity',
            'merge_method': 'learned_ave', 'num_blocks': 2,
            'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
            'attention_dropout_rate': 0.0,
            'causal': True, 'use_dynamic_chunk': True},
    },
    'e_branchformer': {
        'encoder': 'e_branchformer',
        'encoder_conf': {
            'output_size': 32, 'attention_heads': 2, 'linear_units': 64,
            'cgmlp_linear_units': 64, 'cgmlp_conv_kernel': 7,
            'gate_activation': 'identity', 'num_blocks': 2,
            'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
            'attention_dropout_rate': 0.0, 'merge_conv_kernel': 3,
            'causal': True, 'use_dynamic_chunk': True},
    },
}


@pytest.mark.slow
@pytest.mark.parametrize('T', [147, 128])
@pytest.mark.parametrize('family', sorted(STREAMING_FAMILIES))
def test_branchformer_streaming_parity(family, T):
    """(E-)Branchformer chunked decode vs the reference's inherited
    BaseEncoder.forward_chunk_by_chunk (ref transformer/encoder.py:
    302-362, branchformer/encoder.py:28, e_branchformer/encoder.py:32)."""
    from wenet_tpu.models.transformer.streaming import (
        StreamingConfig, forward_chunk_by_chunk)
    cfg = {'input_dim': IDIM, 'output_dim': VOCAB,
           'decoder': 'transformer', 'decoder_conf': dict(DEC_CONF),
           'model': 'asr_model', 'model_conf': dict(MODEL_CONF)}
    cfg.update(copy.deepcopy(STREAMING_FAMILIES[family]))
    tmodel, jmodel, variables = make_pair(cfg, seed=7)
    rng = np.random.RandomState(4)
    feats = rng.randn(1, T, IDIM).astype(np.float32)
    with torch.no_grad():
        ref_ys, _ = tmodel.encoder.forward_chunk_by_chunk(
            torch.tensor(feats), decoding_chunk_size=4,
            num_decoding_left_chunks=2)
    ref_ys = ref_ys.numpy()
    enc = jmodel.encoder
    scfg = StreamingConfig(decoding_chunk_size=4,
                           num_decoding_left_chunks=2,
                           subsampling_rate=enc.subsampling_rate,
                           right_context=enc.right_context)
    ys, _ = forward_chunk_by_chunk(jmodel, variables,
                                   jnp.asarray(feats), scfg)
    ys = np.asarray(ys)
    n = min(ys.shape[1], ref_ys.shape[1])
    assert n >= 30
    np.testing.assert_allclose(ys[:, :n], ref_ys[:, :n], atol=3e-4,
                               rtol=3e-4)
