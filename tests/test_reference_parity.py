"""Golden parity against the ACTUAL reference code at /root/reference.

Builds the real `wenet` torch models (via the reference's own
init_model registry), imports their state_dicts through our checkpoint
mapper, and asserts:

  * encoder forward parity          (ref wenet/models/transformer/encoder.py)
  * full joint-loss parity          (ref asr_model.py:82-138)
  * ctc prefix beam hypothesis parity (ref search.py:127-249)
  * attention-rescoring winner parity (ref search.py:374-458)
  * attention beam search parity    (ref search.py:252-371)
  * whisper encoder/loss parity     (ref wenet/models/whisper/whisper.py)

This replaces the test-local torch mirrors (VERDICT.md round-1 item #2):
a transcription bug can no longer pass by being common to both sides.
"""

import copy
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import refwenet

from wenet_tpu.models.transformer import search as our_search
from wenet_tpu.utils.checkpoint import convert_torch_state_dict
from wenet_tpu.utils.init_model import init_model as our_init_model
from wenet_tpu.utils.init_model import init_variables

refwenet.load()

from wenet.models.transformer import search as ref_search  # noqa: E402
from wenet.utils.init_model import init_model as ref_init_model  # noqa: E402

IDIM, D, H, FF, VOCAB = 80, 32, 2, 64, 50

CONFIGS = {
    'input_dim': IDIM,
    'output_dim': VOCAB,
    'encoder': 'conformer',
    'encoder_conf': {
        'output_size': D, 'attention_heads': H, 'linear_units': FF,
        'num_blocks': 2, 'cnn_module_kernel': 7,
        'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
        'attention_dropout_rate': 0.0, 'cnn_module_norm': 'batch_norm',
    },
    'decoder': 'bitransformer',
    'decoder_conf': {
        'attention_heads': H, 'linear_units': FF,
        'num_blocks': 1, 'r_num_blocks': 1,
        'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
        'self_attention_dropout_rate': 0.0,
        'src_attention_dropout_rate': 0.0,
    },
    'model_conf': {
        'ctc_weight': 0.3, 'lsm_weight': 0.1, 'reverse_weight': 0.3,
        'length_normalized_loss': False,
    },
}


@pytest.fixture(scope='module')
def pair():
    """(ref torch model, our model, our variables) with identical weights."""
    torch.manual_seed(11)
    tmodel, _ = ref_init_model(SimpleNamespace(), copy.deepcopy(CONFIGS))
    # randomize batchnorm running stats so the stats transfer is exercised
    for mod in tmodel.modules():
        if isinstance(mod, torch.nn.BatchNorm1d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
    tmodel.eval()

    jmodel, configs = our_init_model(None, copy.deepcopy(CONFIGS))
    variables, _ = init_variables(jmodel, configs)
    variables = convert_torch_state_dict(tmodel.state_dict(), variables,
                                         strict=True)
    return tmodel, jmodel, variables


@pytest.fixture(scope='module')
def batch():
    rng = np.random.RandomState(3)
    B, T, U = 2, 64, 7
    feats = rng.randn(B, T, IDIM).astype(np.float32)
    feats_lens = np.asarray([T, T - 13], np.int32)
    target = rng.randint(1, VOCAB - 2, size=(B, U)).astype(np.int32)
    target[1, U - 2:] = -1  # IGNORE_ID ragged tail
    target_lens = np.asarray([U, U - 2], np.int32)
    return feats, feats_lens, target, target_lens


def _ref_encode(tmodel, feats, feats_lens):
    with torch.no_grad():
        out, mask = tmodel.encoder(torch.tensor(feats),
                                   torch.tensor(feats_lens))
    return out, mask


def test_encoder_forward_parity(pair, batch):
    tmodel, jmodel, variables = pair
    feats, feats_lens, _, _ = batch
    tout, tmask = _ref_encode(tmodel, feats, feats_lens)
    tout, tmask = tout.numpy(), tmask.numpy()

    jout, jmask = jmodel.apply(variables, jnp.asarray(feats),
                               jnp.asarray(feats_lens),
                               method=jmodel.forward_encoder)
    jout, jmask = np.asarray(jout), np.asarray(jmask)

    np.testing.assert_array_equal(jmask, tmask)
    for b in range(feats.shape[0]):
        n = int(tmask[b, 0].sum())
        np.testing.assert_allclose(jout[b, :n], tout[b, :n],
                                   atol=2e-4, rtol=2e-4)


def test_joint_loss_parity(pair, batch):
    tmodel, jmodel, variables = pair
    feats, feats_lens, target, target_lens = batch
    tbatch = {
        'feats': torch.tensor(feats),
        'feats_lengths': torch.tensor(feats_lens),
        'target': torch.tensor(target, dtype=torch.long),
        'target_lengths': torch.tensor(target_lens, dtype=torch.long),
        'langs': ['zh'] * feats.shape[0],
        'tasks': ['transcribe'] * feats.shape[0],
    }
    with torch.no_grad():
        tout = tmodel(tbatch, torch.device('cpu'))

    jout = jmodel.apply(variables, jnp.asarray(feats),
                        jnp.asarray(feats_lens), jnp.asarray(target),
                        jnp.asarray(target_lens))
    for key in ('loss', 'loss_att', 'loss_ctc', 'th_accuracy'):
        ref_val = float(tout[key])
        our_val = float(jout[key])
        assert abs(ref_val - our_val) < 2e-3 * max(1.0, abs(ref_val)), (
            key, ref_val, our_val)


@pytest.fixture(scope='module')
def ctc_decode_inputs(pair, batch):
    """Shared encoder outputs + ctc log-probs computed by the reference."""
    tmodel, _, _ = pair
    feats, feats_lens, _, _ = batch
    enc_out, enc_mask = _ref_encode(tmodel, feats, feats_lens)
    enc_lens = enc_mask.squeeze(1).sum(1)
    with torch.no_grad():
        ctc_probs = tmodel.ctc.log_softmax(enc_out)
    return enc_out, enc_mask, enc_lens, ctc_probs


def test_ctc_prefix_beam_hypothesis_parity(ctc_decode_inputs):
    _, _, enc_lens, ctc_probs = ctc_decode_inputs
    beam = 5
    ref_results = ref_search.ctc_prefix_beam_search(ctc_probs, enc_lens,
                                                    beam)
    our_results = our_search.ctc_prefix_beam_search(
        jnp.asarray(ctc_probs.numpy()), jnp.asarray(enc_lens.numpy()),
        beam)
    for rr, ours in zip(ref_results, our_results):
        assert list(rr.tokens) == list(ours.tokens)
        assert abs(rr.score - ours.score) < 1e-3
        # nbest must agree as (prefix -> score) maps
        ref_map = {tuple(t): s for t, s in zip(rr.nbest, rr.nbest_scores)}
        our_map = {tuple(t): s
                   for t, s in zip(ours.nbest, ours.nbest_scores)}
        common = set(ref_map) & set(our_map)
        assert tuple(rr.tokens) in common
        assert len(common) >= min(len(ref_map), len(our_map)) - 1
        for pfx in common:
            assert abs(ref_map[pfx] - our_map[pfx]) < 1e-3, pfx
        # viterbi frame times of the winner
        assert list(rr.times) == list(ours.times)


def test_attention_rescoring_winner_parity(pair, ctc_decode_inputs):
    tmodel, jmodel, variables = pair
    enc_out, _, enc_lens, ctc_probs = ctc_decode_inputs
    beam = 5
    ref_prefix = ref_search.ctc_prefix_beam_search(ctc_probs, enc_lens,
                                                   beam)
    ref_res = ref_search.attention_rescoring(
        tmodel, ref_prefix, enc_out, enc_lens,
        ctc_weight=0.3, reverse_weight=0.3)

    # feed our rescorer the identical nbest so the comparison isolates
    # the decoder-scoring + fusion math
    our_prefix = [
        our_search.DecodeResult(tokens=list(r.tokens), score=r.score,
                                times=list(r.times),
                                nbest=[list(t) for t in r.nbest],
                                nbest_scores=list(r.nbest_scores),
                                nbest_times=[list(t) for t in
                                             r.nbest_times])
        for r in ref_prefix
    ]
    our_res = our_search.attention_rescoring(
        jmodel, variables, our_prefix, jnp.asarray(enc_out.numpy()),
        jnp.asarray(enc_lens.numpy()), ctc_weight=0.3, reverse_weight=0.3)
    for rr, ours in zip(ref_res, our_res):
        assert list(rr.tokens) == list(ours.tokens)
        assert abs(rr.score - ours.score) < 2e-3
        assert abs(rr.confidence - ours.confidence) < 1e-3


def test_attention_beam_search_parity(pair, ctc_decode_inputs):
    tmodel, jmodel, variables = pair
    enc_out, enc_mask, _, _ = ctc_decode_inputs
    ref_res = ref_search.attention_beam_search(tmodel, enc_out, enc_mask,
                                               beam_size=4)
    our_res = our_search.attention_beam_search(
        jmodel, variables, jnp.asarray(enc_out.numpy()),
        jnp.asarray(enc_mask.numpy()), beam_size=4)
    for rr, ours in zip(ref_res, our_res):
        assert list(rr.tokens) == list(ours.tokens)


# ---------------------------------------------------------------------------
# whisper vs the real reference Whisper class
# ---------------------------------------------------------------------------
WVOCAB = 60
WSPECIAL = {
    'sot': 50, 'eot': 51, 'sot_prev': 52, 'transcribe': 53,
    'translate': 54, 'no_timestamps': 55, 'no_speech': 56,
    'timestamp_begin': 57,
}
WCONFIGS = {
    'input_dim': IDIM,
    'output_dim': WVOCAB,
    'model': 'whisper',
    'encoder': 'transformer',
    'encoder_conf': {
        'output_size': D, 'attention_heads': H, 'linear_units': FF,
        'num_blocks': 2, 'dropout_rate': 0.0,
        'positional_dropout_rate': 0.0, 'attention_dropout_rate': 0.0,
        'input_layer': 'conv1d2', 'pos_enc_layer_type': 'abs_pos_whisper',
        'static_chunk_size': -1, 'key_bias': False,
        'activation_type': 'gelu',
    },
    'decoder': 'transformer',
    'decoder_conf': {
        'attention_heads': H, 'linear_units': FF, 'num_blocks': 1,
        'dropout_rate': 0.0, 'positional_dropout_rate': 0.0,
        'self_attention_dropout_rate': 0.0,
        'src_attention_dropout_rate': 0.0,
        'input_layer': 'embed_learnable_pe', 'use_output_layer': True,
        'normalize_before': True, 'src_attention': True,
        'key_bias': False, 'src_key_bias': False,
        'activation_type': 'gelu', 'tie_word_embedding': True,
    },
    'tokenizer': 'whisper',
    'tokenizer_conf': {'special_tokens': dict(WSPECIAL)},
    'model_conf': {'ctc_weight': 0.0, 'lsm_weight': 0.1,
                   'length_normalized_loss': False},
}


@pytest.fixture(scope='module')
def whisper_pair():
    torch.manual_seed(23)
    tmodel, _ = ref_init_model(SimpleNamespace(), copy.deepcopy(WCONFIGS))
    # the reference ties output_layer.weight to the embedding but keeps a
    # separate bias that real converted checkpoints leave at zero
    # (the OpenAI layout has no logits bias); zero it so both sides
    # compute logits = x @ embedding.T
    with torch.no_grad():
        tmodel.decoder.output_layer.bias.zero_()
        # ref LearnablePositionalEncoding allocates torch.empty (garbage,
        # sometimes NaN) — real checkpoints overwrite it; we must too
        tmodel.decoder.embed[1].pe.normal_(0, 0.1)
    tmodel.eval()
    sd = {k: v for k, v in tmodel.state_dict().items()
          if k != 'decoder.output_layer.weight'}
    jmodel, configs = our_init_model(None, copy.deepcopy(WCONFIGS))
    variables, _ = init_variables(jmodel, configs)
    variables = convert_torch_state_dict(sd, variables, strict=True)
    return tmodel, jmodel, variables


def test_whisper_loss_parity(whisper_pair):
    from wenet_tpu.models.whisper.whisper import (lang_id_array,
                                                  task_id_array)
    tmodel, jmodel, variables = whisper_pair
    rng = np.random.RandomState(5)
    B, T, U = 2, 32, 6
    feats = rng.randn(B, T, IDIM).astype(np.float32)
    feats_lens = np.asarray([T, T - 8], np.int32)
    target = rng.randint(0, WVOCAB - 12, size=(B, U)).astype(np.int32)
    target[1, U - 2:] = -1
    target_lens = np.asarray([U, U - 2], np.int32)

    tbatch = {
        'feats': torch.tensor(feats),
        'feats_lengths': torch.tensor(feats_lens),
        'target': torch.tensor(target, dtype=torch.long),
        'target_lengths': torch.tensor(target_lens, dtype=torch.long),
        'langs': ['zh', 'en'],
        'tasks': ['transcribe', 'transcribe'],
    }
    with torch.no_grad():
        tout = tmodel(tbatch, torch.device('cpu'))

    jout = jmodel.apply(
        variables, jnp.asarray(feats), jnp.asarray(feats_lens),
        jnp.asarray(target), jnp.asarray(target_lens),
        lang_ids=jnp.asarray(lang_id_array(['zh', 'en'])),
        task_ids=jnp.asarray(task_id_array(['transcribe', 'transcribe'])))
    for key in ('loss', 'loss_att', 'th_accuracy'):
        ref_val = float(tout[key])
        our_val = float(jout[key])
        assert abs(ref_val - our_val) < 2e-3 * max(1.0, abs(ref_val)), (
            key, ref_val, our_val)


def test_whisper_encoder_parity(whisper_pair):
    tmodel, jmodel, variables = whisper_pair
    rng = np.random.RandomState(6)
    B, T = 2, 32
    feats = rng.randn(B, T, IDIM).astype(np.float32)
    feats_lens = np.asarray([T, T], np.int32)
    tout, tmask = _ref_encode(tmodel, feats, feats_lens)
    jout, _ = jmodel.apply(variables, jnp.asarray(feats),
                           jnp.asarray(feats_lens),
                           method=jmodel.forward_encoder)
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(),
                               atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# streaming chunk-by-chunk vs the real reference encoder
# ---------------------------------------------------------------------------
@pytest.fixture(scope='module')
def causal_pair():
    """Causal-conv dynamic-chunk conformer (the streaming flagship)."""
    cfgs = copy.deepcopy(CONFIGS)
    cfgs['encoder_conf'].update(causal=True, use_dynamic_chunk=True,
                                cnn_module_norm='layer_norm')
    torch.manual_seed(31)
    tmodel, _ = ref_init_model(SimpleNamespace(), copy.deepcopy(cfgs))
    tmodel.eval()
    jmodel, jcfgs = our_init_model(None, copy.deepcopy(cfgs))
    variables, _ = init_variables(jmodel, jcfgs)
    variables = convert_torch_state_dict(tmodel.state_dict(), variables,
                                         strict=True)
    return tmodel, jmodel, variables


@pytest.mark.slow
def test_streaming_chunk_by_chunk_parity(causal_pair):
    """Our fixed-shape ring-cache streaming must produce the SAME
    frames as the reference's growing-cache forward_chunk_by_chunk
    (ref encoder.py:302-362) — cross-implementation, not just
    stream==full self-consistency."""
    from wenet_tpu.models.transformer.streaming import (
        StreamingConfig, forward_chunk_by_chunk)
    tmodel, jmodel, variables = causal_pair
    rng = np.random.RandomState(9)
    T = 64
    feats = rng.randn(1, T, IDIM).astype(np.float32)
    with torch.no_grad():
        ref_ys, _ = tmodel.encoder.forward_chunk_by_chunk(
            torch.tensor(feats), decoding_chunk_size=4,
            num_decoding_left_chunks=2)
    ref_ys = ref_ys.numpy()

    enc = jmodel.encoder
    cfg = StreamingConfig(decoding_chunk_size=4,
                          num_decoding_left_chunks=2,
                          subsampling_rate=enc.subsampling_rate,
                          right_context=enc.right_context)
    ys, _ = forward_chunk_by_chunk(jmodel, variables,
                                   jnp.asarray(feats), cfg)
    ys = np.asarray(ys)
    n = min(ys.shape[1], ref_ys.shape[1])
    assert n > 0
    np.testing.assert_allclose(ys[:, :n], ref_ys[:, :n], atol=3e-4,
                               rtol=3e-4)


# ---------------------------------------------------------------------------
# LR schedule numeric parity vs the real reference schedulers
# ---------------------------------------------------------------------------
def test_scheduler_parity():
    """Our functional schedules must match the reference
    torch.optim schedulers step-for-step (ref wenet/utils/scheduler.py:
    WarmupLR:26, NoamHoldAnnealing:629, CosineAnnealing:502)."""
    from wenet.utils.scheduler import (CosineAnnealing,
                                       NoamHoldAnnealing, WarmupLR)

    from wenet_tpu.utils.scheduler import build_schedule

    probe = [0, 1, 10, 999, 1000, 1001, 5000, 20000, 24999]

    def ref_lrs(sched_cls, opt_lr, steps, **kw):
        opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))],
                               lr=opt_lr)
        sch = sched_cls(opt, **kw)
        out = {}
        for step in range(max(steps) + 1):
            if step in steps:
                out[step] = opt.param_groups[0]['lr']
            opt.step()
            sch.step()
        return out

    # WarmupLR (the default recipe scheduler)
    ref = ref_lrs(WarmupLR, 0.002, probe, warmup_steps=1000)
    ours = build_schedule('warmuplr', {'warmup_steps': 1000}, lr=0.002)
    for step, want in ref.items():
        got = float(ours(step))
        assert abs(got - want) < 1e-9 * max(1.0, abs(want)) + 1e-12, (
            'warmuplr', step, got, want)

    # NoamHoldAnnealing (whisper finetune recipes)
    ref = ref_lrs(NoamHoldAnnealing, 0.001, probe, warmup_steps=500,
                  hold_steps=1500, max_steps=25000, decay_rate=1.0,
                  min_lr=1e-5)
    ours = build_schedule('NoamHoldAnnealing',
                          {'warmup_steps': 500, 'hold_steps': 1500,
                           'max_steps': 25000, 'decay_rate': 1.0,
                           'min_lr': 1e-5}, lr=0.001)
    for step, want in ref.items():
        got = float(ours(step))
        assert abs(got - want) < 1e-6 * max(1.0, abs(want)) + 1e-10, (
            'noamhold', step, got, want)

    # CosineAnnealing
    ref = ref_lrs(CosineAnnealing, 0.001, probe, warmup_steps=500,
                  max_steps=25000, min_lr=1e-6)
    ours = build_schedule('cosine_annealing',
                          {'warmup_steps': 500, 'max_steps': 25000,
                           'min_lr': 1e-6}, lr=0.001)
    for step, want in ref.items():
        got = float(ours(step))
        assert abs(got - want) < 1e-6 * max(1.0, abs(want)) + 1e-10, (
            'cosine', step, got, want)

    # SquareRootConstantPolicy (ref scheduler.py:142-202)
    from wenet.utils.scheduler import (SquareRootConstantPolicy,
                                       WarmupHoldPolicy)
    ref = ref_lrs(SquareRootConstantPolicy, 0.001, probe,
                  constant_steps=1000, max_steps=25000, min_lr=1e-5)
    ours = build_schedule('sqrt_constant',
                          {'constant_steps': 1000, 'max_steps': 25000,
                           'min_lr': 1e-5}, lr=0.001)
    for step, want in ref.items():
        got = float(ours(step))
        assert abs(got - want) < 1e-6 * max(1.0, abs(want)) + 1e-10, (
            'sqrt_constant', step, got, want)

    # plain WarmupHoldPolicy (ref scheduler.py:203-284)
    ref = ref_lrs(WarmupHoldPolicy, 0.001, probe, warmup_steps=500,
                  hold_steps=1500, max_steps=25000, min_lr=1e-5)
    ours = build_schedule('warmup_hold',
                          {'warmup_steps': 500, 'hold_steps': 1500,
                           'max_steps': 25000, 'min_lr': 1e-5},
                          lr=0.001)
    for step, want in ref.items():
        got = float(ours(step))
        assert abs(got - want) < 1e-6 * max(1.0, abs(want)) + 1e-10, (
            'warmup_hold', step, got, want)


def test_scheduler_set_step_resume_parity():
    """Resume: the reference restores the scheduler with
    `scheduler.set_step(step)` (train_utils.py:563-565) and continues;
    our functional schedules are pure step->lr so resume == evaluating
    at the restored step.  Verify against the reference's post-resume
    trajectory for every schedule in the sweep."""
    from wenet.utils.scheduler import WarmupLR

    from wenet_tpu.utils.scheduler import build_schedule

    resume_step = 700
    opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))],
                           lr=0.002)
    sch = WarmupLR(opt, warmup_steps=1000)
    sch.set_step(resume_step)
    ref_traj = []
    for _ in range(5):
        opt.step()
        sch.step()
        ref_traj.append(opt.param_groups[0]['lr'])
    # (the reference's FIRST post-resume update runs on the stale
    # construction-time lr — set_step only sets last_epoch and the
    # param_group lr refreshes at the next scheduler.step(); we compare
    # the on-trajectory values from the first step() on)
    ours = build_schedule('warmuplr', {'warmup_steps': 1000}, lr=0.002)
    for i, want in enumerate(ref_traj):
        got = float(ours(resume_step + 1 + i))
        assert abs(got - want) < 1e-9 + 1e-6 * abs(want), (
            i, got, want)
