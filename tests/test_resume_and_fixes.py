"""Regression tests for training-fidelity review fixes: kaldi cmvn
text parsing, schedule restore on resume, filter_modules verbatim
prefixes, noam_annealing warmup clamp semantics, adam L2 ordering."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest


def test_load_kaldi_text_cmvn(tmp_path):
    """The real kaldi text format has NO ';' separators."""
    from wenet_tpu.utils.cmvn import load_cmvn
    d = 4
    means = np.arange(1, d + 1, dtype=np.float64) * 100
    var = np.arange(1, d + 1, dtype=np.float64)**2 * 1000
    count = 50.0
    txt = '[ ' + ' '.join(str(x) for x in means) + f' {count}\n ' + \
        ' '.join(str(x) for x in var) + ' 0 ]'
    p = tmp_path / 'cmvn.txt'
    p.write_text(txt)
    mean, istd = load_cmvn(str(p), is_json=False)
    np.testing.assert_allclose(mean, means / count, rtol=1e-6)
    want_var = var / count - (means / count)**2
    np.testing.assert_allclose(istd, 1 / np.sqrt(want_var), rtol=1e-5)


def test_restore_optimizer_step_restores_applied_lr():
    """Resume must restore the APPLIED lr (optax internal schedule
    counter), not just state.step — ref scheduler.set_step."""
    from wenet_tpu.utils.scheduler import warmup_lr
    from wenet_tpu.utils.train_utils import (TrainState,
                                             create_train_state,
                                             restore_optimizer_step)
    schedule = warmup_lr(1e-3, warmup_steps=100)
    tx = optax.chain(optax.scale_by_adam(),
                     optax.scale_by_learning_rate(schedule))
    params = {'w': jnp.ones((3,))}
    grads = {'w': jnp.ones((3,))}

    # run 10 real steps
    ref = create_train_state({'params': params}, tx)
    opt_state = ref.opt_state
    p = params
    for _ in range(10):
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)

    # fresh state fast-forwarded to step 10
    resumed = restore_optimizer_step(
        create_train_state({'params': params}, tx), 10)
    assert int(resumed.step) == 10
    up_ref, _ = tx.update(grads, opt_state, p)
    up_res, _ = tx.update(grads, resumed.opt_state, params)
    # the schedule factor at step 10 is ~100x the step-0 factor; the
    # resumed update magnitude must match the real-run one (both use
    # schedule(10)), not a from-scratch warmup restart.
    # adam moments differ (fresh on resume, like the reference) so
    # compare the LR factor via the update/rms ratio instead: both
    # updates must be ~lr(10)-scaled, i.e. same order of magnitude.
    r = np.abs(np.asarray(up_res['w'])).mean() / \
        np.abs(np.asarray(up_ref['w'])).mean()
    assert 0.2 < r < 5.0, f'applied lr not restored (ratio {r})'

    # and with accum: inner counters advance once per accum micro-steps
    tx2 = optax.MultiSteps(tx, every_k_schedule=4)
    resumed2 = restore_optimizer_step(
        create_train_state({'params': params}, tx2), 40, accum_grad=4)
    ms = resumed2.opt_state
    assert int(ms.gradient_step) == 10
    assert int(ms.mini_step) == 0


def test_filter_modules_verbatim_prefixes():
    from wenet_tpu.utils.checkpoint import filter_modules
    keys = ['encoder.layer0.w', 'decoder.layer0.w', 'ctc.out.w']
    assert filter_modules(keys, ['decoder.']) == ['decoder.layer0.w']
    assert filter_modules(keys, ['ctc.']) == ['ctc.out.w']
    assert filter_modules(keys, ['encoder.']) == ['encoder.layer0.w']
    assert filter_modules(keys, ['nope.']) == []


def test_noam_annealing_min_lr_only_after_warmup():
    from wenet_tpu.utils.scheduler import noam_annealing
    sch = noam_annealing(1e-3, d_model=256, warmup_steps=1000,
                        min_lr=5e-4)
    # during warmup the raw (un-clamped) value applies
    early = float(sch(0))
    assert early < 5e-4
    # after warmup the clamp holds
    late = float(sch(10**9))
    assert late == pytest.approx(5e-4)
    # warmup_steps=0 must not divide by zero
    sch0 = noam_annealing(1e-3, d_model=256, warmup_steps=0)
    assert np.isfinite(float(sch0(0)))


def test_adam_weight_decay_is_l2_into_gradient():
    """optim 'adam' + weight_decay must match torch Adam (L2 folded
    into the gradient BEFORE the moment updates)."""
    import torch
    from wenet_tpu.utils.train_utils import init_optimizer_and_scheduler
    configs = {'optim': 'adam',
               'optim_conf': {'lr': 1e-2, 'weight_decay': 0.1},
               'scheduler': 'constantlr', 'scheduler_conf': {}}
    tx, _ = init_optimizer_and_scheduler(configs)
    w0 = np.asarray([1.0, -2.0, 0.5], np.float32)
    g = np.asarray([0.3, 0.1, -0.2], np.float32)

    params = {'w': jnp.asarray(w0)}
    opt_state = tx.init(params)
    p = params
    for _ in range(5):
        updates, opt_state = tx.update({'w': jnp.asarray(g)},
                                       opt_state, p)
        p = optax.apply_updates(p, updates)

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([tw], lr=1e-2, weight_decay=0.1)
    for _ in range(5):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()
    np.testing.assert_allclose(np.asarray(p['w']),
                               tw.detach().numpy(), atol=1e-5)
