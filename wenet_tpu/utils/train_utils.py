"""Training layer: optimizer, train/cv steps, mesh placement.

TPU-native rebuild of ref wenet/utils/train_utils.py:410-931.  The
DDP/FSDP/DeepSpeed engine selection collapses into one pjit-compiled
train step over a Mesh: batch sharded on 'data', params replicated (or
GSPMD-sharded), gradient all-reduce inserted by XLA.  Gradient
accumulation is optax.MultiSteps (replaces no_sync bookkeeping,
ref executor.py:71-81); AMP scalers disappear (bf16 needs none).
"""

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from wenet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                     replicated, shard_batch)
from wenet_tpu.utils.scheduler import build_schedule


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any
    extra_vars: Dict[str, Any]  # cmvn etc. (frozen)

    def variables(self):
        v = {'params': self.params, **self.extra_vars}
        if self.batch_stats is not None:
            v['batch_stats'] = self.batch_stats
        return v


def init_optimizer_and_scheduler(configs
                                 ) -> Tuple[optax.GradientTransformation,
                                            Callable]:
    """From train.yaml optim/optim_conf/scheduler/scheduler_conf.

    ref: train_utils.py:491-565."""
    optim_conf = dict(configs.get('optim_conf', {'lr': 0.001}))
    lr = optim_conf.get('lr', 0.001)
    schedule = build_schedule(configs.get('scheduler', 'warmuplr'),
                              configs.get('scheduler_conf', {}), lr)
    optim = configs.get('optim', 'adam')
    wd = optim_conf.get('weight_decay', 0.0)
    betas = optim_conf.get('betas', (0.9, 0.999))
    eps = optim_conf.get('eps', 1e-8)
    if optim == 'adam':
        # torch.optim.Adam folds weight decay into the GRADIENT before
        # the moment updates (L2, not decoupled AdamW) — so the decay
        # term must precede scale_by_adam
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.scale_by_learning_rate(schedule),
        )
    elif optim == 'adamw':
        tx = optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps,
                         weight_decay=wd)
    elif optim == 'sgd':
        tx = optax.sgd(schedule, momentum=optim_conf.get('momentum', 0.9))
    else:
        raise ValueError(f'unknown optim: {optim}')
    clip = configs.get('grad_clip', 0.0)
    if clip and clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    accum = configs.get('accum_grad', 1)
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule


def restore_optimizer_step(state: TrainState, step: int,
                           accum_grad: int = 1) -> TrainState:
    """Resume analog of the reference's scheduler.set_step (ref
    train_utils.py:563-565): fast-forward every optax schedule counter
    inside opt_state so the APPLIED learning rate resumes mid-schedule
    instead of re-running warmup, and restore state.step (metrics/
    logging).  `step` is in state.step units (micro-steps); inner
    schedule counters advance once per optimizer update, i.e. per
    `accum_grad` micro-steps."""
    macro = step // max(1, accum_grad)

    def fix(node):
        if isinstance(node, optax.ScaleByScheduleState):
            return node._replace(count=jnp.asarray(macro, jnp.int32))
        if isinstance(node, optax.MultiStepsState):
            return node._replace(
                mini_step=jnp.asarray(0, jnp.int32),
                gradient_step=jnp.asarray(macro, jnp.int32),
                inner_opt_state=fix(node.inner_opt_state))
        if isinstance(node, tuple) and hasattr(node, '_fields'):
            return type(node)(*[fix(x) for x in node])
        if isinstance(node, (tuple, list)):
            return type(node)(fix(x) for x in node)
        return node

    return state.replace(step=jnp.asarray(step, jnp.int32),
                         opt_state=fix(state.opt_state))


def create_train_state(variables, tx) -> TrainState:
    params = variables['params']
    batch_stats = variables.get('batch_stats', None)
    extra = {k: v for k, v in variables.items()
             if k not in ('params', 'batch_stats')}
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), batch_stats=batch_stats,
                      extra_vars=extra)


def make_train_step(model, tx, schedule=None, compute_dtype=None,
                    frontend_conf=None, accum_grad=1):
    """Build the pure train step: (state, batch, rng) -> (state, metrics).

    batch: dict(feats, feats_lengths, target, target_lengths).
    ref: train_utils.py:669-794 (batch_forward/backward/update).

    compute_dtype: jnp.bfloat16 for mixed precision — params/grads/adam
    state stay fp32, the forward/backward matmuls run bf16 (the TPU
    analog of the reference's autocast, train_utils.py:669-702); losses
    are already accumulated in fp32 internally.

    frontend_conf: when set, batches carry raw waveform as feats
    (B, S, 1) (dataset on_device_frontend mode) and the front end —
    kaldi fbank + SpecAugment/SpecSub — runs INSIDE this jitted step
    (ops/fbank.py + ops/spec_augment.py), fully fused with the model.
    Keys: num_mel_bins, frame_length, frame_shift, dither, sample_rate,
    spec_aug(+conf), spec_sub(+conf)."""

    def _cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, 'dtype') and jnp.issubdtype(
                x.dtype, jnp.floating) else x, tree)

    def _frontend(batch, rng):
        from wenet_tpu.ops.fbank import compute_fbank
        from wenet_tpu.ops.spec_augment import spec_aug, spec_sub
        fc = frontend_conf
        wav = batch['feats'][..., 0]  # (B, S)
        sr = fc.get('sample_rate', 16000)
        r_dither, r_aug, r_sub = jax.random.split(rng, 3)
        feats = compute_fbank(
            wav * (1 << 15),
            num_mel_bins=fc.get('num_mel_bins', 80),
            frame_length_ms=fc.get('frame_length', 25),
            frame_shift_ms=fc.get('frame_shift', 10),
            sample_rate=sr, dither=fc.get('dither', 0.0),
            rng=r_dither if fc.get('dither', 0.0) else None)
        shift = sr * fc.get('frame_shift', 10) // 1000
        flen = sr * fc.get('frame_length', 25) // 1000
        feats_lengths = jnp.maximum(
            (batch['feats_lengths'] - flen) // shift + 1, 0)
        if fc.get('spec_aug', True):
            feats = spec_aug(r_aug, feats,
                             **fc.get('spec_aug_conf', {}))
        if fc.get('spec_sub', False):
            feats = spec_sub(r_sub, feats,
                             **fc.get('spec_sub_conf', {}))
        return dict(batch, feats=feats, feats_lengths=feats_lengths)

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        dropout_rng, chunk_rng = jax.random.split(rng)
        if frontend_conf is not None:
            fe_rng = jax.random.fold_in(rng, 7)
            batch = _frontend(batch, fe_rng)
        batch = dict(batch, feats=_cast(batch['feats']))

        def loss_fn(params):
            params = _cast(params)
            variables = {'params': params, **state.extra_vars}
            mutable = []
            if state.batch_stats is not None:
                variables['batch_stats'] = state.batch_stats
                mutable = ['batch_stats']
            if mutable:
                out, new_vars = model.apply(
                    variables, batch['feats'], batch['feats_lengths'],
                    batch['target'], batch['target_lengths'], train=True,
                    chunk_rng=chunk_rng, rngs={'dropout': dropout_rng},
                    mutable=mutable)
                new_bs = new_vars.get('batch_stats', state.batch_stats)
            else:
                out = model.apply(
                    variables, batch['feats'], batch['feats_lengths'],
                    batch['target'], batch['target_lengths'], train=True,
                    chunk_rng=chunk_rng, rngs={'dropout': dropout_rng})
                new_bs = state.batch_stats
            return out['loss'], (out, new_bs)

        grads, (out, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        if compute_dtype is not None:  # keep optimizer math fp32
            grads = jax.tree_util.tree_map(
                lambda g, p: g.astype(p.dtype), grads, state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            'loss': out['loss'],
            'loss_att': out.get('loss_att'),
            'loss_ctc': out.get('loss_ctc'),
            'th_accuracy': out.get('th_accuracy'),
            'grad_norm': optax.global_norm(grads),
        }
        if schedule is not None:
            # with MultiSteps, state.step counts micro-steps while the
            # inner schedule advances once per accum_grad of them
            metrics['lr'] = schedule(state.step // max(accum_grad, 1))
        metrics = {k: v for k, v in metrics.items() if v is not None}
        new_state = state.replace(step=state.step + 1,
                                  params=new_params,
                                  opt_state=new_opt_state,
                                  batch_stats=new_bs)
        return new_state, metrics

    return step_fn


def make_cv_step(model):
    """ref: executor.py:120-161."""

    def step_fn(state: TrainState, batch):
        out = model.apply(state.variables(), batch['feats'],
                          batch['feats_lengths'], batch['target'],
                          batch['target_lengths'], train=False)
        num_utts = batch['target_lengths'].shape[0]
        return {k: v for k, v in out.items() if v is not None}, num_utts

    return step_fn


def compile_train_step(model, tx, mesh, schedule=None,
                       donate: bool = True, compute_dtype=None,
                       state_sharding=None, frontend_conf=None,
                       accum_grad=1):
    """jit the train step with data-sharded batch; state replicated by
    default or laid out per `state_sharding` (tp / expert-parallel /
    zero2 — see parallel/mesh.py state_shardings)."""
    step_fn = make_train_step(model, tx, schedule,
                              compute_dtype=compute_dtype,
                              frontend_conf=frontend_conf,
                              accum_grad=accum_grad)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    st = state_sharding if state_sharding is not None else rep
    return jax.jit(
        step_fn,
        in_shardings=(st, bsh, rep),
        out_shardings=(st, rep),
        donate_argnums=(0,) if donate else (),
    )


def wenet_join(has_data: bool) -> bool:
    """Multi-host uneven-data guard (analog of the reference's
    `wenet_join` monitored_barrier on a gloo side-group,
    ref wenet/utils/train_utils.py:640-666).

    Each host reports whether its data iterator produced another batch;
    the all-gather consensus makes EVERY host break the epoch at the
    same step as soon as any host is exhausted — otherwise a multi-host
    pjit program would be entered by a subset of hosts and deadlock.

    Returns True when the epoch must stop (some host ran out).
    """
    if jax.process_count() == 1:
        return not has_data
    from jax.experimental import multihost_utils
    import numpy as np
    flags = multihost_utils.process_allgather(
        jnp.asarray([1 if has_data else 0], jnp.int32))
    return bool(np.min(np.asarray(flags)) == 0)
