"""LR schedules as pure step->lr functions (optax-compatible).

ref: wenet/utils/scheduler.py:26-722 (torch _LRScheduler classes).
`set_step` resume semantics come for free: schedules are stateless
functions of the global step carried in the train state.
"""

import math
from typing import Callable, Optional

import jax.numpy as jnp


def warmup_lr(lr: float, warmup_steps: float = 25000) -> Callable:
    """ref: scheduler.py:26-76 (Noam-style warmup)."""

    def schedule(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        if warmup_steps == 0:
            return lr * s**-0.5
        return lr * warmup_steps**0.5 * jnp.minimum(
            s**-0.5, s * warmup_steps**-1.5)

    return schedule


def noam_annealing(lr: float, d_model: int, warmup_steps: int,
                   min_lr: float = 0.0) -> Callable:
    """ref: scheduler.py:563-627."""

    def schedule(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        if warmup_steps and warmup_steps > 0:
            mult = d_model**-0.5 * jnp.minimum(
                s**-0.5, s * warmup_steps**-1.5)
        else:
            mult = d_model**-0.5 * s**-0.5
        out = lr * mult
        # ref NoamAnnealing clamps to min_lr only AFTER warmup
        # (scheduler.py:619-627)
        return jnp.where(s > warmup_steps,
                         jnp.maximum(out, min_lr), out)

    return schedule


def noam_hold_annealing(lr: float, warmup_steps: int, hold_steps: int,
                        max_steps: int = 0, decay_rate: float = 0.5,
                        min_lr: float = 0.0) -> Callable:
    """ref: scheduler.py:629-722 — exact WarmupHoldPolicy semantics
    (get_lr :262-284 + _noam_hold_annealing :438-447): warmup is
    (step+1)/(warmup+1); the hold REGION spans warmup..warmup+hold but
    the decay divisor is (step - hold)**decay_rate (NoamHoldAnnealing
    subtracts warmup back before calling the formula, :705-710); past
    max_steps the lr pins to min_lr."""
    hold_total = hold_steps + warmup_steps

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * (s + 1.0) / (warmup_steps + 1.0)
        t_warm = max(1.0, warmup_steps**decay_rate)
        t_decay = jnp.maximum(
            1.0, jnp.maximum(s - hold_steps, 0.0)**decay_rate)
        anneal = jnp.maximum(lr * t_warm / t_decay, min_lr)
        if max_steps > 0:
            anneal = jnp.where(s > max_steps, min_lr, anneal)
        out = jnp.where((s <= warmup_steps) & (warmup_steps > 0), warm,
                        jnp.where(s < hold_total, lr, anneal))
        return out

    return schedule


def cosine_annealing(lr: float, max_steps: int, warmup_steps: int = 0,
                     min_lr: float = 0.0) -> Callable:
    """ref: scheduler.py:502-560 (_cosine_annealing :396-399)."""

    def schedule(step):
        # exact WarmupPolicy semantics (ref scheduler.py:115-135 +
        # _cosine_annealing :396-399)
        s = jnp.asarray(step, jnp.float32)
        warm = lr * (s + 1.0) / (warmup_steps + 1.0)
        frac = jnp.clip((s - warmup_steps) /
                        max(max_steps - warmup_steps, 1), 0.0, 1.0)
        mult = 0.5 * (1 + jnp.cos(math.pi * frac))
        ann = (lr - min_lr) * mult + min_lr
        ann = jnp.where(s > max_steps, min_lr, ann)
        return jnp.where((s <= warmup_steps) & (warmup_steps > 0),
                         warm, ann)

    return schedule


def constant_lr(lr: float) -> Callable:
    return lambda step: jnp.asarray(lr, jnp.float32)


def sqrt_constant(lr: float, constant_steps: int,
                  max_steps: int, min_lr: float = 0.0) -> Callable:
    """ref: scheduler.py:142-202 (SquareRootConstantPolicy) — an
    ABSOLUTE 1/sqrt(constant_steps) plateau (not scaled by base lr),
    then the base lr until max_steps, then min_lr."""
    plateau = 1.0 / (constant_steps ** 0.5)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(
            step <= constant_steps, plateau,
            jnp.where(step > max_steps, min_lr, lr)).astype(jnp.float32)

    return schedule


def warmup_hold(lr: float, warmup_steps: int, hold_steps: int,
                max_steps: int, min_lr: float = 0.0) -> Callable:
    """ref: scheduler.py:203-284 (plain WarmupHoldPolicy): linear
    warmup (step+1)/(warmup+1), hold at base lr through
    warmup+hold_steps, base lr until max_steps, then min_lr."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * (step + 1.0) / (warmup_steps + 1.0)
        # hold phase (warmup..warmup+hold) and the post-hold plain
        # policy both sit at the base lr, so hold_end never branches
        out = jnp.where((step <= warmup_steps) & (warmup_steps > 0),
                        warm,
                        jnp.where(step > max_steps, min_lr, lr))
        return out.astype(jnp.float32)

    return schedule


def build_schedule(scheduler: str, scheduler_conf: dict,
                   lr: float) -> Callable:
    """Build from the train.yaml `scheduler` / `scheduler_conf` keys.

    ref: train_utils.py:491-565 (init_optimizer_and_scheduler)."""
    name = scheduler
    conf = dict(scheduler_conf or {})
    if name == 'warmuplr':
        return warmup_lr(lr, conf.get('warmup_steps', 25000))
    if name.lower() == 'noamholdannealing':
        # ref WarmupHoldPolicy: warmup/hold given as steps or as ratios
        # of max_steps; the hold REGION spans warmup..warmup+hold
        # (scheduler.py:239-251 — noam_hold_annealing adds warmup)
        max_steps = conf.get('max_steps', 100000)
        warmup = conf.get('warmup_steps')
        if warmup is None:
            warmup = int(conf.get('warmup_ratio', 0.0) * max_steps)
        hold = conf.get('hold_steps')
        if hold is None:
            hold = int(conf.get('hold_ratio', 0.0) * max_steps)
        return noam_hold_annealing(lr, warmup, hold, max_steps,
                                   conf.get('decay_rate', 0.5),
                                   conf.get('min_lr', 0.0))
    if name == 'noam_annealing':
        return noam_annealing(lr, conf.get('d_model', 256),
                              conf.get('warmup_steps', 25000),
                              conf.get('min_lr', 0.0))
    if name == 'cosine_annealing':
        return cosine_annealing(lr, conf.get('max_steps', 100000),
                                conf.get('warmup_steps', 0),
                                conf.get('min_lr', 0.0))
    if name == 'constantlr':
        return constant_lr(lr)
    if name in ('sqrt_constant', 'SquareRootConstantPolicy'):
        max_steps = conf.get('max_steps', 100000)
        constant = conf.get('constant_steps')
        if constant is None:
            constant = int(conf.get('constant_ratio', 0.0) * max_steps)
        return sqrt_constant(lr, constant, max_steps,
                             conf.get('min_lr', 0.0))
    if name in ('warmup_hold', 'WarmupHoldPolicy'):
        max_steps = conf.get('max_steps', 100000)
        warmup = conf.get('warmup_steps')
        if warmup is None:
            warmup = int(conf.get('warmup_ratio', 0.0) * max_steps)
        # hold_steps is accepted for config parity but is inert for the
        # PLAIN policy: hold and post-hold both sit at base lr (the
        # reference's plain WarmupHoldPolicy behaves the same,
        # scheduler.py:203-284 — only decaying subclasses like
        # NoamHoldAnnealing branch on hold_end)
        hold = conf.get('hold_steps')
        if hold is None:
            hold = int(conf.get('hold_ratio', 0.0) * max_steps)
        return warmup_hold(lr, warmup, hold, max_steps,
                           conf.get('min_lr', 0.0))
    raise ValueError(f'unknown scheduler: {name}')
