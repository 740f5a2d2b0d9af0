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
        mult = d_model**-0.5 * jnp.minimum(s**-0.5,
                                           s * warmup_steps**-1.5)
        return jnp.maximum(lr * mult, min_lr)

    return schedule


def noam_hold_annealing(lr: float, warmup_steps: int, hold_steps: int,
                        decay_rate: float = 0.5,
                        min_lr: float = 0.0) -> Callable:
    """ref: scheduler.py:629-722 (_noam_hold_annealing :438-447)."""

    def schedule(step):
        s = (step + 1).astype(jnp.float32) if hasattr(step, 'astype') \
            else float(step + 1)
        s = jnp.asarray(s, jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        t_warm = max(1.0, warmup_steps**decay_rate)
        t_hold = jnp.maximum(1.0, (s - hold_steps)**decay_rate)
        anneal = jnp.maximum(lr * t_warm / t_hold, min_lr)
        out = jnp.where(s <= warmup_steps, warm,
                        jnp.where(s <= hold_steps, lr, anneal))
        return out

    return schedule


def cosine_annealing(lr: float, max_steps: int, warmup_steps: int = 0,
                     min_lr: float = 0.0) -> Callable:
    """ref: scheduler.py:502-560 (_cosine_annealing :396-399)."""

    def schedule(step):
        s = jnp.asarray(step + 1, jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        frac = jnp.clip((s - warmup_steps) /
                        max(max_steps - warmup_steps, 1), 0.0, 1.0)
        mult = 0.5 * (1 + jnp.cos(math.pi * frac))
        ann = (lr - min_lr) * mult + min_lr
        return jnp.where(s <= warmup_steps, warm, ann) \
            if warmup_steps > 0 else ann

    return schedule


def constant_lr(lr: float) -> Callable:
    return lambda step: jnp.asarray(lr, jnp.float32)


SCHEDULERS = {
    'warmuplr': warmup_lr,
    'NoamHoldAnnealing': noam_hold_annealing,
    'noamholdannealing': noam_hold_annealing,
    'noam_annealing': noam_annealing,
    'cosine_annealing': cosine_annealing,
    'constantlr': constant_lr,
}


def build_schedule(scheduler: str, scheduler_conf: dict,
                   lr: float) -> Callable:
    """Build from the train.yaml `scheduler` / `scheduler_conf` keys.

    ref: train_utils.py:491-565 (init_optimizer_and_scheduler)."""
    name = scheduler
    conf = dict(scheduler_conf or {})
    if name == 'warmuplr':
        return warmup_lr(lr, conf.get('warmup_steps', 25000))
    if name.lower() == 'noamholdannealing':
        max_steps = conf.get('max_steps', 100000)
        hold_ratio = conf.get('hold_ratio', 0.3)
        warmup = conf.get('warmup_steps',
                          int(conf.get('warmup_ratio', 0.2) * max_steps)
                          if 'warmup_ratio' in conf else 10000)
        hold = warmup + int(hold_ratio * (max_steps - warmup))
        return noam_hold_annealing(lr, warmup, hold,
                                   conf.get('decay_rate', 1.0),
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
    raise ValueError(f'unknown scheduler: {name}')
