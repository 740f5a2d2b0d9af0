"""Training-step throughput benchmark (secondary bench).

Measures audio-seconds of supervised data consumed per wall-second by
the full jitted U2++ train step (joint CTC + attention + reverse loss,
grads, adam update) on one chip, bf16 compute / fp32 params.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _flagship_config
    from wenet_tpu.utils.init_model import init_model, init_variables
    from wenet_tpu.utils.train_utils import (create_train_state,
                                             init_optimizer_and_scheduler,
                                             make_train_step)

    configs = _flagship_config()
    configs.setdefault('optim', 'adam')
    configs.setdefault('optim_conf', {'lr': 1e-3})
    configs.setdefault('scheduler', 'warmuplr')
    configs.setdefault('scheduler_conf', {'warmup_steps': 25000})
    model, configs = init_model(None, configs)
    variables, configs = init_variables(model, configs)
    tx, schedule = init_optimizer_and_scheduler(configs)
    state = create_train_state(variables, tx)
    train_step = jax.jit(make_train_step(model, tx, schedule,
                                         compute_dtype=jnp.bfloat16))

    B, SECONDS = 16, 12.0
    T = int(SECONDS * 100)
    L = 48
    rng = np.random.RandomState(0)
    batch = {
        'feats': jnp.asarray(rng.randn(B, T, configs['input_dim']),
                             jnp.float32),
        'feats_lengths': jnp.full((B,), T, jnp.int32),
        'target': jnp.asarray(
            rng.randint(2, configs['output_dim'] - 2, size=(B, L)),
            jnp.int32),
        'target_lengths': jnp.full((B,), L, jnp.int32),
    }
    key = jax.random.PRNGKey(0)

    state, metrics = train_step(state, batch, key)  # compile
    jax.block_until_ready(metrics['loss'])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch, key)
    jax.block_until_ready(metrics['loss'])
    dt = time.perf_counter() - t0
    thr = B * SECONDS * iters / dt
    print(json.dumps({
        'metric': 'train_step_throughput',
        'value': round(thr, 1),
        'unit': 'audio_sec/sec/chip',
        'vs_baseline': None,
        'loss': round(float(metrics['loss']), 3),
    }))


if __name__ == '__main__':
    main()
