"""Training-step throughput benchmark (secondary bench).

Measures audio-seconds of supervised data consumed per wall-second by
the full jitted U2++ train step (joint CTC + attention + reverse loss,
grads, adam update) on one chip, plus MFU from XLA's own FLOP count of
the compiled step.

Methodology (BENCH_NOTES.md): through the axon tunnel
`block_until_ready` can return before device execution finishes, so
iterations use N DISTINCT pre-uploaded batches dispatched back-to-back
and are bounded by a device_get of the final iteration's loss (single-
device in-order execution makes that fetch a barrier for all steps).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(dtype=jnp.bfloat16, label='bf16', donate=True, iters=10,
         prng_impl='unsafe_rbg', batch=16, seconds=12.0,
         grad_ckpt=False, selective_remat=False, profile_dir=None,
         flash_train=False):
    # threefry bit-generation costs ~45% of the step on TPU (measured:
    # 55.7 -> 30.8 ms/step); unsafe_rbg is the shipped train default
    jax.config.update('jax_default_prng_impl', prng_impl)
    if flash_train:
        # rel-pos self-attention through the pallas flash kernels with
        # in-kernel dropout: no (T, T) HBM traffic either direction
        from wenet_tpu.models.transformer.attention import (
            enable_flash_attention)
        enable_flash_attention(True, train_dropout=True)
    from __graft_entry__ import _flagship_config
    from wenet_tpu.utils.init_model import init_model, init_variables
    from wenet_tpu.utils.mfu import compiled_flops, mfu
    from wenet_tpu.utils.train_utils import (create_train_state,
                                             init_optimizer_and_scheduler,
                                             make_train_step)

    configs = _flagship_config()
    if grad_ckpt:
        configs['encoder_conf']['gradient_checkpointing'] = True
    elif selective_remat:
        # recompute ONLY the (T, T) attention scores/softmax in
        # backward (encoder.py _remat_layer 'selective')
        configs['encoder_conf']['gradient_checkpointing'] = 'selective'
    configs.setdefault('optim', 'adam')
    configs.setdefault('optim_conf', {'lr': 1e-3})
    configs.setdefault('scheduler', 'warmuplr')
    configs.setdefault('scheduler_conf', {'warmup_steps': 25000})
    model, configs = init_model(None, configs)
    variables, configs = init_variables(model, configs)
    tx, schedule = init_optimizer_and_scheduler(configs)
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, schedule, compute_dtype=dtype)
    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    B, SECONDS = batch, seconds
    T = int(SECONDS * 100)
    L = 48
    rng = np.random.RandomState(0)
    batches = []
    for i in range(iters):
        batches.append(jax.device_put({
            'feats': jnp.asarray(rng.randn(B, T, configs['input_dim']),
                                 jnp.float32),
            'feats_lengths': jnp.full((B,), T, jnp.int32),
            'target': jnp.asarray(
                rng.randint(2, configs['output_dim'] - 2, size=(B, L)),
                jnp.int32),
            'target_lengths': jnp.full((B,), L, jnp.int32),
        }))
    key = jax.random.PRNGKey(0)

    # ONE compile, reused for execution and the XLA FLOP count
    train_step = jitted.lower(state, batches[0], key).compile()
    flops = compiled_flops(train_step)

    state, metrics = train_step(state, batches[0], key)  # warm run
    float(jax.device_get(metrics['loss']))

    if profile_dir:
        # device trace of 3 steady-state steps (bound analysis for the
        # train-MFU row in BENCH_NOTES.md)
        with jax.profiler.trace(profile_dir):
            for i in range(3):
                state, metrics = train_step(state, batches[i], key)
            float(jax.device_get(metrics['loss']))

    best_dt = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = train_step(state, batches[i], key)
        # fetch of the last step's loss bounds ALL steps (in-order
        # device queue); block_until_ready alone can lie through the
        # remote-TPU transport
        float(jax.device_get(metrics['loss']))
        best_dt = min(best_dt, time.perf_counter() - t0)
    thr = B * SECONDS * iters / best_dt
    out = {
        'metric': f'train_step_throughput_{label}',
        'value': round(thr, 1),
        'unit': 'audio_sec/sec/chip',
        'vs_baseline': None,
        'loss': round(float(jax.device_get(metrics['loss'])), 3),
    }
    if flops:
        flops_per_sec = flops * iters / best_dt
        out['step_tflops'] = round(flops / 1e12, 2)
        util = mfu(flops_per_sec)
        if util is not None:
            out['mfu'] = round(util, 4)
    print(json.dumps(out))


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--fp32', action='store_true')
    ap.add_argument('--no-donate', action='store_true')
    ap.add_argument('--prng_impl', default='unsafe_rbg')
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--seconds', type=float, default=12.0)
    ap.add_argument('--grad_ckpt', action='store_true',
                    help='remat encoder layers (recompute fwd in bwd: '
                         'trades FLOPs for residual HBM traffic, '
                         'enables larger batches)')
    ap.add_argument('--selective_remat', action='store_true',
                    help='recompute only the (T,T) attention scores/'
                         'softmax in backward (selective activation '
                         'recomputation)')
    ap.add_argument('--profile_dir', default=None,
                    help='capture a jax.profiler device trace of 3 '
                         'steady-state steps into this dir')
    ap.add_argument('--flash_train', action='store_true',
                    help='rel-pos attention via pallas flash kernels '
                         'with in-kernel dropout (the bin/train.py '
                         'default)')
    args = ap.parse_args()
    main(jnp.float32 if args.fp32 else jnp.bfloat16,
         'fp32' if args.fp32 else 'bf16',
         donate=not args.no_donate,
         prng_impl=args.prng_impl, batch=args.batch,
         seconds=args.seconds, grad_ckpt=args.grad_ckpt,
         selective_remat=args.selective_remat,
         profile_dir=args.profile_dir,
         flash_train=args.flash_train)
