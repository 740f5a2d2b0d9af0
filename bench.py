"""Offline decode throughput benchmark (driver entry).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures audio-seconds processed per wall-second per chip for the
flagship U2++ conformer (AIShell-1 shape): encoder full forward + CTC
log-softmax + greedy argmax, bf16 activations.  Baseline target:
2000 audio-sec/sec/chip (BASELINE.md).

Methodology notes (important over the remote-TPU tunnel):
* params are device-resident (jax.device_put) — numpy pytrees would
  re-upload per call;
* every iteration gets a *different* input (a per-iteration constant is
  added) so transport-level caching of identical executions cannot
  inflate the number;
* N iterations are dispatched back-to-back and ALL outputs are blocked
  on, so the wall time covers real device execution, amortizing
  dispatch latency the way a production decode loop does.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_rescoring():
    """Full attention_rescoring pipeline throughput: encoder + CTC +
    batched prefix beam + the (B, nbest) jitted rescoring program
    (ref default decode mode, asr_model.py:40; VERDICT.md round-1
    weakness #6 asked for a bench row on this path)."""
    from __graft_entry__ import _flagship_config
    from wenet_tpu.models.runner import AsrRunner
    from wenet_tpu.utils.init_model import init_model, init_variables

    configs = _flagship_config()
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    runner = AsrRunner(model, variables, dtype=jnp.bfloat16)

    B = 16
    SECONDS = 15.0
    T = int(SECONDS * 100)
    input_dim = configs['input_dim']
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, input_dim), jnp.float32)
    feats_lengths = jnp.full((B,), T, jnp.int32)

    iters = 6
    batches = [(feats + 1e-3 * i, feats_lengths) for i in range(iters)]

    # warmup/compile both pipeline stages
    list(runner.decode_rescoring_batches(batches[:1], beam_size=10,
                                         ctc_weight=0.3,
                                         reverse_weight=0.3))
    best_dt = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        outs = list(runner.decode_rescoring_batches(
            batches, beam_size=10, ctc_weight=0.3, reverse_weight=0.3))
        best_dt = min(best_dt, time.perf_counter() - t0)
    assert len(outs) == iters
    audio_sec = B * SECONDS * iters
    throughput = audio_sec / best_dt
    out = {
        'metric': 'attention_rescoring_throughput',
        'value': round(throughput, 1),
        'unit': 'audio_sec/sec/chip',
        'vs_baseline': round(throughput / 2000.0, 3),
    }
    # MFU lower bound: XLA-counted FLOPs of the encoder+CTC+top-k
    # program (the dominant device stage).  The (B, nbest) rescoring
    # program's shapes are data-dependent (nbest length buckets), so
    # its FLOPs are excluded — true utilization is slightly higher.
    from wenet_tpu.utils.mfu import mfu, program_flops
    enc_fn = runner._jitted.get(('_enc_ctc_topk', 10, 0.0, 0))
    flops = (program_flops(enc_fn, runner.variables, feats, feats_lengths)
             if enc_fn is not None else None)
    if flops:
        util = mfu(flops * iters / best_dt)
        if util is not None:
            out['mfu'] = round(util, 4)
            out['mfu_note'] = 'encoder-program lower bound'
    print(json.dumps(out))


def bench_greedy_runner(batch: int = 16):
    """The USER-FACING greedy path: AsrRunner.decode_ctc_greedy_batches
    (what recognize.py runs for greedy-only jobs), including the host
    dedup+blank-removal stage — vs the raw-program number from main()."""
    from __graft_entry__ import _flagship_config
    from wenet_tpu.models.runner import AsrRunner
    from wenet_tpu.utils.init_model import init_model, init_variables

    configs = _flagship_config()
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    runner = AsrRunner(model, variables, dtype=jnp.bfloat16)

    B = batch
    SECONDS = 15.0
    T = int(SECONDS * 100)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, configs['input_dim']),
                        jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    iters = 12
    batches = [(feats + 1e-3 * i, lens) for i in range(iters)]

    list(runner.decode_ctc_greedy_batches(batches[:1]))  # compile
    best_dt = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        outs = list(runner.decode_ctc_greedy_batches(batches))
        best_dt = min(best_dt, time.perf_counter() - t0)
    assert len(outs) == iters
    throughput = B * SECONDS * iters / best_dt
    out = {
        'metric': 'ctc_greedy_runner_throughput',
        'value': round(throughput, 1),
        'unit': 'audio_sec/sec/chip',
        'vs_baseline': round(throughput / 2000.0, 3),
    }
    from wenet_tpu.utils.mfu import mfu, program_flops
    fn = runner._jitted.get(('_ctc_greedy_pipe', 0.0, 0))
    flops = (program_flops(fn, runner.variables, feats, lens)
             if fn is not None else None)
    if flops:
        util = mfu(flops * iters / best_dt)
        if util is not None:
            out['mfu'] = round(util, 4)
    print(json.dumps(out))


def bench_prefix_beam(batch: int = 16):
    """Pipelined CTC prefix beam search throughput
    (AsrRunner.decode_prefix_beam_batches: device encoder+CTC+top-k ‖
    overlapped top-k fetch ‖ host C++ trie beam)."""
    from __graft_entry__ import _flagship_config
    from wenet_tpu.models.runner import AsrRunner
    from wenet_tpu.utils.init_model import init_model, init_variables

    configs = _flagship_config()
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    runner = AsrRunner(model, variables, dtype=jnp.bfloat16)

    B = batch
    SECONDS = 15.0
    T = int(SECONDS * 100)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, configs['input_dim']),
                        jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    iters = 10
    batches = [(feats + 1e-3 * i, lens) for i in range(iters)]

    list(runner.decode_prefix_beam_batches(batches[:1]))  # compile
    best_dt = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        outs = list(runner.decode_prefix_beam_batches(batches,
                                                      beam_size=10))
        best_dt = min(best_dt, time.perf_counter() - t0)
    assert len(outs) == iters
    throughput = B * SECONDS * iters / best_dt
    out = {
        'metric': 'ctc_prefix_beam_throughput',
        'value': round(throughput, 1),
        'unit': 'audio_sec/sec/chip',
        'vs_baseline': round(throughput / 2000.0, 3),
    }
    from wenet_tpu.utils.mfu import mfu, program_flops
    fn = runner._jitted.get(('_enc_topk_pipe', 10, 0.0, 0))
    flops = (program_flops(fn, runner.variables, feats, lens)
             if fn is not None else None)
    if flops:
        util = mfu(flops * iters / best_dt)
        if util is not None:
            out['mfu'] = round(util, 4)
            out['mfu_note'] = 'device-program lower bound'
    print(json.dumps(out))


def _paraformer_bench_config():
    """d512 12+6 SAN-M paraformer, V=5537 — reduced-depth
    paraformer-large layout (the ref recipe
    examples/aishell/paraformer/conf/train_paraformer.yaml is 50+16;
    12+6 keeps bench compile time sane while preserving every
    per-layer shape)."""
    return {
        'input_dim': 560, 'output_dim': 5537,
        'lfr_conf': {'lfr_m': 7, 'lfr_n': 6},
        'encoder': 'sanm_encoder',
        'encoder_conf': {'output_size': 512, 'attention_heads': 4,
                         'linear_units': 2048, 'num_blocks': 12,
                         'kernel_size': 11},
        'decoder': 'sanm_decoder',
        'decoder_conf': {'attention_heads': 4, 'linear_units': 2048,
                         'num_blocks': 6, 'att_layer_num': 6,
                         'kernel_size': 11},
        'predictor': 'cif_predictor',
        'predictor_conf': {'idim': 512, 'l_order': 1, 'r_order': 1,
                           'tail_threshold': 0.45},
        'model': 'paraformer',
        'model_conf': {'ctc_weight': 0.3, 'lsm_weight': 0.1},
        'tokenizer_conf': {'special_tokens': {'<sos>': 5535,
                                              '<eos>': 5536}},
    }


def bench_paraformer(batch: int = 16):
    """Pipelined paraformer NAR greedy decode throughput
    (AsrRunner.decode_paraformer_batches: fused device program for
    batch i+1 ‖ background result fetch for batch i ‖ host finalize
    for batch i-1)."""
    from wenet_tpu.models.runner import AsrRunner
    from wenet_tpu.utils.init_model import init_model, init_variables

    configs = _paraformer_bench_config()
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    runner = AsrRunner(model, variables, dtype=jnp.bfloat16)

    B = batch
    SECONDS = 15.0
    T = int(SECONDS * 100)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, 80), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    iters = 8
    batches = [(feats + 1e-3 * i, lens) for i in range(iters)]

    list(runner.decode_paraformer_batches(batches[:1]))  # compile
    best_dt = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        outs = list(runner.decode_paraformer_batches(batches))
        best_dt = min(best_dt, time.perf_counter() - t0)
    assert len(outs) == iters
    throughput = B * SECONDS * iters / best_dt
    out = {
        'metric': 'paraformer_greedy_throughput',
        'value': round(throughput, 1),
        'unit': 'audio_sec/sec/chip',
        'vs_baseline': round(throughput / 2000.0, 3),
    }
    from wenet_tpu.utils.mfu import mfu, program_flops
    fn = runner._jitted.get(('_paraformer_pipe', True))
    flops = (program_flops(fn, runner.variables, feats, lens)
             if fn is not None else None)
    if flops:
        util = mfu(flops * iters / best_dt)
        if util is not None:
            out['mfu'] = round(util, 4)
    print(json.dumps(out))


def main(batch: int = 16):
    from __graft_entry__ import _flagship_config
    from wenet_tpu.utils.init_model import init_model

    configs = _flagship_config()
    model, configs = init_model(None, configs)

    B = batch
    SECONDS = 15.0
    T = int(SECONDS * 100)  # 10ms frames
    input_dim = configs['input_dim']

    rng = np.random.RandomState(0)
    feats = jax.device_put(
        jnp.asarray(rng.randn(B, T, input_dim), jnp.bfloat16))
    feats_lengths = jax.device_put(jnp.full((B,), T, jnp.int32))

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, input_dim)),
                           jnp.asarray([16]),
                           jnp.zeros((1, 4), jnp.int32),
                           jnp.asarray([4]))
    variables = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x,
        variables))

    @jax.jit
    def decode_fwd(variables, feats, feats_lengths, c):
        enc, mask = model.apply(variables, feats + c, feats_lengths,
                                method=model.forward_encoder)
        logp = model.apply(variables, enc, method=model.ctc_logprobs)
        hyps = jnp.argmax(logp, axis=-1)
        return hyps, jnp.sum(mask[:, 0], -1)

    # ONE compile, reused for execution + the XLA FLOP count
    decode_fwd = decode_fwd.lower(variables, feats, feats_lengths,
                                  jnp.bfloat16(0.0)).compile()
    out = decode_fwd(variables, feats, feats_lengths, jnp.bfloat16(0.0))
    jax.block_until_ready(out)

    iters = 20
    best_dt = float('inf')
    # best-of-3: tunnel jitter makes single repeats vary by ~8%
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [decode_fwd(variables, feats, feats_lengths,
                           jnp.bfloat16(1e-3 * i))
                for i in range(iters)]
        # device executes in-order: fetching the final hyps to host
        # bounds ALL iterations (block_until_ready alone can return
        # early through remote-TPU transports)
        np.asarray(outs[-1][0])
        best_dt = min(best_dt, time.perf_counter() - t0)

    audio_sec = B * SECONDS * iters
    throughput = audio_sec / best_dt
    out = {
        'metric': 'offline_decode_throughput',
        'value': round(throughput, 1),
        'unit': 'audio_sec/sec/chip',
        'vs_baseline': round(throughput / 2000.0, 3),
    }
    from wenet_tpu.utils.mfu import compiled_flops, mfu
    flops = compiled_flops(decode_fwd)
    if flops:
        util = mfu(flops * iters / best_dt)
        if util is not None:
            out['mfu'] = round(util, 4)
    print(json.dumps(out))


if __name__ == '__main__':
    batch = 16
    if '--batch' in sys.argv:
        batch = int(sys.argv[sys.argv.index('--batch') + 1])
    if '--mode' in sys.argv and 'rescoring' in sys.argv:
        bench_rescoring()
    elif '--mode' in sys.argv and 'greedy_runner' in sys.argv:
        bench_greedy_runner(batch)
    elif '--mode' in sys.argv and 'prefix_beam' in sys.argv:
        bench_prefix_beam(batch)
    elif '--mode' in sys.argv and 'paraformer' in sys.argv:
        bench_paraformer(batch)
    else:
        main(batch)
