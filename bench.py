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


def bench_attention(batch: int = 16, whisper: bool = False,
                    small: bool = False):
    """AR attention-beam decode throughput (the DEFAULT mode for
    whisper/firered — ref wenet/models/whisper/whisper.py:31,
    firered/model.py:33) on the pipelined
    AsrRunner.decode_attention_batches path: the whole beam search is
    ONE jitted while_loop program (search.py _attention_beam_program),
    encoder+beam for batch i+1 dispatches while batch i's
    (hyps, scores) fetch overlaps on the worker pool.

    Honesty note: with random weights no beam ever emits <eos>, so the
    while_loop runs its full `maxlen+1` step bound — the WORST-CASE
    AR decode (real utterances exit early on-device).  The
    `ar_steps_per_sec` line is therefore the load-bearing figure:
    real-transcript throughput = ar_steps_per_sec x (audio_sec per
    emitted token).  `--whisper` benches a whisper-base-shaped model
    (d512 6+6, V=51865) WITH task/lang prompt prefixes."""
    from wenet_tpu.models.runner import AsrRunner
    from wenet_tpu.utils.init_model import init_model, init_variables

    if whisper:
        B = min(batch, 8)
        # 8 s -> T'=400 beam steps: keeps the worst-case while_loop
        # bound (encoder len + 1) inside whisper's 448-position
        # learnable decoder PE, mirroring whisper's own n_text_ctx
        # generation cap
        SECONDS = 8.0
        configs = _whisper_bench_config()
        beam = 5
    else:
        from __graft_entry__ import _flagship_config
        B = batch
        SECONDS = 15.0
        configs = _flagship_config(small=small)
        beam = 10
    if small:
        # smoke-run shape (tests/test_bench_harnesses.py): tiny model,
        # 1 s audio, 2-deep batch list — covers the whole harness path
        # (pipelined program build, worst-case AR loop, JSON report)
        # without flagship compile times
        B = min(B, 2)
        SECONDS = 1.0
        beam = 3
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    runner = AsrRunner(model, variables, dtype=jnp.bfloat16)

    T = int(SECONDS * 100)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, configs['input_dim']),
                        jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    infos = ({'tasks': ['transcribe'] * B, 'langs': ['zh'] * B}
             if whisper else None)
    iters = 2 if small else (3 if whisper else 6)
    batches = [((feats + 1e-3 * i, lens, infos) if infos
                else (feats + 1e-3 * i, lens)) for i in range(iters)]

    list(runner.decode_attention_batches(batches[:1],
                                         beam_size=beam))  # compile
    best_dt = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        outs = list(runner.decode_attention_batches(batches,
                                                    beam_size=beam))
        best_dt = min(best_dt, time.perf_counter() - t0)
    assert len(outs) == iters
    throughput = B * SECONDS * iters / best_dt
    # steps actually executed: with random weights nothing emits <eos>,
    # so every emitted token == one while_loop AR step
    maxlen = max(len(r.tokens) for r in outs[0])
    out = {
        'metric': ('whisper_attention_beam_throughput' if whisper
                   else 'attention_beam_throughput'),
        'value': round(throughput, 1),
        'unit': 'audio_sec/sec/chip (worst-case: no early exit)',
        'vs_baseline': round(throughput / 2000.0, 3),
        'ar_steps_per_sec': round(maxlen * B * iters / best_dt, 1),
        'beam': beam, 'batch': B,
    }
    print(json.dumps(out))


def _whisper_bench_config():
    """whisper-base layout (d512, 6+6, V=51865 multilingual, 80 mels)
    via the real converter config builder — the ref family
    default-decodes with attention beam
    (wenet/models/whisper/whisper.py:31)."""
    from wenet_tpu.models.whisper.convert import build_config
    v = 51865
    dims = {'n_mels': 80, 'n_vocab': v, 'n_audio_state': 512,
            'n_audio_head': 8, 'n_audio_layer': 6, 'n_text_state': 512,
            'n_text_head': 8, 'n_text_layer': 6, 'n_audio_ctx': 1500,
            'n_text_ctx': 448}
    st = {'sot': v - 10, 'eot': v - 11, 'sot_prev': v - 9,
          'transcribe': v - 8, 'translate': v - 7, 'no_timestamps': v - 6,
          'no_speech': v - 5, 'timestamp_begin': v - 4}
    return build_config(dims, st)


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
    from wenet_tpu.models.transformer.attention import (
        enable_flash_attention)

    # same dispatch policy as the production AsrRunner (runner.py:58):
    # pallas flash for long T and for large batch-area (B, h, T, T)
    # score tensors where XLA's fp32 scores spill past VMEM tiling
    enable_flash_attention(True, min_len=512)

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
        # chunked head: per-frame argmax without the (B, T', V)
        # posterior ever existing (ctc.py argmax_chunked) — identical
        # ids to argmax(log_softmax(logits)), tested in
        # tests/test_ctc_chunked.py
        hyps = model.apply(variables, enc, method=model.ctc_argmax)
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
    elif '--mode' in sys.argv and 'attention' in sys.argv:
        bench_attention(batch, whisper='--whisper' in sys.argv,
                        small='--small' in sys.argv)
    else:
        main(batch)
