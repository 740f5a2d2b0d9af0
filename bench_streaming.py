"""Streaming chunk-latency benchmark (secondary bench; the driver's
headline metric comes from bench.py).

Measures per-chunk wall latency of the jitted streaming step
(forward_encoder_chunk + ctc_activation) for the flagship U2++
conformer at chunk_size=16 (640 ms of audio per step), batch 1 —
the serving hot path.  Baseline target: p50 < 200 ms (BASELINE.md).

Prints one JSON line: {"metric", "value" (p50 ms), "unit",
"vs_baseline" (target/actual, >1 is better), "p90_ms", "rtf"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _flagship_config
    from wenet_tpu.models.transformer.streaming import (StreamingConfig,
                                                        streaming_att_mask)
    from wenet_tpu.utils.init_model import init_model

    configs = _flagship_config()
    model, configs = init_model(None, configs)
    input_dim = configs['input_dim']

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, input_dim)),
                           jnp.asarray([16]),
                           jnp.zeros((1, 4), jnp.int32),
                           jnp.asarray([4]))
    variables = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x,
        variables))

    cfg = StreamingConfig(decoding_chunk_size=16,
                          num_decoding_left_chunks=4,
                          subsampling_rate=model.encoder.subsampling_rate,
                          right_context=model.encoder.right_context)

    @jax.jit
    def step(variables, xs, offset, att_cache, cnn_cache, att_mask):
        ys, att, cnn = model.apply(variables, xs, offset, att_cache,
                                   cnn_cache, att_mask,
                                   method=model.forward_encoder_chunk)
        logp = model.apply(variables, ys, method=model.ctc_activation)
        return ys, logp, att, cnn

    att_cache, cnn_cache = model.encoder.zero_cache(
        1, cfg.required_cache_size)
    att_cache = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), att_cache)
    cnn_cache = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), cnn_cache)
    chunk_out = (cfg.decoding_window - cfg.right_context - 1) \
        // cfg.subsampling_rate + 1
    rng = np.random.RandomState(0)

    # serving-honest timing: every chunk is distinct data, and the CTC
    # posteriors are FETCHED to host each step (the prefix beam search
    # consumes them there), so the latency includes the transfer
    n_chunks = 50
    lat = []
    offset = 0
    valid = 0
    for i in range(n_chunks):
        chunk = jax.device_put(jnp.asarray(
            rng.randn(1, cfg.decoding_window, input_dim), jnp.bfloat16))
        mask = streaming_att_mask(1, cfg.required_cache_size, chunk_out,
                                  valid, valid_chunk=chunk_out)
        t0 = time.perf_counter()
        ys, logp, att_cache, cnn_cache = step(
            variables, chunk, jnp.asarray(offset), att_cache, cnn_cache,
            mask)
        _ = np.asarray(logp)  # host fetch = real serving consumption
        lat.append(time.perf_counter() - t0)
        offset += chunk_out
        valid = min(valid + chunk_out, cfg.required_cache_size)
    lat = sorted(lat[2:])  # drop compile/warmup
    p50 = lat[len(lat) // 2] * 1e3
    p90 = lat[int(len(lat) * 0.9)] * 1e3
    audio_ms_per_chunk = cfg.stride * 10.0
    print(json.dumps({
        'metric': 'streaming_chunk_latency_p50',
        'value': round(p50, 2),
        'unit': 'ms',
        'vs_baseline': round(200.0 / p50, 2),
        'p90_ms': round(p90, 2),
        'rtf': round(p50 / audio_ms_per_chunk, 4),
    }))


if __name__ == '__main__':
    main()
