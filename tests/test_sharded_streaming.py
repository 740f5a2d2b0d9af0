"""Sharded STREAMING decode (VERDICT r4 item #8): BatchedChunkRunner
over a data-parallel mesh produces chunk posteriors identical to
per-session serial single-device decoding — the serving analog of
tests/test_sharded_decode.py's offline identity.

Three concurrent sessions over an 8-device 'data' mesh also exercises
the pad-to-axis-multiple path (3 rows -> 8): pad rows repeat the last
request and their outputs are dropped."""

import concurrent.futures as cf

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_runtime import streaming_model  # noqa: F401 (fixture)


@pytest.mark.parametrize('n_sessions', [3])
def test_sharded_chunk_runner_matches_serial(streaming_model,  # noqa: F811
                                             n_sessions):
    import jax.sharding as jsh
    from wenet_tpu.models.transformer.streaming import (
        StreamingConfig, streaming_att_mask)
    from wenet_tpu.runtime.batch_runner import BatchedChunkRunner

    if len(jax.devices()) < 8:
        pytest.skip('needs the 8-device virtual mesh')
    model, variables, tokenizer = streaming_model
    cfg = StreamingConfig(decoding_chunk_size=4,
                          num_decoding_left_chunks=2,
                          subsampling_rate=model.encoder.subsampling_rate,
                          right_context=model.encoder.right_context)
    chunk_out = (cfg.decoding_window - cfg.right_context - 1) \
        // cfg.subsampling_rate + 1
    rng = np.random.RandomState(0)
    n_chunks = 3
    feats = [rng.randn(n_chunks, cfg.decoding_window, 80)
             .astype(np.float32) for _ in range(n_sessions)]

    def serial(f):
        att, cnn = model.encoder.zero_cache(1, cfg.required_cache_size)
        offset, valid = 0, 0
        logps = []
        for t in range(n_chunks):
            mask = streaming_att_mask(1, cfg.required_cache_size,
                                      chunk_out, valid,
                                      valid_chunk=chunk_out)
            ys, att, cnn = model.apply(
                variables, jnp.asarray(f[t])[None],
                jnp.asarray(offset), att, cnn, mask,
                method=model.forward_encoder_chunk)
            logps.append(np.asarray(model.apply(
                variables, ys, method=model.ctc_activation)))
            offset += chunk_out
            valid = min(valid + chunk_out, cfg.required_cache_size)
        return np.concatenate(logps, axis=1)

    golden = [serial(f) for f in feats]

    mesh = jsh.Mesh(np.asarray(jax.devices()[:8]), ('data',))
    runner = BatchedChunkRunner(model, variables, cfg,
                                max_batch=n_sessions, flush_ms=200.0,
                                mesh=mesh)
    try:
        def session(f):
            cache = runner.zero_cache()
            offset, valid = 0, 0
            logps = []
            for t in range(n_chunks):
                fut = runner.submit(f[t], cache, offset, valid,
                                    chunk_out)
                ys, logp, cache = fut.result(timeout=300)
                logps.append(logp)
                offset += chunk_out
                valid = min(valid + chunk_out,
                            cfg.required_cache_size)
            return np.concatenate(logps, axis=1)

        with cf.ThreadPoolExecutor(n_sessions) as ex:
            outs = list(ex.map(session, feats))
    finally:
        runner.close()
    for got, want in zip(outs, golden):
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
