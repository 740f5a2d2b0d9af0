"""Serving runtime tests: endpoint rules, feature pipeline residuals,
streaming AsrDecoder, websocket server round trip."""

import asyncio
import json
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wenet_tpu.runtime.endpoint import CtcEndpoint, CtcEndpointConfig
from wenet_tpu.runtime.feature_pipeline import FeaturePipeline
from wenet_tpu.ops.fbank import compute_fbank_np


def test_endpoint_rules():
    ep = CtcEndpoint(CtcEndpointConfig(), frame_shift_in_ms=40)
    V = 5
    blank_frames = np.log(np.full((30, V), 1e-6))
    blank_frames[:, 0] = np.log(0.95)
    # rule2: 1000ms trailing silence after decoding => 25 frames @40ms
    assert not ep.is_endpoint(blank_frames[:20], decoded_something=True)
    assert ep.is_endpoint(blank_frames[:10], decoded_something=True)
    # rule1 needs 5000ms when nothing decoded
    ep.reset()
    assert not ep.is_endpoint(blank_frames, decoded_something=False)
    frames_5s = np.tile(blank_frames, (5, 1))[:125]
    assert ep.is_endpoint(frames_5s, decoded_something=False)


def test_feature_pipeline_incremental_equals_batch():
    rng = np.random.RandomState(0)
    wav = (0.2 * rng.randn(16000)).astype(np.float32)
    full = compute_fbank_np(wav * (1 << 15), num_mel_bins=40,
                            sample_rate=16000)
    from wenet_tpu.runtime.feature_pipeline import FeaturePipelineConfig
    fp = FeaturePipeline(FeaturePipelineConfig(num_mel_bins=40))
    chunks = []
    for i in range(0, len(wav), 1600):
        f = fp.accept_waveform(wav[i:i + 1600])
        if f.shape[0]:
            chunks.append(f)
    inc = np.concatenate(chunks)
    n = min(len(full), len(inc))
    np.testing.assert_allclose(inc[:n], full[:n], atol=1e-4)


@pytest.fixture(scope='module')
def streaming_model():
    from wenet_tpu.text.char_tokenizer import CharTokenizer
    from wenet_tpu.utils.init_model import init_model, init_variables
    syms = {'<blank>': 0, '<unk>': 1}
    for i, ch in enumerate('abcdefgh'):
        syms[ch] = i + 2
    syms['<sos/eos>'] = len(syms)
    configs = {
        'input_dim': 80, 'output_dim': len(syms),
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 64, 'num_blocks': 2,
                         'cnn_module_kernel': 7, 'causal': True,
                         'use_dynamic_chunk': True,
                         'cnn_module_norm': 'layer_norm'},
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                         'num_blocks': 1, 'r_num_blocks': 1},
        'model_conf': {'ctc_weight': 0.3, 'reverse_weight': 0.3},
    }
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs)
    tokenizer = CharTokenizer(syms)
    return model, variables, tokenizer


def test_asr_decoder_streaming(streaming_model):
    from wenet_tpu.runtime.asr_decoder import (AsrDecoder, DecodeOptions,
                                               DecodeState)
    model, variables, tokenizer = streaming_model
    dec = AsrDecoder(model, variables, tokenizer,
                     DecodeOptions(chunk_size=4, num_left_chunks=2,
                                   beam_size=3))
    rng = np.random.RandomState(0)
    wav = (0.2 * rng.randn(16000)).astype(np.float32)
    for i in range(0, len(wav), 3200):
        dec.accept_waveform(wav[i:i + 3200])
        dec.decode()
    dec.set_input_finished()
    state = dec.decode()
    dec.rescoring()
    assert dec.result
    assert isinstance(dec.result[0].sentence, str)


def test_websocket_roundtrip(streaming_model):
    websockets = pytest.importorskip('websockets')
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.runtime.websocket.client import transcribe_streaming
    from wenet_tpu.runtime.websocket.server import ConnectionHandler

    model, variables, tokenizer = streaming_model

    def factory():
        return AsrDecoder(model, variables, tokenizer,
                          DecodeOptions(chunk_size=4, num_left_chunks=2,
                                        beam_size=3))

    async def run():
        async def handle(ws):
            await ConnectionHandler(ws, factory).run()

        async with websockets.serve(handle, '127.0.0.1', 0) as server:
            port = server.sockets[0].getsockname()[1]
            rng = np.random.RandomState(0)
            wav = (0.2 * rng.randn(12000)).astype(np.float32)
            msgs = await transcribe_streaming(
                f'ws://127.0.0.1:{port}', wav, chunk_ms=200)
            return msgs

    msgs = asyncio.run(run())
    types = [m.get('type') for m in msgs]
    assert types[0] == 'server_ready'
    assert 'final_result' in types
    assert types[-1] == 'speech_end'
    final = [m for m in msgs if m.get('type') == 'final_result'][-1]
    nbest = json.loads(final['nbest'])
    assert isinstance(nbest, list) and 'sentence' in nbest[0]


def test_performance_ws_tool(streaming_model):
    """tools/websocket/performance-ws.py against an in-process server:
    concurrent clients, send-timestamp pairing, latency percentiles
    (the protocol-level serving bench, bench_serving.py)."""
    websockets = pytest.importorskip('websockets')
    import argparse
    import importlib
    import os
    import sys
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.runtime.websocket.server import ConnectionHandler
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'tools', 'websocket'))
    perf = importlib.import_module('performance-ws')

    model, variables, tokenizer = streaming_model

    def factory():
        return AsrDecoder(model, variables, tokenizer,
                          DecodeOptions(chunk_size=4, num_left_chunks=2,
                                        beam_size=3))

    async def run():
        async def handle(ws):
            await ConnectionHandler(ws, factory).run()

        async with websockets.serve(handle, '127.0.0.1', 0) as server:
            port = server.sockets[0].getsockname()[1]
            args = argparse.Namespace(
                url=f'ws://127.0.0.1:{port}', wav_path=None,
                synthetic_sec=0.8, concurrency=3, chunk_ms=200,
                real_time=False)
            return await perf.run(args)

    out = asyncio.run(run())
    assert out['clients'] == 3 and out['errors'] == 0
    assert out['final_p50'] is not None and out['final_p50'] >= 0
    # every client produced a final; partial latencies are paired with
    # real send timestamps, so they must be positive when present
    if out['n_partials']:
        assert out['partial_p50'] > 0
        assert out['partial_p99'] >= out['partial_p50']


def test_native_beam_matches_python():
    from wenet_tpu.runtime.ctc_prefix_beam_search import (
        CtcPrefixBeamSearch)
    from wenet_tpu.runtime import native_beam
    if not native_beam.available():
        pytest.skip('libctc_beam.so not built')
    rng = np.random.RandomState(3)
    T, V, K = 40, 20, 6
    x = rng.randn(T, V).astype(np.float32)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    py = CtcPrefixBeamSearch(K)
    cc = native_beam.NativeCtcPrefixBeamSearch(K)
    # feed in two chunks to exercise statefulness
    for lo, hi in ((0, 17), (17, T)):
        py.search(logp[lo:hi])
        cc.search(logp[lo:hi])
    assert py.hypotheses[0] == cc.hypotheses[0]
    np.testing.assert_allclose(py.likelihood[0], cc.likelihood[0],
                               atol=1e-4)
    assert py.times[0] == cc.times[0]
    pyset = {tuple(h) for h in py.hypotheses}
    ccset = {tuple(h) for h in cc.hypotheses}
    assert len(pyset & ccset) >= K - 1


def test_grpc_roundtrip(streaming_model):
    grpc = pytest.importorskip('grpc')
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.runtime.grpc import wenet_pb2
    from wenet_tpu.runtime.grpc.server import (make_server,
                                               recognize_stream)

    model, variables, tokenizer = streaming_model

    def factory():
        return AsrDecoder(model, variables, tokenizer,
                          DecodeOptions(chunk_size=4, num_left_chunks=2,
                                        beam_size=3))

    server = make_server(factory, 0)
    port = server.add_insecure_port('127.0.0.1:0')
    server.start()
    try:
        rng = np.random.RandomState(0)
        wav = (0.2 * rng.randn(12000)).astype(np.float32)
        pcm = np.clip(wav * 32768, -32768, 32767).astype('<i2')
        chunks = [pcm[i:i + 3200].tobytes()
                  for i in range(0, len(pcm), 3200)]
        with grpc.insecure_channel(f'127.0.0.1:{port}') as ch:
            responses = recognize_stream(ch, chunks)
        types = [r.type for r in responses]
        assert types[0] == wenet_pb2.Response.server_ready
        assert wenet_pb2.Response.final_result in types
        assert types[-1] == wenet_pb2.Response.speech_end
    finally:
        server.stop(0)


def test_post_processor():
    from wenet_tpu.runtime.post_processor import (LanguageType,
                                                  PostProcessOptions,
                                                  PostProcessor)
    pp = PostProcessor()
    # mandarin spaces dropped, english words keep single space
    assert pp.process('你 好 HELLO WORLD 吗') == '你好hello world吗'
    # bpe space symbol -> real space, squeeze, strip
    assert pp.process('▁hi▁▁there▁') == 'hi there'
    # symbol removal
    assert pp.process('你<unk> 好<context>x</context>') == '你好x'
    pp2 = PostProcessor(PostProcessOptions(
        language_type=LanguageType.INDO_EUROPEAN, lowercase=False))
    assert pp2.process('GUTEN▁MORGEN wie') == 'GUTEN MORGEN wie'
    # itn fallback normalizer (rule-based numbers)
    pp3 = PostProcessor(PostProcessOptions(itn=True))
    assert pp3.process('共一百二十三人') == '共123人'


def test_builtin_itn():
    from wenet_tpu.runtime.itn import normalize
    assert normalize('一百二十三') == '123'
    assert normalize('两千零一') == '2001'
    assert normalize('三点一四') == '3.14'
    assert normalize('百分之三十') == '30%'
    assert normalize('一九九七年') == '1997年'
    assert normalize('三万五千') == '35000'
    assert normalize('一个人') == '一个人'      # lone digit left alone
    assert normalize('十块钱') == '10块钱'
    assert normalize('五亿零三百万') == '503000000'
    # fractions stay in spoken form on BOTH sides of 分之
    assert normalize('五百分之一') == '五百分之一'
    assert normalize('三分之十二') == '三分之十二'


def test_http_roundtrip(streaming_model):
    import io as _io
    import struct
    import threading
    import urllib.request
    from wenet_tpu.bin.http_server_main import make_server
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions

    model, variables, tokenizer = streaming_model

    def factory():
        return AsrDecoder(model, variables, tokenizer,
                          DecodeOptions(chunk_size=4, num_left_chunks=2,
                                        beam_size=3))

    server = make_server(factory, 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(0)
        wav = (0.2 * rng.randn(12000)).astype(np.float32)
        pcm = np.clip(wav * 32768, -32768, 32767).astype('<i2')
        data = pcm.tobytes()
        buf = _io.BytesIO()
        buf.write(b'RIFF' + struct.pack('<I', 36 + len(data)) + b'WAVE')
        buf.write(b'fmt ' + struct.pack('<IHHIIHH', 16, 1, 1, 16000,
                                        32000, 2, 16))
        buf.write(b'data' + struct.pack('<I', len(data)) + data)
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/recognize', data=buf.getvalue(),
            headers={'Content-Type': 'audio/wav'})
        with urllib.request.urlopen(req, timeout=120) as resp:
            body = json.loads(resp.read())
        assert body['type'] == 'final_result'
        assert isinstance(body['nbest'], list)
        assert 'sentence' in body['nbest'][0]
    finally:
        server.shutdown()


def test_batched_chunk_runner_matches_serial(streaming_model):
    """Two concurrent sessions batched into one forward must produce
    the same posteriors as per-session serial decoding."""
    import concurrent.futures as cf
    from wenet_tpu.models.transformer.streaming import (
        StreamingConfig, streaming_att_mask)
    from wenet_tpu.runtime.batch_runner import BatchedChunkRunner

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
             .astype(np.float32) for _ in range(2)]

    # serial golden
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
            logp = model.apply(variables, ys,
                               method=model.ctc_activation)
            logps.append(np.asarray(logp))
            offset += chunk_out
            valid = min(valid + chunk_out, cfg.required_cache_size)
        return np.concatenate(logps, axis=1)

    golden = [serial(f) for f in feats]

    runner = BatchedChunkRunner(model, variables, cfg, max_batch=2,
                                flush_ms=50.0)
    try:
        def session(f):
            cache = runner.zero_cache()
            offset, valid = 0, 0
            logps = []
            for t in range(n_chunks):
                fut = runner.submit(f[t], cache, offset, valid,
                                    chunk_out)
                ys, logp, cache = fut.result(timeout=120)
                logps.append(logp)
                offset += chunk_out
                valid = min(valid + chunk_out,
                            cfg.required_cache_size)
            return np.concatenate(logps, axis=1)

        with cf.ThreadPoolExecutor(2) as ex:
            outs = list(ex.map(session, feats))
    finally:
        runner.close()
    for got, want in zip(outs, golden):
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_batch_runner_buckets_and_precompile(streaming_model):
    """Coalesced batches pad up to power-of-two buckets (a 3-session
    flush runs the B=4 program; pad-row outputs are discarded), and
    precompile() builds exactly the bucket set before any traffic —
    so a server compiles at most log2(max_batch)+1 chunk programs."""
    import concurrent.futures as cf
    from wenet_tpu.models.transformer.streaming import StreamingConfig
    from wenet_tpu.runtime.batch_runner import BatchedChunkRunner

    model, variables, tokenizer = streaming_model
    cfg = StreamingConfig(decoding_chunk_size=4,
                          num_decoding_left_chunks=2,
                          subsampling_rate=model.encoder.subsampling_rate,
                          right_context=model.encoder.right_context)
    chunk_out = (cfg.decoding_window - cfg.right_context - 1) \
        // cfg.subsampling_rate + 1

    runner = BatchedChunkRunner(model, variables, cfg, max_batch=8,
                                flush_ms=100.0)
    try:
        assert runner.precompile(idim=80) == [1, 2, 4, 8]
        assert set(runner._jitted) == {1, 2, 4, 8}

        rng = np.random.RandomState(1)
        feats = [rng.randn(cfg.decoding_window, 80).astype(np.float32)
                 for _ in range(3)]

        def session(f):
            fut = runner.submit(f, runner.zero_cache(), 0, 0,
                                chunk_out)
            _, logp, _ = fut.result(timeout=120)
            return logp

        with cf.ThreadPoolExecutor(3) as ex:
            outs = list(ex.map(session, feats))
        # no new program sizes appeared: 3 requests rode a bucket
        assert set(runner._jitted) == {1, 2, 4, 8}
    finally:
        runner.close()

    # golden: each session alone (B=1 exact, no padding)
    solo = BatchedChunkRunner(model, variables, cfg, max_batch=1)
    try:
        for f, got in zip(feats, outs):
            fut = solo.submit(f, solo.zero_cache(), 0, 0, chunk_out)
            _, want, _ = fut.result(timeout=120)
            np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    finally:
        solo.close()


def test_asr_decoder_with_batch_runner(streaming_model):
    """AsrDecoder wired to the shared batcher matches the plain path."""
    from wenet_tpu.models.transformer.streaming import StreamingConfig
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.runtime.batch_runner import BatchedChunkRunner
    model, variables, tokenizer = streaming_model
    opts = DecodeOptions(chunk_size=4, num_left_chunks=2, beam_size=3)
    cfg = StreamingConfig(decoding_chunk_size=4,
                          num_decoding_left_chunks=2,
                          subsampling_rate=model.encoder.subsampling_rate,
                          right_context=model.encoder.right_context)
    runner = BatchedChunkRunner(model, variables, cfg, max_batch=4,
                                flush_ms=2.0)
    rng = np.random.RandomState(0)
    wav = (0.2 * rng.randn(16000)).astype(np.float32)

    def run(dec):
        for i in range(0, len(wav), 3200):
            dec.accept_waveform(wav[i:i + 3200])
            dec.decode()
        dec.set_input_finished()
        dec.decode()
        dec.rescoring()
        return dec.result[0].sentence

    try:
        a = run(AsrDecoder(model, variables, tokenizer, opts,
                           batch_runner=runner))
        b = run(AsrDecoder(model, variables, tokenizer, opts))
        assert a == b
    finally:
        runner.close()


def test_native_beam_topk_equals_dense():
    """The sparse (device-top-k) entry is bit-identical to the dense
    path — the beam only ever considers the per-frame top-k."""
    from wenet_tpu.runtime import native_beam
    if not native_beam.available():
        pytest.skip('libctc_beam.so not built')
    rng = np.random.RandomState(7)
    T, V, K = 50, 30, 8
    x = (rng.randn(T, V) * 3).astype(np.float32)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    dense = native_beam.NativeCtcPrefixBeamSearch(K)
    dense.search(logp)
    idx = np.argsort(-logp, axis=-1)[:, :K].astype(np.int32)
    vals = np.take_along_axis(logp, idx, axis=-1)
    sparse = native_beam.NativeCtcPrefixBeamSearch(K)
    sparse.search_topk(vals, idx)
    assert dense.hypotheses == sparse.hypotheses
    np.testing.assert_allclose(dense.likelihood, sparse.likelihood,
                               atol=1e-5)
    assert dense.times == sparse.times


def test_runner_prefix_beam_native_matches_device_scan():
    """models/runner._prefix_beam (device top-k + C++ beam) returns the
    same n-best as the all-device lax.scan formulation."""
    from wenet_tpu.runtime import native_beam
    if not native_beam.available():
        pytest.skip('libctc_beam.so not built')
    import jax.numpy as jnp
    from wenet_tpu.models.runner import AsrRunner
    from wenet_tpu.models.transformer.search import (
        ctc_prefix_beam_search)
    rng = np.random.RandomState(11)
    B, T, V, K = 3, 60, 40, 6
    # sharp logits: no vocabulary ties, so top-k selection order can't
    # differ between jax and C++
    x = (rng.randn(B, T, V) * 4).astype(np.float32)
    logp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))
    lens = jnp.asarray([60, 45, 30])

    dev = ctc_prefix_beam_search(logp, lens, K, None, 0)

    runner = AsrRunner.__new__(AsrRunner)  # only needs _jitted
    runner._jitted = {}
    nat = runner._prefix_beam(logp, lens, K, None, 0)
    for b in range(B):
        assert nat[b].tokens == dev[b].tokens, f'utt {b}'
        assert nat[b].times == dev[b].times, f'utt {b}'
        np.testing.assert_allclose(nat[b].score, dev[b].score,
                                   atol=1e-3)
        assert [tuple(h) for h in nat[b].nbest] == \
            [tuple(h) for h in dev[b].nbest], f'utt {b}'


# ---------------------------------------------------------------------------
# server robustness (VERDICT r2 item 10): malformed frames, mid-
# utterance disconnects and misbehaving siblings must kill neither the
# server nor other sessions (ref per-connection isolation:
# runtime/core/websocket/websocket_server.cc:42-118)
# ---------------------------------------------------------------------------
def test_websocket_malformed_frames(streaming_model):
    websockets = pytest.importorskip('websockets')
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.runtime.websocket.server import ConnectionHandler
    model, variables, tokenizer = streaming_model

    def factory():
        return AsrDecoder(model, variables, tokenizer,
                          DecodeOptions(chunk_size=4, num_left_chunks=2,
                                        beam_size=3))

    async def run():
        async def handle(ws):
            await ConnectionHandler(ws, factory).run()

        async with websockets.serve(handle, '127.0.0.1', 0) as server:
            port = server.sockets[0].getsockname()[1]
            uri = f'ws://127.0.0.1:{port}'
            out = []
            async with websockets.connect(uri) as ws:
                # 1. binary before start -> failed, connection alive
                await ws.send(b'\x01\x02\x03\x04')
                out.append(json.loads(await ws.recv()))
                # 2. malformed json -> failed, connection alive
                await ws.send('{not json')
                out.append(json.loads(await ws.recv()))
                # 3. end before start -> failed, connection alive
                await ws.send(json.dumps({'signal': 'end'}))
                out.append(json.loads(await ws.recv()))
                # 4. unknown signal -> failed, connection alive
                await ws.send(json.dumps({'signal': 'bogus'}))
                out.append(json.loads(await ws.recv()))
                # 5. proper session STILL works on the same connection
                await ws.send(json.dumps({'signal': 'start',
                                          'nbest': 1}))
                out.append(json.loads(await ws.recv()))
                pcm = (np.random.RandomState(0).randn(6400) *
                       3000).astype('<i2')
                # odd-length binary frame (dangling byte) mid-stream
                await ws.send(pcm.tobytes() + b'\x00')
                await ws.send(json.dumps({'signal': 'end'}))
                while True:
                    msg = json.loads(await ws.recv())
                    out.append(msg)
                    if msg.get('type') == 'speech_end':
                        break
            return out

    out = asyncio.run(run())
    assert [m['status'] for m in out[:4]] == ['failed'] * 4
    assert out[4]['type'] == 'server_ready'
    types = [m.get('type') for m in out[4:]]
    assert 'final_result' in types and types[-1] == 'speech_end'


def test_websocket_disconnect_and_sibling_survival(streaming_model):
    """One client disconnects mid-utterance and another sends garbage;
    a concurrent well-behaved session must still complete."""
    websockets = pytest.importorskip('websockets')
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.runtime.websocket.client import transcribe_streaming
    from wenet_tpu.runtime.websocket.server import ConnectionHandler
    model, variables, tokenizer = streaming_model

    def factory():
        return AsrDecoder(model, variables, tokenizer,
                          DecodeOptions(chunk_size=4, num_left_chunks=2,
                                        beam_size=3))

    async def run():
        async def handle(ws):
            await ConnectionHandler(ws, factory).run()

        async with websockets.serve(handle, '127.0.0.1', 0) as server:
            port = server.sockets[0].getsockname()[1]
            uri = f'ws://127.0.0.1:{port}'
            rng = np.random.RandomState(1)

            async def dropper():
                # starts an utterance, sends one chunk, vanishes
                ws = await websockets.connect(uri)
                await ws.send(json.dumps({'signal': 'start'}))
                await ws.recv()
                pcm = (rng.randn(3200) * 3000).astype('<i2')
                await ws.send(pcm.tobytes())
                await ws.close(code=1001)  # going away, mid-utterance

            async def vandal():
                ws = await websockets.connect(uri)
                await ws.send('\x00\xff garbage')
                await ws.recv()
                await ws.close()

            async def honest():
                wav = (0.2 * rng.randn(12000)).astype(np.float32)
                return await transcribe_streaming(uri, wav,
                                                  chunk_ms=200)

            results = await asyncio.gather(dropper(), vandal(),
                                           honest())
            return results[2]

    msgs = asyncio.run(run())
    types = [m.get('type') for m in msgs]
    assert types[0] == 'server_ready'
    assert 'final_result' in types
    assert types[-1] == 'speech_end'


def test_grpc_bad_stream_then_good(streaming_model):
    """An RPC that sends audio before decode_config fails alone; the
    server keeps serving the next (well-formed) stream."""
    grpc = pytest.importorskip('grpc')
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.runtime.grpc import wenet_pb2
    from wenet_tpu.runtime.grpc.server import (make_server,
                                               recognize_stream)
    model, variables, tokenizer = streaming_model

    def factory():
        return AsrDecoder(model, variables, tokenizer,
                          DecodeOptions(chunk_size=4, num_left_chunks=2,
                                        beam_size=3))

    server = make_server(factory, 0)
    port = server.add_insecure_port('127.0.0.1:0')
    server.start()
    try:
        with grpc.insecure_channel(f'127.0.0.1:{port}') as ch:
            stub = ch.unary_stream(
                '/wenet.ASR/Recognize',
                request_serializer=wenet_pb2.Request.SerializeToString,
                response_deserializer=wenet_pb2.Response.FromString)
            # audio with no prior decode_config: RPC errors, server ok
            bad = wenet_pb2.Request(audio_data=b'\x00\x01' * 100)
            with pytest.raises(grpc.RpcError):
                list(ch.stream_stream(
                    '/wenet.ASR/Recognize',
                    request_serializer=(
                        wenet_pb2.Request.SerializeToString),
                    response_deserializer=(
                        wenet_pb2.Response.FromString))(iter([bad])))
            del stub
            # a good stream on the same server still completes
            rng = np.random.RandomState(0)
            pcm = (rng.randn(12000) * 3000).astype('<i2')
            chunks = [pcm[i:i + 3200].tobytes()
                      for i in range(0, len(pcm), 3200)]
            responses = recognize_stream(ch, chunks)
            types = [r.type for r in responses]
            assert types[0] == wenet_pb2.Response.server_ready
            assert types[-1] == wenet_pb2.Response.speech_end
    finally:
        server.stop(0)
