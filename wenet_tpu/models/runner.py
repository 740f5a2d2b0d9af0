"""AsrRunner: bound (module, variables) with cached jitted methods.

The torch reference calls bound nn.Module methods (asr_model.py:267-343
decode dispatch); the linen equivalent needs apply + jit caching, which
this wrapper centralizes for recognize.py / the CLI / servers.
"""

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wenet_tpu.models.transformer.search import (DecodeResult,
                                                 attention_beam_search,
                                                 attention_rescoring,
                                                 ctc_greedy_search,
                                                 ctc_prefix_beam_search)


class AsrRunner:

    def __init__(self, model, variables, dtype=None,
                 use_flash_attention: bool = True,
                 quantize: bool = False, mesh=None,
                 data_axis: str = 'data'):
        """quantize=True stores weights int8 (per-channel, weight-only
        — the quantized-export analog, ref export_jit.py:39-60);
        dequantization fuses into the jitted programs.

        mesh: optional jax.sharding.Mesh for DATA-PARALLEL batch
        decode — params are replicated, every batch shards its leading
        dim over `data_axis`, and the fused decode programs compile
        once for the whole slice (GSPMD propagates the shardings; no
        collectives are needed for inference).  One program then
        serves a pod slice instead of one chip.  Ragged batches are
        padded to the axis multiple (repeat-last-row) and trimmed
        after finalize.  No reference analog — the ref C++
        runtime decodes per-connection on CPU
        (runtime/core/decoder/asr_decoder.cc); this is TPU-native
        scale-out.  Hypothesis-identity vs single-device is tested in
        tests/test_sharded_decode.py."""
        self.model = model
        if dtype is not None and not quantize:
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if hasattr(x, 'dtype') and jnp.issubdtype(
                    x.dtype, jnp.floating) else x, variables)
        self._quant = None
        if quantize:
            from wenet_tpu.ops.quant import quantize_int8
            qvars, scales = quantize_int8(variables)
            self._quant = (jax.device_put(qvars),
                           jax.device_put(scales),
                           dtype or jnp.bfloat16)
            variables = qvars  # placeholder; _fn dequantizes
        # params must live on device: numpy-leaved pytrees would be
        # re-uploaded on every jitted call (catastrophic over remote
        # TPU links)
        self._mesh = mesh
        self._batch_sharding = None
        self._data_axis_size = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.variables = jax.device_put(
                variables, NamedSharding(mesh, P()))
            self._batch_sharding = NamedSharding(mesh, P(data_axis))
            self._data_axis_size = int(mesh.shape[data_axis])
        else:
            self.variables = jax.device_put(variables)
        self._jitted: Dict[str, object] = {}
        self._fp_cache = None
        if use_flash_attention:
            # inference-only pallas kernel (dispatch is a no-op off-TPU
            # and below min_len; training paths keep the XLA attention,
            # which has the autodiff rules)
            from wenet_tpu.models.transformer.attention import (
                enable_flash_attention)
            # 512 threshold: flash wins at whisper-scale T (1.6x at
            # T=1500) but XLA's fused attention is faster at the
            # conformer's post-subsampling T~400 (measured on v5e)
            enable_flash_attention(True, min_len=512)

    def _put_batch(self, feats, feats_lengths):
        """Upload one (feats, lengths) batch; under a mesh, commit the
        leading dim to the data axis so the jitted programs compile
        data-parallel across the slice.

        Ragged batches (B not a multiple of the data-axis size — e.g.
        a dataset's final batch) are padded by repeating the last row
        so every device gets equal rows; `_pipeline` trims the pad
        rows from each finalized result list."""
        if self._batch_sharding is None:
            return jnp.asarray(feats), jnp.asarray(feats_lengths)
        pad = (-int(np.shape(feats)[0])) % self._data_axis_size
        if pad:
            feats = np.asarray(feats)
            feats_lengths = np.asarray(feats_lengths)
            feats = np.concatenate(
                [feats, np.repeat(feats[-1:], pad, axis=0)], axis=0)
            feats_lengths = np.concatenate(
                [feats_lengths,
                 np.repeat(feats_lengths[-1:], pad, axis=0)], axis=0)
        return (jax.device_put(feats, self._batch_sharding),
                jax.device_put(feats_lengths, self._batch_sharding))

    def _maybe_dequant(self, variables):
        if self._quant is None:
            return variables
        from wenet_tpu.ops.quant import dequantize
        _, scales, dtype = self._quant
        return dequantize(variables, scales, dtype)

    def _variables_fp(self):
        """Full-precision (bf16) copy for paths that take variables
        opaquely (AR beam search / rescoring); cached on device."""
        if self._quant is None:
            return self.variables
        if self._fp_cache is None:
            self._fp_cache = jax.device_put(jax.jit(
                self._maybe_dequant)(self.variables))
        return self._fp_cache

    def _fn(self, name):
        if name not in self._jitted:
            model = self.model
            method = getattr(model, name)
            quant = self._quant

            del quant

            def fn(variables, *args):
                return model.apply(self._maybe_dequant(variables),
                                   *args, method=method)

            self._jitted[name] = jax.jit(fn)
        return self._jitted[name]

    # ------------------------------------------------------------------
    def forward_encoder(self, feats, feats_lengths,
                        decoding_chunk_size: int = -1,
                        num_decoding_left_chunks: int = -1,
                        simulate_streaming: bool = False):
        if simulate_streaming and decoding_chunk_size > 0:
            from wenet_tpu.models.transformer.streaming import (
                StreamingConfig, forward_chunk_by_chunk)
            cfg = StreamingConfig(
                decoding_chunk_size=decoding_chunk_size,
                num_decoding_left_chunks=num_decoding_left_chunks,
                subsampling_rate=self.model.encoder.subsampling_rate,
                right_context=self.model.encoder.right_context)
            return forward_chunk_by_chunk(self.model,
                                          self._variables_fp(),
                                          feats, cfg)
        # full-context (or chunk-masked) forward
        model = self.model
        key = f'_fwd_enc_{decoding_chunk_size}_{num_decoding_left_chunks}'
        if key not in self._jitted:

            def fn(variables, feats, feats_lengths):
                return model.apply(self._maybe_dequant(variables),
                                   feats, feats_lengths,
                                   decoding_chunk_size,
                                   num_decoding_left_chunks,
                                   method=model.forward_encoder)

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key](self.variables, feats, feats_lengths)

    def _encode_ctc(self, feats, feats_lengths,
                    decoding_chunk_size: int,
                    num_decoding_left_chunks: int,
                    blank_penalty: float, blank_id: int):
        """Encoder forward + CTC log-softmax as ONE program: a single
        dispatch/roundtrip instead of two (the ~27ms ctc_logprobs hop
        was pure program-boundary overhead in the offline decode
        pipeline)."""
        model = self.model
        key = ('_enc_ctc', decoding_chunk_size,
               num_decoding_left_chunks, blank_penalty, blank_id)
        if key not in self._jitted:

            def fn(variables, feats, feats_lengths):
                v = self._maybe_dequant(variables)
                eo, em = model.apply(v, feats, feats_lengths,
                                     decoding_chunk_size,
                                     num_decoding_left_chunks,
                                     method=model.forward_encoder)
                logp = model.apply(v, eo, blank_penalty, blank_id,
                                   method=model.ctc_logprobs)
                return eo, em, logp

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key](self.variables, feats, feats_lengths)

    def ctc_logprobs(self, encoder_out, blank_penalty: float = 0.0,
                     blank_id: int = 0):
        model = self.model
        key = f'_ctc_logp_{blank_penalty}_{blank_id}'
        if key not in self._jitted:

            def fn(variables, encoder_out):
                return model.apply(self._maybe_dequant(variables),
                                   encoder_out, blank_penalty,
                                   blank_id, method=model.ctc_logprobs)

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key](self.variables, encoder_out)

    # ------------------------------------------------------------------
    def _prefix_beam(self, ctc_probs, encoder_lens, beam_size,
                     context_graph, blank_id):
        """CTC prefix beam: device top-k (one cheap parallel kernel) +
        the C++ incremental searcher over utterances in threads —
        including context-graph biasing, which runs INSIDE the C++ hot
        loop (ref runtime/core/decoder/ctc_prefix_beam_search.h:35-125);
        falls back to the all-device lax.scan / python-biased searcher
        only when the native lib is missing.

        Exactly equivalent: the reference beam only considers the
        per-frame top-k tokens (ref search.py:146), so the sparse hand-
        off loses nothing, and the sequential host search was tested
        token-identical to the reference dict implementation.  The
        device scan spends ~1.2ms/frame on tiny serialized kernels
        (the formulation is elegant but latency-bound); the C++ beam
        runs the whole 375-frame utterance in ~2ms."""
        from wenet_tpu.runtime import native_beam
        if native_beam.available():
            key = ('ctc_topk', int(beam_size))
            if key not in self._jitted:
                # scan-over-T formulation: XLA's batched top_k scales
                # badly with the leading dim on TPU (~2x slower when
                # given all B*T rows at once)
                def _topk(p):
                    _, out = jax.lax.scan(
                        lambda _, f: (0., jax.lax.top_k(f, beam_size)),
                        0., jnp.swapaxes(p, 0, 1))
                    return out  # (T, B, K)
                self._jitted[key] = jax.jit(_topk)
            vals, ids, lens = jax.device_get(
                (*self._jitted[key](ctc_probs), encoder_lens))
            vals = vals.swapaxes(0, 1)
            ids = ids.swapaxes(0, 1)
            outs = native_beam.batch_search_topk(
                vals, ids, lens, beam_size, blank_id,
                context_graph=context_graph)
            results = []
            for hyps, times, scores in outs:
                results.append(DecodeResult(
                    tokens=hyps[0], score=scores[0], times=times[0],
                    nbest=hyps, nbest_scores=scores,
                    nbest_times=times))
            return results
        return ctc_prefix_beam_search(ctc_probs, encoder_lens,
                                      beam_size, context_graph,
                                      blank_id)

    def decode(self,
               methods: List[str],
               feats,
               feats_lengths,
               beam_size: int = 10,
               decoding_chunk_size: int = -1,
               num_decoding_left_chunks: int = -1,
               ctc_weight: float = 0.0,
               simulate_streaming: bool = False,
               reverse_weight: float = 0.0,
               context_graph=None,
               blank_id: int = 0,
               blank_penalty: float = 0.0,
               length_penalty: float = 0.0,
               infos: Optional[Dict[str, List[str]]] = None,
               rnnt_n_steps: int = 64
               ) -> Dict[str, List[DecodeResult]]:
        """ref: asr_model.py:267-343.

        rnnt_n_steps: per-frame non-blank emission budget for
        rnnt_greedy_search (ref transducer.py:398 n_steps=64).  NB the
        scan also has a TOTAL budget of 2*T steps (transducer.py
        greedy_search max_steps — the static-shape TPU formulation);
        with trained weights emissions ~U << T and neither bound
        binds, but under random weights only n_steps=1 makes the two
        budgets equivalent (tools/parity_decode.py pins it)."""
        feats = jnp.asarray(feats)
        feats_lengths = jnp.asarray(feats_lengths)
        if hasattr(self.model, 'forward_paraformer'):
            return self._decode_paraformer(methods, feats, feats_lengths,
                                           beam_size, context_graph,
                                           blank_id, blank_penalty)
        needs_ctc = any(m.startswith('ctc_') or m == 'attention_rescoring'
                        for m in methods)
        if needs_ctc and not simulate_streaming:
            encoder_out, encoder_mask, ctc_probs = self._encode_ctc(
                feats, feats_lengths, decoding_chunk_size,
                num_decoding_left_chunks, blank_penalty, blank_id)
        else:
            encoder_out, encoder_mask = self.forward_encoder(
                feats, feats_lengths, decoding_chunk_size,
                num_decoding_left_chunks, simulate_streaming)
            ctc_probs = (self.ctc_logprobs(encoder_out, blank_penalty,
                                           blank_id)
                         if needs_ctc else None)
        encoder_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1)
        results: Dict[str, List[DecodeResult]] = {}
        if 'rnnt_greedy_search' in methods:
            tokens, n_emit = self._fn('greedy_search')(
                self.variables, encoder_out, encoder_lens,
                jnp.asarray(rnnt_n_steps, jnp.int32))
            tokens, n_emit = np.asarray(tokens), np.asarray(n_emit)
            blank = getattr(self.model, 'blank', 0)
            results['rnnt_greedy_search'] = [
                DecodeResult(tokens=[int(t) for t in
                                     tokens[b, :n_emit[b]]
                                     if int(t) != blank])
                for b in range(tokens.shape[0])
            ]
        if 'rnnt_beam_search' in methods:
            model = self.model

            if 'rnnt_beam' not in self._jitted:
                self._jitted['rnnt_beam'] = jax.jit(
                    lambda v, e, el: model.apply(
                        self._maybe_dequant(v), e, el, beam_size,
                        method=model.beam_search))
            tokens, lens, scores = self._jitted['rnnt_beam'](
                self.variables, encoder_out, encoder_lens)
            tokens = np.asarray(tokens)
            lens = np.asarray(lens)
            scores = np.asarray(scores)
            results['rnnt_beam_search'] = [
                DecodeResult(
                    tokens=[int(t) for t in tokens[b, 0, :lens[b, 0]]],
                    score=float(scores[b, 0]),
                    nbest=[[int(t) for t in tokens[b, k, :lens[b, k]]]
                           for k in range(tokens.shape[1])],
                    nbest_scores=[float(sc) for sc in scores[b]])
                for b in range(tokens.shape[0])
            ]
        if 'attention' in methods:
            results['attention'] = attention_beam_search(
                self.model, self._variables_fp(), encoder_out,
                encoder_mask, beam_size, length_penalty, infos)
        if 'ctc_greedy_search' in methods:
            results['ctc_greedy_search'] = ctc_greedy_search(
                ctc_probs, encoder_lens, blank_id)
        need_prefix = ('ctc_prefix_beam_search' in methods or
                       'attention_rescoring' in methods)
        if need_prefix:
            ctc_prefix_result = self._prefix_beam(
                ctc_probs, encoder_lens, beam_size, context_graph,
                blank_id)
            if 'ctc_prefix_beam_search' in methods:
                results['ctc_prefix_beam_search'] = ctc_prefix_result
        if 'attention_rescoring' in methods:
            results['attention_rescoring'] = attention_rescoring(
                self.model, self._variables_fp(), ctc_prefix_result,
                encoder_out, encoder_lens, ctc_weight, reverse_weight,
                infos)
        return results

    # ------------------------------------------------------------------
    def _encode_ctc_topk(self, feats, feats_lengths, beam_size: int,
                         blank_penalty: float, blank_id: int):
        """Encoder + chunked CTC head + per-frame top-k as ONE program
        (one dispatch round-trip; the rescoring pipeline only needs the
        sparse top-k on host, and with the chunked head (ctc.py
        topk_chunked) the dense (B, T, V) posterior never exists even
        on device).  top-k outputs are (B, T', K)."""
        model = self.model
        key = ('_enc_ctc_topk', int(beam_size), float(blank_penalty),
               int(blank_id))
        if key not in self._jitted:

            def fn(variables, feats, feats_lengths):
                v = self._maybe_dequant(variables)
                eo, em = model.apply(v, feats, feats_lengths, -1, -1,
                                     method=model.forward_encoder)
                vals, ids = model.apply(v, eo, beam_size, blank_penalty,
                                        blank_id, method=model.ctc_topk)
                lens = jnp.sum(em[:, 0, :], axis=-1)
                return eo, lens, vals, ids

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key](self.variables, feats, feats_lengths)

    def decode_rescoring_batches(self, batches, beam_size: int = 10,
                                 ctc_weight: float = 0.0,
                                 reverse_weight: float = 0.0,
                                 blank_id: int = 0,
                                 blank_penalty: float = 0.0,
                                 context_graph=None,
                                 infos=None):
        """Software-pipelined attention_rescoring over an iterable of
        (feats, feats_lengths) batches.  Yields one List[DecodeResult]
        per input batch, in order.

        Three stages run concurrently in steady state:
          device: encoder+CTC+top-k for batch i+1  ‖  rescoring program
                  for batch i-1 (single in-order device queue)
          host:   C++ trie prefix beam for batch i
          link:   top-k / rescore fetches in a background thread (each
                  fetch costs a full RTT through remote-TPU tunnels —
                  overlapping it with the host beam hides it)

        The sequential path (runner.decode) pays all three in series
        per batch (ref analog: recognize.py's per-batch loop around
        search.py:374-458).
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from wenet_tpu.models.transformer.search import (
            attention_rescoring_dispatch, attention_rescoring_finalize)
        from wenet_tpu.runtime import native_beam

        if not native_beam.available():
            for feats, feats_lengths in batches:
                yield self.decode(
                    ['attention_rescoring'], feats, feats_lengths,
                    beam_size=beam_size, ctc_weight=ctc_weight,
                    reverse_weight=reverse_weight, blank_id=blank_id,
                    blank_penalty=blank_penalty,
                    context_graph=context_graph,
                    infos=infos)['attention_rescoring']
            return

        # two workers so the top-k fetch (stage 1→2 hand-off) and the
        # rescore-output fetch (stage 3) overlap instead of queuing on
        # one thread — each costs a full link RTT
        ex = ThreadPoolExecutor(max_workers=2)
        enc_q = deque()   # dispatched encode stages awaiting beam
        res_q = deque()   # dispatched rescore stages awaiting finalize
        try:
            def advance(entry):
                """topk fetched -> host beam -> dispatch rescore."""
                vals, ids, lens = entry['topk'].result()  # (B, T', K)
                outs = native_beam.batch_search_topk(
                    vals, ids, lens,
                    beam_size, blank_id, context_graph=context_graph)
                prefix = [DecodeResult(tokens=h[0], score=s[0],
                                       times=t[0], nbest=h,
                                       nbest_scores=s, nbest_times=t)
                          for h, t, s in outs]
                dev = attention_rescoring_dispatch(
                    self.model, self._variables_fp(), prefix,
                    entry['eo'], entry['lens_d'], ctc_weight,
                    reverse_weight, infos)
                res_q.append({'prefix': prefix,
                              'out': ex.submit(jax.device_get, dev)})

            for feats, feats_lengths in batches:
                feats = jnp.asarray(feats)
                feats_lengths = jnp.asarray(feats_lengths)
                eo, lens_d, vals, ids = self._encode_ctc_topk(
                    feats, feats_lengths, beam_size, blank_penalty,
                    blank_id)
                enc_q.append({
                    'eo': eo, 'lens_d': lens_d,
                    'topk': ex.submit(jax.device_get,
                                      (vals, ids, lens_d)),
                })
                # keep at most one batch in each in-flight stage
                while len(enc_q) > 1:
                    advance(enc_q.popleft())
                while len(res_q) > 1:
                    e = res_q.popleft()
                    yield attention_rescoring_finalize(
                        e['prefix'], e['out'].result())
            while enc_q:
                advance(enc_q.popleft())
            while res_q:
                e = res_q.popleft()
                yield attention_rescoring_finalize(e['prefix'],
                                                   e['out'].result())
        finally:
            ex.shutdown(wait=False)

    # ------------------------------------------------------------------
    def decode_wav(self, methods, wav, wav_lengths, sample_rate=16000,
                   num_mel_bins: int = 80, **kw):
        """Decode raw waveform batches with the fbank computed
        ON-DEVICE, fused into the encoder program (SURVEY §7 stage 8
        fused front end; only ~7% of wall time at B16x15s on v5e)."""
        from wenet_tpu.ops.fbank import compute_fbank
        model = self.model
        key = f'_wav_feats_{num_mel_bins}_{sample_rate}'
        if key not in self._jitted:

            def fn(wav):
                return compute_fbank(wav * (1 << 15),
                                     num_mel_bins=num_mel_bins,
                                     sample_rate=sample_rate)

            self._jitted[key] = jax.jit(fn)
        feats = self._jitted[key](jnp.asarray(wav))
        frame_shift = sample_rate // 100
        flen = jnp.minimum(
            jnp.maximum((jnp.asarray(wav_lengths) -
                         sample_rate * 25 // 1000) // frame_shift + 1,
                        0), feats.shape[1])
        return self.decode(methods, feats, flen, **kw)

    # ------------------------------------------------------------------
    def transcribe(self, wav_path: str, tokenizer=None,
                   compute_feature=None, method: Optional[str] = None):
        """CLI one-shot path. ref: asr_model.py:345-358."""
        assert compute_feature is not None
        feats = compute_feature(wav_path)
        feats = jnp.asarray(feats)[None, ...]
        lengths = jnp.asarray([feats.shape[1]])
        method = method or self.model.default_decode_method
        results = self.decode([method], feats, lengths)
        result = results[method][0]
        if tokenizer is not None:
            result.text = tokenizer.detokenize(list(result.tokens))[0]
        return result

    # ------------------------------------------------------------------
    def _ctc_greedy_pipeline_fn(self, blank_penalty: float,
                                blank_id: int):
        """Encoder + chunked CTC head + argmax as ONE program — only the
        (B, T') ids and lengths ever reach the host, and the (B, T', V)
        posterior never exists on device either (ctc.py argmax_chunked;
        the dense posterior was the VMEM-spill cliff past B=32)."""
        key = ('_ctc_greedy_pipe', float(blank_penalty), int(blank_id))
        if key not in self._jitted:
            model = self.model

            def fn(variables, feats, feats_lengths):
                v = self._maybe_dequant(variables)
                eo, em = model.apply(v, feats, feats_lengths, -1, -1,
                                     method=model.forward_encoder)
                ids = model.apply(v, eo, blank_penalty, blank_id,
                                  method=model.ctc_argmax)
                lens = jnp.sum(em[:, 0, :], axis=-1)
                ids = jnp.where(
                    jnp.arange(ids.shape[1])[None, :] < lens[:, None],
                    ids, blank_id)
                return ids, lens

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    @staticmethod
    def _pipeline(batches, dispatch, finalize, depth: int = 6,
                  fetch_workers: int = 4):
        """Dispatch-ahead pipeline shared by the batch decode modes:
        `dispatch(item) -> (device_arrays, ctx)` runs un-blocked (the
        single in-order device queue executes batch i while i+1
        dispatches), result fetches ride a small worker pool (each
        fetch costs a full link RTT — with ONE worker the fetches
        serialize and bound the whole pipeline: measured 8.3k vs 28.4k
        audio-sec/s on the greedy path — order is preserved by the
        futures queue), and `finalize(fetched, ctx)` runs on the host
        while younger batches execute.

        Under a mesh, `_put_batch` may pad a ragged batch to the
        data-axis multiple; each finalized row-aligned result list is
        trimmed back to the item's true row count here."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(max_workers=fetch_workers)
        q = deque()

        def _trim(res, n):
            return res[:n] if isinstance(res, list) else res

        try:
            for item in batches:
                n_real = int(np.shape(item[1])[0])
                dev, ctx = dispatch(item)
                q.append((ex.submit(jax.device_get, dev), ctx, n_real))
                while len(q) > depth:
                    fut, c, n = q.popleft()
                    yield _trim(finalize(fut.result(), c), n)
            while q:
                fut, c, n = q.popleft()
                yield _trim(finalize(fut.result(), c), n)
        finally:
            ex.shutdown(wait=False)

    def decode_ctc_greedy_batches(self, batches, blank_id: int = 0,
                                  blank_penalty: float = 0.0):
        """Software-pipelined CTC greedy decode over an iterable of
        (feats, feats_lengths) batches; yields one List[DecodeResult]
        per batch, in order.  Results identical to
        decode(['ctc_greedy_search'], ...) (tested); recognize.py rides
        this for greedy-only runs (ref analog: recognize.py's per-batch
        loop around search.py:109-124)."""
        from wenet_tpu.models.transformer.search import (
            DecodeResult, remove_duplicates_and_blank)

        fn = self._ctc_greedy_pipeline_fn(blank_penalty, blank_id)

        def dispatch(item):
            feats, feats_lengths = self._put_batch(*item)
            return fn(self.variables, feats, feats_lengths), None

        def finalize(fetched, _):
            return [DecodeResult(
                remove_duplicates_and_blank(list(h), blank_id))
                for h in fetched[0]]

        yield from self._pipeline(batches, dispatch, finalize)

    # ------------------------------------------------------------------
    def _enc_topk_pipeline_fn(self, beam_size: int,
                              blank_penalty: float, blank_id: int):
        """Encoder + chunked CTC head + per-frame top-k as ONE program,
        without the encoder-out output buffer (`_encode_ctc_topk` keeps
        it for the rescoring program; prefix-beam-only decode never
        needs it on host or device again).  The head is computed in
        T-chunks (ctc.py topk_chunked) so the (B, T', V) posterior is
        never materialized; outputs are (B, T', K)."""
        key = ('_enc_topk_pipe', int(beam_size), float(blank_penalty),
               int(blank_id))
        if key not in self._jitted:
            model = self.model

            def fn(variables, feats, feats_lengths):
                v = self._maybe_dequant(variables)
                eo, em = model.apply(v, feats, feats_lengths, -1, -1,
                                     method=model.forward_encoder)
                vals, ids = model.apply(v, eo, beam_size, blank_penalty,
                                        blank_id, method=model.ctc_topk)
                lens = jnp.sum(em[:, 0, :], axis=-1)
                return vals, ids, lens

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def decode_prefix_beam_batches(self, batches, beam_size: int = 10,
                                   blank_id: int = 0,
                                   blank_penalty: float = 0.0,
                                   context_graph=None):
        """Software-pipelined CTC prefix beam search over an iterable
        of (feats, feats_lengths) batches; yields one
        List[DecodeResult] per batch, in order.  Device encoder+CTC+
        top-k for batch i+1 ‖ background top-k fetch for batch i ‖
        host C++ trie beam for batch i-1 (context biasing rides the
        C++ hot loop).  Results identical to
        decode(['ctc_prefix_beam_search'], ...) (tested)."""
        from wenet_tpu.runtime import native_beam

        if not native_beam.available():
            for feats, feats_lengths in batches:
                yield self.decode(
                    ['ctc_prefix_beam_search'], feats, feats_lengths,
                    beam_size=beam_size, blank_id=blank_id,
                    blank_penalty=blank_penalty,
                    context_graph=context_graph,
                )['ctc_prefix_beam_search']
            return

        fn = self._enc_topk_pipeline_fn(beam_size, blank_penalty,
                                        blank_id)

        def dispatch(item):
            feats, feats_lengths = self._put_batch(*item)
            return fn(self.variables, feats, feats_lengths), None

        def finalize(fetched, _):
            vals, ids, lens = fetched  # already (B, T', K)
            outs = native_beam.batch_search_topk(
                vals, ids, lens,
                beam_size, blank_id, context_graph=context_graph)
            return [DecodeResult(tokens=h[0], score=s[0], times=t[0],
                                 nbest=h, nbest_scores=s,
                                 nbest_times=t)
                    for h, t, s in outs]

        yield from self._pipeline(batches, dispatch, finalize)

    # ------------------------------------------------------------------
    def decode_attention_batches(self, batches, beam_size: int = 10,
                                 length_penalty: float = 0.0):
        """Software-pipelined AR attention beam decode over an iterable
        of (feats, feats_lengths) or (feats, feats_lengths, infos)
        batches (infos = whisper-style {'tasks': [...], 'langs': [...]}
        prompts); yields one List[DecodeResult] per batch, in order.
        Encoder + while_loop beam programs for batch i+1 dispatch while
        batch i's (hyps, scores) fetch rides the worker pool and batch
        i-1 strips prompts on host.  Results identical to
        decode(['attention'], ...) (tested); recognize.py rides this
        for attention-only runs (incl. whisper)."""
        from wenet_tpu.models.transformer.search import (
            attention_beam_dispatch, attention_beam_finalize)

        def dispatch(item):
            feats, feats_lengths = item[0], item[1]
            infos = item[2] if len(item) > 2 else None
            n_real = int(np.shape(feats)[0])
            feats, feats_lengths = self._put_batch(feats,
                                                   feats_lengths)
            if infos is not None and feats.shape[0] > n_real:
                # ragged batch was padded to the data-axis multiple:
                # repeat the last prompt row to match (_pipeline trims
                # the pad rows from the finalized results)
                infos = {k: list(v) + [v[-1]] * (feats.shape[0] - n_real)
                         for k, v in infos.items()}
            eo, em = self.forward_encoder(feats, feats_lengths)
            dev, plen = attention_beam_dispatch(
                self.model, self._variables_fp(), eo, em,
                beam_size, length_penalty, infos)
            return dev, plen

        def finalize(fetched, plen):
            return attention_beam_finalize(self.model, fetched, plen)

        yield from self._pipeline(batches, dispatch, finalize)

    # ------------------------------------------------------------------
    def _rnnt_greedy_pipeline_fn(self):
        """Encoder + on-device transducer greedy loop as ONE program —
        only the (B, U) emitted tokens and counts reach the host."""
        key = '_rnnt_greedy_pipe'
        if key not in self._jitted:
            model = self.model

            def fn(variables, feats, feats_lengths):
                v = self._maybe_dequant(variables)
                eo, em = model.apply(v, feats, feats_lengths, -1, -1,
                                     method=model.forward_encoder)
                lens = jnp.sum(em[:, 0, :], axis=-1)
                tokens, n_emit = model.apply(v, eo, lens,
                                             method=model.greedy_search)
                return tokens, n_emit

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def decode_rnnt_greedy_batches(self, batches):
        """Software-pipelined transducer greedy decode over an iterable
        of (feats, feats_lengths) batches; yields one
        List[DecodeResult] per batch, in order.  Results identical to
        decode(['rnnt_greedy_search'], ...) (tested); recognize.py
        rides this for rnnt-greedy-only runs (ref analog:
        wenet/models/transducer/search/greedy_search.py)."""
        fn = self._rnnt_greedy_pipeline_fn()
        blank = getattr(self.model, 'blank', 0)

        def dispatch(item):
            feats, feats_lengths = self._put_batch(*item)
            return fn(self.variables, feats, feats_lengths), None

        def finalize(fetched, _):
            tokens, n_emit = fetched
            return [
                DecodeResult(tokens=[int(t) for t in
                                     tokens[b, :n_emit[b]]
                                     if int(t) != blank])
                for b in range(tokens.shape[0])
            ]

        yield from self._pipeline(batches, dispatch, finalize)

    # ------------------------------------------------------------------
    def _paraformer_pipeline_fn(self, need_peaks: bool):
        """ONE jitted program per batch for the pipelined NAR decode:
        forward_paraformer + cif peaks + on-device argmax/log-prob
        gather, returning only the small host-bound arrays (the
        (B, L, V) decoder logits and the encoder output never leave
        the device)."""
        key = ('_paraformer_pipe', bool(need_peaks))
        if key not in self._jitted:
            model = self.model

            def fn(variables, feats, feats_lengths):
                v = self._maybe_dequant(variables)
                res = model.apply(v, feats, feats_lengths,
                                  method=model.forward_paraformer)
                ids = jnp.argmax(res['decoder_out'], -1)
                lp = jnp.take_along_axis(res['decoder_out'],
                                         ids[..., None], -1)[..., 0]
                peaks = None
                if need_peaks:
                    peaks = model.apply(v, res['tp_alphas'],
                                        res['decoder_out_lens'],
                                        method=model.forward_cif_peaks)
                return ids, lp, res['decoder_out_lens'], peaks

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def decode_paraformer_batches(self, batches,
                                  mode: str = 'paraformer_greedy_search'):
        """Software-pipelined paraformer NAR decode over an iterable of
        (feats, feats_lengths) batches; yields one List[DecodeResult]
        per batch, in order (ref analog: recognize.py's per-batch loop
        around paraformer.py:362-420).

        The sequential path (`decode`) pays device program + result
        fetch + host finalize in series per batch; here the device
        program for batch i+1 is dispatched while batch i's (ids,
        log-probs, lens, peaks) fetch rides a background thread and
        batch i-1 finalizes on host.  Results are identical to the
        sequential path (tested in test_paraformer.py)."""
        from wenet_tpu.models.paraformer.search import (
            paraformer_beam_search_ids, paraformer_greedy_search_ids)

        if mode not in ('paraformer_greedy_search',
                        'paraformer_beam_search'):
            raise ValueError(
                f'unsupported pipelined paraformer mode: {mode}')
        need_peaks = mode == 'paraformer_greedy_search'
        fn = self._paraformer_pipeline_fn(need_peaks)
        search_ids = (paraformer_greedy_search_ids if need_peaks
                      else paraformer_beam_search_ids)

        def dispatch(item):
            feats, feats_lengths = self._put_batch(*item)
            return fn(self.variables, feats, feats_lengths), None

        def finalize(fetched, _):
            ids, lp, lens, peaks = fetched
            return search_ids(ids, lp, lens, cif_peaks=peaks)

        yield from self._pipeline(batches, dispatch, finalize)

    # ------------------------------------------------------------------
    def _decode_paraformer(self, methods, feats, feats_lengths,
                           beam_size, context_graph, blank_id,
                           blank_penalty):
        """ref: wenet/models/paraformer/paraformer.py:362-420."""
        from wenet_tpu.models.paraformer.search import (
            paraformer_beam_search_ids, paraformer_greedy_search_ids)
        model = self.model
        if '_paraformer_fwd' not in self._jitted:

            def fn(variables, feats, feats_lengths):
                return model.apply(self._maybe_dequant(variables),
                                   feats, feats_lengths,
                                   method=model.forward_paraformer)

            self._jitted['_paraformer_fwd'] = jax.jit(fn)
        res = self._jitted['_paraformer_fwd'](self.variables, feats,
                                              feats_lengths)
        results = {}
        if 'paraformer_greedy_search' in methods or                 'paraformer_beam_search' in methods:
            if '_paraformer_peaks' not in self._jitted:

                def peaks_fn(variables, alphas, lens):
                    return model.apply(self._maybe_dequant(variables),
                                       alphas, lens,
                                       method=model.forward_cif_peaks)

                self._jitted['_paraformer_peaks'] = jax.jit(peaks_fn)
            peaks = self._jitted['_paraformer_peaks'](
                self.variables, res['tp_alphas'],
                res['decoder_out_lens'])
        if 'paraformer_greedy_search' in methods or \
                'paraformer_beam_search' in methods:
            # argmax + log-prob gather ON DEVICE: fetching the raw
            # (B, L, V) logits costs ~90MB/batch at a 5.5k vocab
            if '_paraformer_greedy_post' not in self._jitted:

                def post(dec_out):
                    ids = jnp.argmax(dec_out, -1)
                    lp = jnp.take_along_axis(dec_out, ids[..., None],
                                             -1)[..., 0]
                    return ids, lp

                self._jitted['_paraformer_greedy_post'] = jax.jit(post)
            ids, lp = self._jitted['_paraformer_greedy_post'](
                res['decoder_out'])
            ids, lp, out_lens, peaks_np = jax.device_get(
                (ids, lp, res['decoder_out_lens'], peaks))
        if 'paraformer_greedy_search' in methods:
            results['paraformer_greedy_search'] = \
                paraformer_greedy_search_ids(ids, lp, out_lens,
                                             peaks_np)
        if 'paraformer_beam_search' in methods:
            results['paraformer_beam_search'] = \
                paraformer_beam_search_ids(ids, lp, out_lens)
        if 'ctc_greedy_search' in methods or                 'ctc_prefix_beam_search' in methods:
            from wenet_tpu.models.transformer.search import (
                ctc_greedy_search, ctc_prefix_beam_search)
            ctc_probs = self.ctc_logprobs(res['encoder_out'],
                                          blank_penalty, blank_id)
            enc_lens = jnp.sum(res['encoder_out_mask'][:, 0, :], -1)
            if 'ctc_greedy_search' in methods:
                results['ctc_greedy_search'] = ctc_greedy_search(
                    ctc_probs, enc_lens, blank_id)
            if 'ctc_prefix_beam_search' in methods:
                results['ctc_prefix_beam_search'] =                     ctc_prefix_beam_search(ctc_probs, enc_lens,
                                           beam_size, context_graph,
                                           blank_id)
        return results
