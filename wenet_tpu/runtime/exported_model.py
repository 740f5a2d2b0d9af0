"""Serve from exported StableHLO artifacts — no flax model code needed.

Analog of the reference's OnnxAsrModel (ref:
runtime/core/decoder/onnx_asr_model.{h,cc}: three exported graphs —
encoder-chunk, ctc, decoder — drive the same AsrDecoder).  Here the
artifacts come from `wenet_tpu/bin/export_model.py` (encoder_chunk /
decoder_rescore serialized with jax.export + export_meta.json), and
`ExportedAsrDecoder` plugs them into the serving stack (feature
pipeline, endpointing, beam search, rescoring) unchanged.
"""

import json
import math
import os
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

from wenet_tpu.runtime.asr_decoder import (AsrDecoder, DecodeOptions,
                                           DecodeResult, WordPiece)
from wenet_tpu.runtime.endpoint import CtcEndpoint
from wenet_tpu.runtime.feature_pipeline import (FeaturePipeline,
                                                FeaturePipelineConfig)
from wenet_tpu.models.transformer.streaming import StreamingConfig


class ExportedAsrModel:
    """Loads + calls the serialized entry points."""

    def __init__(self, export_dir: str):
        with open(os.path.join(export_dir, 'export_meta.json'),
                  encoding='utf-8') as f:
            self.meta = json.load(f)
        with open(os.path.join(export_dir, 'encoder_chunk.stablehlo'),
                  'rb') as f:
            self.chunk = jexport.deserialize(bytearray(f.read()))
        dec_path = os.path.join(export_dir, 'decoder_rescore.stablehlo')
        self.decoder = None
        if os.path.exists(dec_path):
            with open(dec_path, 'rb') as f:
                self.decoder = jexport.deserialize(bytearray(f.read()))
        # cache shapes are embedded in the exported signature:
        # (xs, offset, att_cache..., cnn_cache..., att_mask)
        self._in_avals = self.chunk.in_avals

    def zero_cache(self):
        """Zero att/cnn caches with the exported shapes/dtypes."""
        avals = self._in_avals
        # first aval: xs; second: offset; last: att_mask; in between:
        # flattened (att_cache, cnn_cache) pytree leaves
        mids = avals[2:-1]
        leaves = [jnp.zeros(a.shape, a.dtype) for a in mids]
        return leaves

    def forward_chunk(self, xs, offset, cache_leaves, att_mask):
        # rebuild the traced pytree structure from flat leaves
        flat = [xs, jnp.asarray(offset, jnp.int32)] + \
            list(cache_leaves) + [att_mask]
        args, kwargs = jax.tree_util.tree_unflatten(self.chunk.in_tree,
                                                    flat)
        out = self.chunk.call(*args, **kwargs)
        (ys, logp), rest = out[:2], out[2:]
        new_cache = jax.tree_util.tree_leaves(rest)
        return ys, logp, new_cache

    def rescore(self, hyps_pad, hyps_lens, encoder_out,
                reverse_weight: float = 0.0):
        assert self.decoder is not None, 'decoder not exported'
        out = self.decoder.call(hyps_pad, hyps_lens, encoder_out)
        if isinstance(out, (tuple, list)) and len(out) >= 2:
            return out[0], out[1]
        return out, None


class ExportedAsrDecoder(AsrDecoder):
    """AsrDecoder running entirely on exported artifacts."""

    def __init__(self, export_dir: str, tokenizer,
                 opts: Optional[DecodeOptions] = None,
                 feature_config: Optional[FeaturePipelineConfig] = None,
                 endpoint_config=None, context_graph=None):
        em = ExportedAsrModel(export_dir)
        meta = em.meta
        self.exported = em
        self.model = None
        self.variables = None
        self.tokenizer = tokenizer
        self.opts = opts or DecodeOptions(
            chunk_size=meta['chunk_size'],
            num_left_chunks=meta['num_left_chunks'])
        self.feature_pipeline = FeaturePipeline(
            feature_config or
            FeaturePipelineConfig(num_mel_bins=meta['input_dim']))
        self.cfg = StreamingConfig(
            decoding_chunk_size=meta['chunk_size'],
            num_decoding_left_chunks=meta['num_left_chunks'],
            subsampling_rate=meta['subsampling_rate'],
            right_context=meta['right_context'])
        self.endpointer = CtcEndpoint(
            endpoint_config, 10 * meta['subsampling_rate'])
        self.word_table = None
        self.post_processor = None
        from wenet_tpu.runtime.native_beam import make_searcher
        self.searcher = make_searcher(
            self.opts.beam_size, blank_id=self.opts.blank_id,
            context_graph=context_graph)
        self.is_wfst = False
        self._jitted = {}
        self.reset()

    # -- overrides ------------------------------------------------------
    def _advance_one_chunk(self, chunk: np.ndarray) -> bool:
        cfg = self.cfg
        if self.state is None:
            self.state = self.exported.zero_cache()
        context = cfg.right_context + 1
        real_out = max((chunk.shape[0] - context) //
                       cfg.subsampling_rate + 1, 0)
        pad = cfg.decoding_window - chunk.shape[0]
        if pad > 0:
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
        chunk_out = (cfg.decoding_window - context) // \
            cfg.subsampling_rate + 1
        from wenet_tpu.models.transformer.streaming import (
            streaming_att_mask)
        att_mask = streaming_att_mask(1, cfg.required_cache_size,
                                      chunk_out, self.valid_cache,
                                      valid_chunk=real_out)
        ys, logp, self.state = self.exported.forward_chunk(
            jnp.asarray(chunk, jnp.float32)[None], self.offset,
            self.state, att_mask)
        self.offset += real_out
        self.valid_cache = min(self.valid_cache + real_out,
                               cfg.required_cache_size)
        ys_np = np.asarray(ys[0, :real_out])
        logp_np = np.asarray(logp[0, :real_out])
        self.encoder_outs.append(ys_np)
        self.searcher.search(logp_np)
        decoded_sth = bool(self.searcher.hypotheses and
                           len(self.searcher.hypotheses[0]) > 0)
        return self.endpointer.is_endpoint(logp_np, decoded_sth)

    def rescoring(self):
        """Attention rescoring via the exported decoder graph
        (fixed beam/max-len shapes from export_meta)."""
        self.searcher.finalize_search()
        self._update_result(finish=True)
        if self.exported.decoder is None or not self.encoder_outs:
            return
        hyps = self.searcher.hypotheses
        if not hyps or all(len(h) == 0 for h in hyps):
            return
        meta = self.exported.meta
        beam = meta['beam']
        max_len = meta['max_hyp_len']
        sos = meta['sos']
        eos = meta.get('eos', meta['sos'])
        n = min(len(hyps), beam)
        # truncate ONCE so padding and scoring see the same tokens —
        # scoring the untruncated hyp would index past max_hyp_len
        hyps = [list(h)[:max_len - 1] for h in hyps[:n]]
        scores = self.searcher.likelihood[:n]
        hyps_pad = np.full((beam, max_len), eos, np.int32)
        hyps_pad[:, 0] = sos
        hyps_lens = np.ones((beam,), np.int32)
        for i, h in enumerate(hyps):
            hyps_pad[i, 1:1 + len(h)] = h
            hyps_lens[i] = len(h) + 1
        encoder_out = jnp.asarray(
            np.concatenate(self.encoder_outs, axis=0))[None]
        dec, r_dec = self.exported.rescore(
            jnp.asarray(hyps_pad), jnp.asarray(hyps_lens), encoder_out,
            self.opts.reverse_weight)
        dec = np.asarray(dec)
        r_dec = np.asarray(r_dec) if r_dec is not None else None
        best_score, best_i = -float('inf'), 0
        for i, h in enumerate(hyps):
            score = sum(dec[i][j][w] for j, w in enumerate(h))
            score += dec[i][len(h)][eos]
            if self.opts.reverse_weight > 0 and r_dec is not None \
                    and r_dec.ndim > 0:
                r_score = sum(r_dec[i][len(h) - j - 1][w]
                              for j, w in enumerate(h))
                r_score += r_dec[i][len(h)][eos]
                score = (score * (1 - self.opts.reverse_weight) +
                         r_score * self.opts.reverse_weight)
            score = float(score) + scores[i] * self.opts.ctc_weight
            if score > best_score:
                best_score, best_i = score, i
        text, tokens = self.tokenizer.detokenize(
            [int(t) for t in hyps[best_i]])
        r = DecodeResult(sentence=text, score=best_score)
        times = self.searcher.times
        if best_i < len(times):
            fs = self.endpointer.frame_shift_in_ms
            for w, t in zip(tokens, times[best_i]):
                r.word_pieces.append(WordPiece(w, t * fs, (t + 1) * fs))
        self.result = [r] + self.result[1:]
