"""Streaming decode orchestration (the AsrDecoder of the serving stack).

ref: runtime/core/decoder/asr_decoder.{h,cc}.  Flow per chunk:
feature_pipeline -> jitted forward_encoder_chunk (fixed-shape caches) ->
ctc_activation -> incremental prefix beam search -> endpoint check;
Rescoring() finalizes the search and re-ranks the nbest with the
attention decoder over the accumulated encoder output
(rescoring_weight * att + ctc_weight * ctc, ref asr_decoder.cc:217-243).
"""

import enum
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from wenet_tpu.models.transformer.streaming import (StreamingConfig,
                                                    init_streaming_state,
                                                    streaming_att_mask)
from wenet_tpu.runtime.ctc_prefix_beam_search import CtcPrefixBeamSearch
from wenet_tpu.runtime.endpoint import CtcEndpoint, CtcEndpointConfig
from wenet_tpu.runtime.feature_pipeline import (FeaturePipeline,
                                                FeaturePipelineConfig)


class DecodeState(enum.Enum):
    END_BATCH = 0
    END_POINT = 1
    END_FEATS = 2


@dataclass
class WordPiece:
    word: str
    start: int = -1  # ms
    end: int = -1


@dataclass
class DecodeResult:
    sentence: str = ''
    word_pieces: List[WordPiece] = field(default_factory=list)
    score: float = 0.0


@dataclass
class DecodeOptions:
    """ref: runtime/core/decoder/asr_decoder.h DecodeOptions."""
    chunk_size: int = 16
    num_left_chunks: int = -1
    ctc_weight: float = 0.5
    rescoring_weight: float = 1.0
    reverse_weight: float = 0.0
    beam_size: int = 10
    blank_id: int = 0


class AsrDecoder:

    def __init__(self, model, variables, tokenizer,
                 opts: Optional[DecodeOptions] = None,
                 feature_config: Optional[FeaturePipelineConfig] = None,
                 endpoint_config: Optional[CtcEndpointConfig] = None,
                 context_graph=None, lm=None, lm_weight: float = 0.5,
                 tlg_fst=None, word_table=None, post_processor=None,
                 batch_runner=None):
        """lm: ARPA NgramLM for shallow fusion; tlg_fst: TextFst for
        WFST decoding (mutually exclusive with lm, analog of the
        reference's with/without-LM split, docs/lm.md)."""
        self.model = model
        self.variables = jax.device_put(variables)  # keep on device
        self.tokenizer = tokenizer
        self.opts = opts or DecodeOptions()
        self.feature_pipeline = FeaturePipeline(feature_config)
        sub = model.encoder.subsampling_rate
        self.cfg = StreamingConfig(
            decoding_chunk_size=self.opts.chunk_size,
            num_decoding_left_chunks=self.opts.num_left_chunks,
            subsampling_rate=sub,
            right_context=model.encoder.right_context)
        frame_shift_ms = 10 * sub
        self.endpointer = CtcEndpoint(endpoint_config, frame_shift_ms)
        self.word_table = word_table
        self.post_processor = post_processor
        # shared cross-session dynamic batcher (runtime/batch_runner.py)
        self.batch_runner = batch_runner
        if tlg_fst is not None:
            # C++ lattice decoder when available (native_wfst),
            # python token-passing searcher otherwise; tlg_fst may be
            # a TLG.txt path or a lm.fst.TextFst object.
            from wenet_tpu.runtime.native_wfst import make_wfst_searcher
            if isinstance(tlg_fst, str):
                fst_obj, fst_path = None, tlg_fst
            else:
                fst_obj, fst_path = tlg_fst, None
            self.searcher = make_wfst_searcher(
                fst_obj, fst_path=fst_path, word_table=word_table,
                beam_size=self.opts.beam_size,
                blank_id=self.opts.blank_id)
        else:
            # context biasing and ARPA shallow fusion both run INSIDE
            # the C++ beam (ref integrates biasing the same way,
            # runtime/core/decoder/ctc_prefix_beam_search.h:35-125);
            # make_searcher falls back to python when the lib is absent
            from wenet_tpu.runtime.native_beam import make_searcher
            self.searcher = make_searcher(
                self.opts.beam_size, blank_id=self.opts.blank_id,
                context_graph=context_graph, lm=lm, lm_weight=lm_weight,
                symbol_table={v: k
                              for k, v in tokenizer.symbol_table.items()}
                if lm is not None and hasattr(tokenizer,
                                              'symbol_table') else None)
        self.is_wfst = tlg_fst is not None
        self._jitted = {}
        self.reset()

    # -- lifecycle -------------------------------------------------------
    def reset(self):
        self.feature_pipeline.reset()
        self.endpointer.reset()
        self.searcher.reset()
        self.state = None
        self.offset = 0
        self.valid_cache = 0
        self.encoder_outs: List[np.ndarray] = []
        self.feature_buf = np.zeros(
            (0, self.feature_pipeline.config.num_mel_bins), np.float32)
        self.first_chunk = True
        self.result: List[DecodeResult] = []

    def reset_continuous_decoding(self):
        """ref: asr_decoder.cc:67 (keep feature pipeline, restart utt)."""
        self.endpointer.reset()
        self.searcher.reset()
        self.state = None
        self.offset = 0
        self.valid_cache = 0
        self.encoder_outs = []
        self.first_chunk = True

    # -- jit helpers -----------------------------------------------------
    def _chunk_fn(self):
        if 'chunk' not in self._jitted:
            model = self.model

            @jax.jit
            def fn(variables, xs, offset, att_cache, cnn_cache, att_mask):
                ys, att, cnn = model.apply(
                    variables, xs, offset, att_cache, cnn_cache, att_mask,
                    method=model.forward_encoder_chunk)
                logp = model.apply(variables, ys,
                                   method=model.ctc_activation)
                return ys, logp, att, cnn

            self._jitted['chunk'] = fn
        return self._jitted['chunk']

    # -- decoding --------------------------------------------------------
    def accept_waveform(self, wav: np.ndarray):
        feats = self.feature_pipeline.accept_waveform(wav)
        if feats.shape[0]:
            self.feature_buf = np.concatenate([self.feature_buf, feats])

    def set_input_finished(self):
        self.feature_pipeline.set_input_finished()

    def decode(self) -> DecodeState:
        """Consume buffered features chunk by chunk.

        ref: asr_decoder.cc:76-132 (AdvanceDecoding)."""
        cfg = self.cfg
        mel = self.feature_pipeline.config.num_mel_bins
        state = DecodeState.END_BATCH
        while True:
            if self.feature_buf.shape[0] >= cfg.decoding_window:
                chunk = self.feature_buf[:cfg.decoding_window]
                self.feature_buf = self.feature_buf[cfg.stride:]
                tail = False
            elif (self.feature_pipeline._input_finished
                  and self.feature_buf.shape[0] > cfg.right_context):
                chunk = self.feature_buf
                self.feature_buf = np.zeros((0, mel), np.float32)
                tail = True
            else:
                break
            ended = self._advance_one_chunk(chunk)
            if ended:
                state = DecodeState.END_POINT
                break
            if tail:
                state = DecodeState.END_FEATS
                break
        self._update_result(finish=False)
        return state

    def _advance_one_chunk(self, chunk: np.ndarray) -> bool:
        cfg = self.cfg
        if self.state is None:
            att_cache, cnn_cache = self.model.encoder.zero_cache(
                1, cfg.required_cache_size)
            self.state = (att_cache, cnn_cache)
        att_cache, cnn_cache = self.state
        context = cfg.right_context + 1
        real_out = max((chunk.shape[0] - context) //
                       cfg.subsampling_rate + 1, 0)
        pad = cfg.decoding_window - chunk.shape[0]
        if pad > 0:
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
        chunk_out = (cfg.decoding_window - context) // \
            cfg.subsampling_rate + 1
        if self.batch_runner is not None:
            fut = self.batch_runner.submit(chunk, (att_cache, cnn_cache),
                                           self.offset, self.valid_cache,
                                           real_out)
            ys, logp, self.state = fut.result()
        else:
            att_mask = streaming_att_mask(1, cfg.required_cache_size,
                                          chunk_out, self.valid_cache,
                                          valid_chunk=real_out)
            ys, logp, att_cache, cnn_cache = self._chunk_fn()(
                self.variables, jnp.asarray(chunk)[None],
                jnp.asarray(self.offset), att_cache, cnn_cache,
                att_mask)
            self.state = (att_cache, cnn_cache)
        self.offset += real_out
        self.valid_cache = min(self.valid_cache + real_out,
                               cfg.required_cache_size)
        # one batched fetch: per-array np.asarray costs a tunnel RTT
        # each on remote-TPU setups
        ys_np, logp_np = jax.device_get(
            (ys[0, :real_out], logp[0, :real_out]))
        self.encoder_outs.append(ys_np)
        self.searcher.search(logp_np)
        decoded_sth = len(self.searcher.hypotheses[0]) > 0 \
            if self.searcher.hypotheses else False
        return self.endpointer.is_endpoint(logp_np, decoded_sth)

    # -- results ---------------------------------------------------------
    def _update_result(self, finish: bool = False):
        """ref: asr_decoder.cc:137-191 (text + timestamps)."""
        hyps = self.searcher.hypotheses
        times = self.searcher.times
        likelihood = self.searcher.likelihood
        frame_shift_ms = self.endpointer.frame_shift_in_ms
        results = []
        for i, hyp in enumerate(hyps):
            r = DecodeResult(score=likelihood[i])
            if self.is_wfst:
                tokens = [(self.word_table or {}).get(int(w), str(w))
                          for w in hyp]
                text = ''.join(tokens)
            else:
                text, tokens = self.tokenizer.detokenize(
                    [int(t) for t in hyp])
            if self.post_processor is not None:
                text = self.post_processor.process(text, finish)
            r.sentence = text
            if finish and i < len(times):
                for w, t in zip(tokens, times[i]):
                    start = t * frame_shift_ms
                    r.word_pieces.append(
                        WordPiece(w, start, start + frame_shift_ms))
            results.append(r)
        self.result = results

    def rescoring(self):
        """Finalize + attention rescoring. ref: asr_decoder.cc:217-243."""
        self.searcher.finalize_search()
        self._update_result(finish=True)
        if self.is_wfst:
            return  # WFST hyps are word ids; attention rescoring N/A
        if not self.encoder_outs or self.model.decoder is None:
            return
        hyps = self.searcher.hypotheses
        if not hyps or all(len(h) == 0 for h in hyps):
            return
        encoder_out = jnp.asarray(
            np.concatenate(self.encoder_outs, axis=0))[None]
        from wenet_tpu.models.transformer.search import (
            DecodeResult as DR, attention_rescoring)
        ctc_results = [
            DR(tokens=hyps[0], nbest=hyps,
               nbest_scores=self.searcher.likelihood,
               nbest_times=self.searcher.times)
        ]
        enc_lens = jnp.asarray([encoder_out.shape[1]])
        rescored = attention_rescoring(
            self.model, self.variables, ctc_results, encoder_out,
            enc_lens, self.opts.ctc_weight, self.opts.reverse_weight)
        best = rescored[0]
        text, tokens = self.tokenizer.detokenize(
            [int(t) for t in best.tokens])
        if self.post_processor is not None:
            text = self.post_processor.process(text, True)
        r = DecodeResult(sentence=text, score=best.score)
        if best.times:
            fs = self.endpointer.frame_shift_in_ms
            for w, t in zip(tokens, best.times):
                r.word_pieces.append(WordPiece(w, t * fs, (t + 1) * fs))
        self.result = [r] + self.result[1:]
