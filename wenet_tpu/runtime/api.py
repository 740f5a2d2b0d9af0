"""Embedding API mirroring the reference C API surface.

ref: runtime/core/api/wenet_api.{h,cc} (wenet_init / wenet_decode /
wenet_reset / wenet_set_nbest / wenet_set_timestamp / wenet_add_context
/ wenet_set_language / wenet_set_continuous_decoding).  The python
object is the handle; a thin C shim for FFI embedding can wrap these
1:1 over the CPython C API.
"""

import json
import os
from typing import Optional

import numpy as np


class WenetRecognizer:
    """handle returned by wenet_init (ref wenet_api.h:27-40)."""

    def __init__(self, model_dir: str):
        from wenet_tpu.cli.model import _find_checkpoint
        from wenet_tpu.utils.config import load_config
        from wenet_tpu.utils.init_model import (init_model,
                                                init_variables)
        from wenet_tpu.utils.init_tokenizer import init_tokenizer
        configs = load_config(os.path.join(model_dir, 'train.yaml'))
        self.tokenizer = init_tokenizer(configs)
        configs.setdefault('input_dim', configs['dataset_conf'].get(
            'fbank_conf', {}).get('num_mel_bins', 80))
        configs.setdefault('output_dim', self.tokenizer.vocab_size())
        self.model, configs = init_model(None, configs)
        self.variables, _ = init_variables(
            self.model, configs, checkpoint=_find_checkpoint(model_dir))
        # one upload: checkpoint restore returns host arrays; every
        # AsrDecoder built from this object device_puts the variables,
        # which must be a no-op (not a per-decoder ~185 MB re-upload)
        import jax
        self.variables = jax.block_until_ready(
            jax.device_put(self.variables))
        self.configs = configs
        self.nbest = 1
        self.enable_timestamp = False
        self.context = []
        self.context_score = 3.0
        self.continuous_decoding = False
        self.language = 'chs'
        self._decoder = None

    # -- config setters (ref wenet_api.h:55-108) -----------------------
    def set_nbest(self, n: int):
        self.nbest = n

    def set_timestamp(self, flag: int):
        self.enable_timestamp = bool(flag)

    def add_context(self, word: str):
        self.context.append(word)

    def set_context_score(self, score: float):
        self.context_score = score

    def set_language(self, lang: str):
        self.language = lang

    def set_continuous_decoding(self, flag: int):
        self.continuous_decoding = bool(flag)

    # -- decode --------------------------------------------------------
    def _make_decoder(self):
        from wenet_tpu.runtime.asr_decoder import (AsrDecoder,
                                                   DecodeOptions)
        graph = None
        if self.context:
            from wenet_tpu.utils.context_graph import ContextGraph
            graph = ContextGraph('', self.tokenizer.symbol_table,
                                 context_list=[
                                     self.tokenizer.tokenize(w)[1]
                                     for w in self.context
                                 ],
                                 context_score=self.context_score)
        from wenet_tpu.runtime.feature_pipeline import (
            FeaturePipelineConfig)
        return AsrDecoder(self.model, self.variables, self.tokenizer,
                          DecodeOptions(),
                          FeaturePipelineConfig.from_configs(
                              self.configs),
                          context_graph=graph)

    def reset(self):
        self._decoder = self._make_decoder()

    def decode(self, pcm: bytes, last: int = 1) -> str:
        """Feed int16 pcm; returns the serialized result json.

        ref: wenet_api.cc Decode: a mid-stream endpoint with
        continuous decoding enabled finalizes the segment (rescoring +
        reset), matching the C API's kEndpoint branch."""
        from wenet_tpu.runtime.asr_decoder import DecodeState
        if self._decoder is None:
            self.reset()
        data = np.frombuffer(pcm, '<i2')
        self._decoder.accept_waveform(data)
        if last:
            self._decoder.set_input_finished()
        state = self._decoder.decode()
        is_final = bool(last)
        if last:
            self._decoder.rescoring()
        elif state == DecodeState.END_POINT and self.continuous_decoding:
            self._decoder.rescoring()
            is_final = True
        out = []
        for r in self._decoder.result[:self.nbest]:
            obj = {'sentence': r.sentence}
            if self.enable_timestamp:
                obj['word_pieces'] = [
                    {'word': w.word, 'start': w.start, 'end': w.end}
                    for w in r.word_pieces]
            out.append(obj)
        result = json.dumps({'type': 'final_result' if is_final else
                             'partial_result', 'nbest': out},
                            ensure_ascii=False)
        if is_final and not last:
            # continuous decoding: start the next segment
            self._decoder.reset_continuous_decoding()
        return result


# C-API style free functions (ref wenet_api.h)
def wenet_init(model_dir: str) -> WenetRecognizer:
    return WenetRecognizer(model_dir)


def wenet_free(handle: WenetRecognizer):
    del handle


def wenet_reset(handle: WenetRecognizer):
    handle.reset()


def wenet_decode(handle: WenetRecognizer, data: bytes,
                 last: int = 1) -> str:
    return handle.decode(data, last)


def wenet_set_nbest(handle: WenetRecognizer, n: int):
    handle.set_nbest(n)


def wenet_set_timestamp(handle: WenetRecognizer, flag: int):
    handle.set_timestamp(flag)


def wenet_add_context(handle: WenetRecognizer, word: str):
    handle.add_context(word)


def wenet_set_context_score(handle: WenetRecognizer, score: float):
    handle.set_context_score(score)


def wenet_set_language(handle: WenetRecognizer, lang: str):
    handle.set_language(lang)


def wenet_set_continuous_decoding(handle: WenetRecognizer, flag: int):
    handle.set_continuous_decoding(flag)
