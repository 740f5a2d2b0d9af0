"""Python API: load_model(...).transcribe(wav). ref: wenet/cli/model.py:20-110."""

import os
from typing import Optional

import numpy as np

from wenet_tpu.cli.hub import Hub
from wenet_tpu.models.runner import AsrRunner
from wenet_tpu.utils.config import load_config
from wenet_tpu.utils.init_model import init_model, init_variables
from wenet_tpu.utils.init_tokenizer import init_tokenizer


def _find_checkpoint(model_dir: str) -> str:
    for cand in ('final', 'final.pt', 'final.zip'):
        p = os.path.join(model_dir, cand)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f'no checkpoint (final*) in {model_dir}')


def _make_compute_feature(conf: dict):
    """Build the wav->feats fn from dataset_conf. ref: cli/model.py:49-68."""
    from wenet_tpu.dataset.audio import read_wav, resample
    from wenet_tpu.ops.fbank import (compute_fbank_np,
                                     compute_log_mel_spectrogram_np)
    feats_type = conf.get('feats_type', 'fbank')

    def compute(wav_path):
        wav, sr = read_wav(wav_path)
        if sr != 16000:
            wav = resample(wav, sr, 16000)
        if feats_type == 'log_mel_spectrogram':
            c = conf.get('log_mel_spectrogram_conf', {})
            return compute_log_mel_spectrogram_np(
                wav[0], num_mel_bins=c.get('num_mel_bins', 80))
        c = conf.get('fbank_conf', {})
        return compute_fbank_np(
            wav[0] * (1 << 15),
            num_mel_bins=c.get('num_mel_bins', 80),
            frame_length_ms=c.get('frame_length', 25),
            frame_shift_ms=c.get('frame_shift', 10),
            dither=0.0, sample_rate=16000)

    return compute


class Model:

    def __init__(self, model_dir: str, beam: int = 5,
                 context_path: Optional[str] = None,
                 context_score: float = 6.0):
        config_path = os.path.join(model_dir, 'train.yaml')
        configs = load_config(config_path)
        self.tokenizer = init_tokenizer(configs)
        dataset_conf = configs.get('dataset_conf', {})
        configs.setdefault(
            'input_dim',
            dataset_conf.get('fbank_conf', dataset_conf.get(
                'log_mel_spectrogram_conf', {})).get('num_mel_bins', 80))
        configs.setdefault('output_dim', self.tokenizer.vocab_size())
        module, configs = init_model(None, configs)
        variables, configs = init_variables(
            module, configs, checkpoint=_find_checkpoint(model_dir))
        self.runner = AsrRunner(module, variables)
        self.compute_feature = _make_compute_feature(dataset_conf)
        self.beam = beam
        self.context_graph = None
        if context_path is not None:
            from wenet_tpu.utils.context_graph import ContextGraph
            self.context_graph = ContextGraph(
                context_path, self.tokenizer.symbol_table,
                context_score=context_score)

    def transcribe(self, audio_file: str, tokens_info: bool = False):
        method = self.runner.model.default_decode_method
        feats = self.compute_feature(audio_file)
        import jax.numpy as jnp
        feats_j = jnp.asarray(feats)[None]
        lengths = jnp.asarray([feats.shape[0]])
        results = self.runner.decode(
            [method], feats_j, lengths, beam_size=self.beam,
            context_graph=self.context_graph)
        res = results[method][0]
        res.text = self.tokenizer.detokenize(
            [int(t) for t in res.tokens])[0]
        result = {'text': res.text}
        if tokens_info:
            tokens = self.tokenizer.detokenize(
                [int(t) for t in res.tokens])[1]
            info = []
            times = res.times or [0] * len(tokens)
            confs = res.tokens_confidence or [1.0] * len(tokens)
            # frame period = 10ms * encoder subsampling (not a 4x
            # constant — conv1d2/conv2d8 models differ)
            period = 0.01 * self.runner.model.encoder.subsampling_rate
            for t, tm, c in zip(tokens, times, confs):
                info.append({'token': t,
                             'start': round(tm * period, 3),
                             'confidence': round(float(c), 3)})
            result['tokens'] = info
        return result

    def align(self, audio_file: str, label: str):
        """CTC forced alignment of `label` to the audio.

        ref: wenet/cli/model.py align path (uses ctc force_align)."""
        import jax.numpy as jnp
        import numpy as np
        from wenet_tpu.utils.ctc_utils import force_align
        feats = self.compute_feature(audio_file)
        feats_j = jnp.asarray(feats)[None]
        lengths = jnp.asarray([feats.shape[0]])
        enc, mask = self.runner.forward_encoder(feats_j, lengths)
        logp = np.asarray(self.runner.ctc_logprobs(enc))[0]
        _, ids = self.tokenizer.tokenize(label)
        ali = np.asarray(force_align(jnp.asarray(logp),
                                     jnp.asarray(ids, jnp.int32)))
        sub = self.runner.model.encoder.subsampling_rate
        tokens = self.tokenizer.detokenize(list(ids))[1]
        # walk the viterbi alignment: each new non-blank run that
        # matches the next expected label starts that OCCURRENCE —
        # repeated tokens get their own span, not the first one's
        info = []
        expected = [int(t) for t in ids]
        idx = 0
        prev = -1
        for t, a in enumerate(int(x) for x in ali):
            if a != 0 and a != prev and idx < len(expected) \
                    and a == expected[idx]:
                info.append({'token': tokens[idx],
                             'start': round(t * 0.01 * sub, 3)})
                idx += 1
            prev = a
        while idx < len(expected):  # degenerate alignments
            info.append({'token': tokens[idx],
                         'start': info[-1]['start'] if info else 0.0})
            idx += 1
        return {'text': label, 'tokens': info}

    # compat with ref API
    def transcribe_wav(self, audio_file, **kw):
        return self.transcribe(audio_file, **kw)


def load_model(language: Optional[str] = None,
               model_dir: Optional[str] = None,
               gpu: int = -1,
               beam: int = 5,
               context_path: Optional[str] = None,
               context_score: float = 6.0,
               device: str = 'tpu') -> Model:
    """ref: cli/model.py:71-110."""
    if model_dir is None:
        assert language is not None
        model_dir = Hub.get_model_by_lang(language)
    else:
        model_dir = Hub.download_model(model_dir) \
            if not os.path.isdir(model_dir) else model_dir
    return Model(model_dir, beam, context_path, context_score)
