"""Streaming feature pipeline. ref: runtime/core/frontend/feature_pipeline.{h,cc}.

Incrementally converts accepted waveform into kaldi fbank frames,
keeping the residual samples between calls (frame_shift alignment).
The reference runs this on its own thread over a BlockingQueue; in the
asyncio server the pipeline is just called inline per binary message
(fbank of a chunk is microseconds of numpy).
"""

from typing import List, Optional

import numpy as np

from wenet_tpu.ops.fbank import compute_fbank_np


class FeaturePipelineConfig:

    def __init__(self, num_mel_bins: int = 80, frame_length: int = 25,
                 frame_shift: int = 10, sample_rate: int = 16000,
                 dither: float = 0.0):
        self.num_mel_bins = num_mel_bins
        self.frame_length = frame_length
        self.frame_shift = frame_shift
        self.sample_rate = sample_rate
        self.dither = dither
        self.frame_length_samples = sample_rate * frame_length // 1000
        self.frame_shift_samples = sample_rate * frame_shift // 1000

    @classmethod
    def from_configs(cls, configs: dict) -> 'FeaturePipelineConfig':
        """Build from a train.yaml dict (mel bins / frame geometry)."""
        fc = configs.get('dataset_conf', {}).get('fbank_conf', {})
        return cls(
            num_mel_bins=fc.get('num_mel_bins',
                                configs.get('input_dim', 80)),
            frame_length=int(fc.get('frame_length', 25)),
            frame_shift=int(fc.get('frame_shift', 10)),
            sample_rate=configs.get('dataset_conf', {}).get(
                'resample_conf', {}).get('resample_rate', 16000))


class FeaturePipeline:

    def __init__(self, config: Optional[FeaturePipelineConfig] = None,
                 prefer_native: bool = True):
        self.config = config or FeaturePipelineConfig()
        self._native = None
        if prefer_native and self.config.dither == 0.0:
            from wenet_tpu.runtime import native_fbank
            if native_fbank.available():
                c = self.config
                self._native = native_fbank.NativeFbank(
                    c.num_mel_bins, c.sample_rate, c.frame_length,
                    c.frame_shift)
        self.reset()

    def reset(self):
        self._remained = np.zeros((0,), np.float32)
        self._num_frames = 0
        self._input_finished = False

    @property
    def num_frames(self) -> int:
        return self._num_frames

    def accept_waveform(self, wav: np.ndarray) -> np.ndarray:
        """wav: float32 in [-1, 1] (or int16). Returns new (T, mel) frames."""
        wav = np.asarray(wav)
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        wav = np.concatenate([self._remained, wav.astype(np.float32)])
        c = self.config
        if len(wav) < c.frame_length_samples:
            self._remained = wav
            return np.zeros((0, c.num_mel_bins), np.float32)
        if self._native is not None:
            feats = self._native.compute(wav * (1 << 15))
        else:
            feats = compute_fbank_np(
                wav * (1 << 15), num_mel_bins=c.num_mel_bins,
                frame_length_ms=c.frame_length,
                frame_shift_ms=c.frame_shift,
                sample_rate=c.sample_rate, dither=c.dither)
        n = feats.shape[0]
        consumed = n * c.frame_shift_samples
        self._remained = wav[consumed:]
        self._num_frames += n
        return feats

    def set_input_finished(self):
        self._input_finished = True
