"""Kaldi-compatible fbank / MFCC and whisper log-mel as jittable ops.

TPU-native rebuild of the reference front end:
* python training path: torchaudio.compliance.kaldi.fbank on
  waveform * (1<<15) (ref wenet/dataset/processor.py:226-318)
* C++ serving path: from-scratch kaldi fbank (ref
  runtime/core/frontend/fbank.h:34-130)

The algorithm follows kaldi's FbankComputer: dither -> remove DC ->
pre-emphasis (x[0] duplicated) -> povey window -> zero-pad to the next
power of two -> |FFT|^2 -> mel bins (1127*ln(1+f/700) scale, low 20 Hz,
high nyquist) -> log(max(e, eps)).  Everything is expressed as framing
+ matmul so XLA maps the mel projection onto the MXU; the whole front
end fuses into the encoder program (no host featurization).
"""

import math
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@lru_cache(maxsize=16)
def kaldi_mel_banks(num_bins: int, padded_window: int, sample_rate: int,
                    low_freq: float = 20.0,
                    high_freq: float = 0.0) -> np.ndarray:
    """(num_fft_bins, num_bins) triangular mel weights, kaldi-style.

    ref: runtime/core/frontend/fbank.h mel-bank setup; matches
    torchaudio.compliance.kaldi.get_mel_banks."""
    num_fft_bins = padded_window // 2
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_rate / padded_window
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    bins = np.zeros((num_fft_bins, num_bins), np.float32)
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = mel_low + (b + 1) * mel_delta
        right = mel_low + (b + 2) * mel_delta
        for i in range(num_fft_bins):
            mel = mel_scale(fft_bin_width * i)
            if left < mel < right:
                if mel <= center:
                    bins[i, b] = (mel - left) / (center - left)
                else:
                    bins[i, b] = (right - mel) / (right - center)
    return bins


@lru_cache(maxsize=8)
def povey_window(frame_length: int) -> np.ndarray:
    n = np.arange(frame_length)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / (frame_length - 1))
    return (hann**0.85).astype(np.float32)


@lru_cache(maxsize=8)
def hann_window(frame_length: int) -> np.ndarray:
    n = np.arange(frame_length)
    return (0.5 -
            0.5 * np.cos(2 * np.pi * n / frame_length)).astype(np.float32)


def frame_signal(waveform: jax.Array, frame_length: int,
                 frame_shift: int) -> jax.Array:
    """(..., S) -> (..., T, frame_length), snip_edges=True framing."""
    S = waveform.shape[-1]
    T = 1 + (S - frame_length) // frame_shift if S >= frame_length else 0
    idx = (jnp.arange(T)[:, None] * frame_shift +
           jnp.arange(frame_length)[None, :])
    return waveform[..., idx]


def compute_fbank(waveform: jax.Array,
                  num_mel_bins: int = 80,
                  frame_length_ms: float = 25.0,
                  frame_shift_ms: float = 10.0,
                  sample_rate: int = 16000,
                  dither: float = 0.0,
                  preemphasis: float = 0.97,
                  remove_dc_offset: bool = True,
                  rng: Optional[jax.Array] = None,
                  log_floor: float = 1.1920928955078125e-07,
                  low_freq: float = 20.0,
                  high_freq: float = 0.0) -> jax.Array:
    """Kaldi fbank of int16-scaled waveform (..., S) -> (..., T, mel).

    Caller is responsible for the * (1<<15) scaling the reference
    applies (processor.py:245-246)."""
    frame_length = int(sample_rate * frame_length_ms / 1000)
    frame_shift = int(sample_rate * frame_shift_ms / 1000)
    padded = _next_pow2(frame_length)

    frames = frame_signal(waveform, frame_length, frame_shift)
    if dither != 0.0 and rng is not None:
        frames = frames + dither * jax.random.normal(
            rng, frames.shape, frames.dtype)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]],
                               axis=-1)
        frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(povey_window(frame_length))
    frames = jnp.pad(frames,
                     [(0, 0)] * (frames.ndim - 1) +
                     [(0, padded - frame_length)])
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.square(jnp.real(spec)) + jnp.square(jnp.imag(spec))
    power = power[..., :padded // 2]  # kaldi drops the nyquist bin
    mel = jnp.asarray(kaldi_mel_banks(num_mel_bins, padded, sample_rate,
                                      low_freq, high_freq))
    energies = jnp.einsum('...tf,fm->...tm', power, mel,
                          preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(energies, log_floor))


@lru_cache(maxsize=8)
def dct_matrix(num_ceps: int, num_mel_bins: int) -> np.ndarray:
    """Type-II DCT matrix with kaldi normalization (num_mel, num_ceps)."""
    m = np.zeros((num_mel_bins, num_ceps), np.float32)
    m[:, 0] = math.sqrt(1.0 / num_mel_bins)
    for c in range(1, num_ceps):
        m[:, c] = (math.sqrt(2.0 / num_mel_bins) *
                   np.cos(math.pi * c *
                          (np.arange(num_mel_bins) + 0.5) / num_mel_bins))
    return m


@lru_cache(maxsize=8)
def lifter_coeffs(num_ceps: int, q: float = 22.0) -> np.ndarray:
    i = np.arange(num_ceps)
    return (1.0 + 0.5 * q * np.sin(np.pi * i / q)).astype(np.float32)


def compute_mfcc(waveform: jax.Array,
                 num_mel_bins: int = 23,
                 num_ceps: int = 13,
                 cepstral_lifter: float = 22.0,
                 low_freq: float = 20.0,
                 high_freq: float = 0.0,
                 **fbank_kwargs) -> jax.Array:
    """Kaldi MFCC: DCT-II of log-mel + liftering.

    ref: processor.py:286-318 (torchaudio.compliance.kaldi.mfcc)."""
    logmel = compute_fbank(waveform, num_mel_bins=num_mel_bins,
                           low_freq=low_freq, high_freq=high_freq,
                           **fbank_kwargs)
    dct = jnp.asarray(dct_matrix(num_ceps, num_mel_bins))
    feats = jnp.einsum('...tm,mc->...tc', logmel, dct,
                       preferred_element_type=jnp.float32)
    if cepstral_lifter > 0:
        feats = feats * jnp.asarray(
            lifter_coeffs(num_ceps, cepstral_lifter))
    return feats


@lru_cache(maxsize=8)
def slaney_mel_banks(num_bins: int, n_fft: int,
                     sample_rate: int) -> np.ndarray:
    """librosa/slaney-norm mel filters used by whisper (T: (1+n_fft/2, M)).

    ref: processor.py:320-369 uses librosa.filters.mel."""
    n_freqs = 1 + n_fft // 2
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    min_mel, max_mel = 0.0, None
    # slaney scale: linear below 1 kHz, log above
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        f_sp = 200.0 / 3
        mel = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(f / min_log_hz) / logstep,
                        mel)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f_sp = 200.0 / 3
        f = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        f)

    max_mel = hz_to_mel(sample_rate / 2)
    mels = np.linspace(min_mel, max_mel, num_bins + 2)
    mel_f = mel_to_hz(mels)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fft_freqs[None, :]
    weights = np.zeros((num_bins, n_freqs))
    for i in range(num_bins):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:num_bins + 2] - mel_f[:num_bins])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_freqs, M)


def compute_log_mel_spectrogram(waveform: jax.Array,
                                n_fft: int = 400,
                                hop_length: int = 160,
                                num_mel_bins: int = 80,
                                sample_rate: int = 16000,
                                padding: int = 0) -> jax.Array:
    """Whisper log-mel: reflect-padded centered STFT with hann window.

    ref: processor.py:320-369 (matches openai-whisper log_mel_spectrogram
    semantics: drops the final frame, log10, 8-dB dynamic range clamp,
    (x+4)/4 scaling)."""
    if padding > 0:
        waveform = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) +
                           [(0, padding)])
    half = n_fft // 2
    wav = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) +
                  [(half, half)], mode='reflect')
    frames = frame_signal(wav, n_fft, hop_length)
    frames = frames * jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)
    power = (jnp.square(jnp.real(spec)) +
             jnp.square(jnp.imag(spec)))[..., :-1, :]  # drop last frame
    mel = jnp.asarray(slaney_mel_banks(num_mel_bins, n_fft, sample_rate))
    melspec = jnp.einsum('...tf,fm->...tm', power, mel,
                         preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(melspec, 1e-10))
    log_spec = jnp.maximum(log_spec,
                           jnp.max(log_spec, axis=(-2, -1),
                                   keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


# ---------------------------------------------------------------------------
# numpy mirrors for the host-side data pipeline (identical math; the
# device path above is for on-TPU fused featurization)
# ---------------------------------------------------------------------------
def compute_fbank_np(waveform: np.ndarray,
                     num_mel_bins: int = 80,
                     frame_length_ms: float = 25.0,
                     frame_shift_ms: float = 10.0,
                     sample_rate: int = 16000,
                     dither: float = 0.0,
                     preemphasis: float = 0.97,
                     remove_dc_offset: bool = True,
                     rng: Optional[np.random.RandomState] = None,
                     log_floor: float = 1.1920928955078125e-07,
                     low_freq: float = 20.0,
                     high_freq: float = 0.0) -> np.ndarray:
    """numpy kaldi fbank; same pipeline as compute_fbank."""
    waveform = np.asarray(waveform, np.float32)
    frame_length = int(sample_rate * frame_length_ms / 1000)
    frame_shift = int(sample_rate * frame_shift_ms / 1000)
    padded = _next_pow2(frame_length)
    S = waveform.shape[-1]
    T = 1 + (S - frame_length) // frame_shift if S >= frame_length else 0
    if T <= 0:
        return np.zeros(waveform.shape[:-1] + (0, num_mel_bins),
                        np.float32)
    idx = (np.arange(T)[:, None] * frame_shift +
           np.arange(frame_length)[None, :])
    frames = waveform[..., idx]
    if dither != 0.0:
        rng = rng or np.random
        frames = frames + dither * rng.randn(*frames.shape).astype(
            np.float32)
    if remove_dc_offset:
        frames = frames - frames.mean(-1, keepdims=True)
    if preemphasis != 0.0:
        prev = np.concatenate([frames[..., :1], frames[..., :-1]], -1)
        frames = frames - preemphasis * prev
    frames = frames * povey_window(frame_length)
    spec = np.fft.rfft(frames, n=padded, axis=-1)
    power = (spec.real**2 + spec.imag**2)[..., :padded // 2]
    mel = kaldi_mel_banks(num_mel_bins, padded, sample_rate,
                          low_freq, high_freq)
    energies = power.astype(np.float32) @ mel
    return np.log(np.maximum(energies, log_floor)).astype(np.float32)


def compute_mfcc_np(waveform: np.ndarray, num_mel_bins: int = 23,
                    num_ceps: int = 13, cepstral_lifter: float = 22.0,
                    low_freq: float = 20.0, high_freq: float = 0.0,
                    **kwargs) -> np.ndarray:
    logmel = compute_fbank_np(waveform, num_mel_bins=num_mel_bins,
                              low_freq=low_freq, high_freq=high_freq,
                              **kwargs)
    feats = logmel @ dct_matrix(num_ceps, num_mel_bins)
    if cepstral_lifter > 0:
        feats = feats * lifter_coeffs(num_ceps, cepstral_lifter)
    return feats.astype(np.float32)


def compute_log_mel_spectrogram_np(waveform: np.ndarray,
                                   n_fft: int = 400,
                                   hop_length: int = 160,
                                   num_mel_bins: int = 80,
                                   sample_rate: int = 16000,
                                   padding: int = 0) -> np.ndarray:
    waveform = np.asarray(waveform, np.float32)
    if padding > 0:
        waveform = np.pad(waveform, [(0, 0)] * (waveform.ndim - 1) +
                          [(0, padding)])
    half = n_fft // 2
    wav = np.pad(waveform, [(0, 0)] * (waveform.ndim - 1) +
                 [(half, half)], mode='reflect')
    S = wav.shape[-1]
    T = 1 + (S - n_fft) // hop_length
    idx = (np.arange(T)[:, None] * hop_length +
           np.arange(n_fft)[None, :])
    frames = wav[..., idx] * hann_window(n_fft)
    spec = np.fft.rfft(frames, axis=-1)
    power = (spec.real**2 + spec.imag**2)[..., :-1, :]
    mel = slaney_mel_banks(num_mel_bins, n_fft, sample_rate)
    melspec = power.astype(np.float32) @ mel
    log_spec = np.log10(np.maximum(melspec, 1e-10))
    log_spec = np.maximum(
        log_spec, log_spec.max(axis=(-2, -1), keepdims=True) - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)
