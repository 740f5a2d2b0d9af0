"""Front-end feature tests: kaldi fbank properties + whisper log-mel
parity against a torch.stft re-implementation of the whisper reference."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from wenet_tpu.ops.fbank import (compute_fbank, compute_log_mel_spectrogram,
                                 compute_mfcc, kaldi_mel_banks,
                                 slaney_mel_banks)

SR = 16000


def tone(freq, seconds=1.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_fbank_shapes():
    wav = jnp.asarray(tone(440)[None, :] * (1 << 15))
    feats = compute_fbank(wav, num_mel_bins=80)
    assert feats.shape == (1, 1 + (SR - 400) // 160, 80)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_fbank_tone_peak_bin():
    """A pure tone's energy peaks at the mel bin containing its freq."""
    freq = 1000.0
    wav = jnp.asarray(tone(freq)[None, :] * (1 << 15))
    feats = np.asarray(compute_fbank(wav, num_mel_bins=40))
    mean_spec = feats[0].mean(0)
    peak_bin = int(np.argmax(mean_spec))
    # expected bin from the mel center frequencies
    mel = lambda f: 1127.0 * math.log(1 + f / 700.0)
    lo, hi = mel(20.0), mel(SR / 2)
    delta = (hi - lo) / 41
    expect = int((mel(freq) - lo) / delta) - 1
    assert abs(peak_bin - expect) <= 1, (peak_bin, expect)


def test_fbank_dither_reproducible():
    wav = jnp.asarray(tone(300)[None, :] * (1 << 15))
    a = compute_fbank(wav, dither=1.0, rng=jax.random.PRNGKey(0))
    b = compute_fbank(wav, dither=1.0, rng=jax.random.PRNGKey(0))
    c = compute_fbank(wav, dither=1.0, rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_mfcc_shape():
    wav = jnp.asarray(tone(440)[None, :] * (1 << 15))
    feats = compute_mfcc(wav, num_mel_bins=23, num_ceps=13)
    assert feats.shape[-1] == 13


def whisper_reference_logmel(audio: np.ndarray, n_mels=80):
    """openai-whisper log_mel_spectrogram re-implemented with torch.stft
    (the reference's python path delegates to the whisper package,
    ref processor.py:320-369)."""
    audio_t = torch.tensor(audio)
    window = torch.hann_window(400)
    stft = torch.stft(audio_t, 400, 160, window=window, center=True,
                      return_complex=True)
    magnitudes = stft[..., :-1].abs()**2
    filters = torch.tensor(slaney_mel_banks(n_mels, 400, SR).T)
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).numpy().T  # (T, M)


def test_whisper_logmel_matches_torch_stft():
    audio = tone(523.25, seconds=2.0) + 0.1 * np.random.RandomState(
        0).randn(2 * SR).astype(np.float32)
    ref = whisper_reference_logmel(audio)
    ours = np.asarray(
        compute_log_mel_spectrogram(jnp.asarray(audio[None, :])))[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_mel_banks_cover_spectrum():
    banks = kaldi_mel_banks(80, 512, SR)
    # every fft bin between ~60Hz and nyquist-ish contributes somewhere
    coverage = banks.sum(1)
    assert (coverage[4:250] > 0).all()


def test_native_fbank_matches_numpy():
    import pytest
    from wenet_tpu.ops.fbank import compute_fbank_np
    from wenet_tpu.runtime import native_fbank
    if not native_fbank.available():
        pytest.skip('libfbank.so not built')
    rng = np.random.RandomState(0)
    wav = (0.3 * rng.randn(16000 * 2)).astype(np.float32) * (1 << 15)
    ref = compute_fbank_np(wav, num_mel_bins=80)
    nf = native_fbank.NativeFbank(80)
    got = nf.compute(wav)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_traced_spec_augment():
    import jax
    import jax.numpy as jnp
    from wenet_tpu.ops.spec_augment import (spec_aug, spec_sub,
                                            spec_trim)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 50, 20), jnp.float32)
    key = jax.random.PRNGKey(0)
    out = jax.jit(spec_aug)(key, feats)
    assert out.shape == feats.shape
    # some values zeroed, most unchanged
    z = float(jnp.mean(out == 0.0))
    assert 0.0 < z < 0.9
    out2 = jax.jit(spec_sub)(key, feats)
    assert out2.shape == feats.shape
    assert float(jnp.mean(out2 != feats)) > 0.0
    f3, l3 = jax.jit(spec_trim)(key, feats, jnp.asarray([50, 40]))
    assert np.all(np.asarray(l3) <= np.asarray([50, 40]))
