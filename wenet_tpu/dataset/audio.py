"""Audio IO + resampling, numpy-native.

Replaces the reference's torchaudio.load / torchaudio.transforms.Resample
/ sox speed effect (ref wenet/dataset/processor.py:125-224) and the C++
WavReader (ref runtime/core/frontend/wav.h)."""

import io
import struct
from typing import Optional, Tuple

import numpy as np


def read_wav(path_or_bytes, start_frame: int = 0,
             num_frames: int = -1) -> Tuple[np.ndarray, int]:
    """RIFF WAV -> (waveform (channels, S) float32 in [-1, 1], rate).

    Supports PCM 8/16/24/32-bit and IEEE float32."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        f = io.BytesIO(path_or_bytes)
    else:
        f = open(path_or_bytes, 'rb')
    try:
        riff, _, wave = struct.unpack('<4sI4s', f.read(12))
        assert riff == b'RIFF' and wave == b'WAVE', 'not a RIFF wav'
        fmt = None
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = struct.unpack('<4sI', hdr)
            if cid == b'fmt ':
                fmt = f.read(size)
                if size % 2:
                    f.read(1)
            elif cid == b'data':
                if num_frames >= 0 and fmt is not None:
                    (_, channels, _, _, block_align,
                     _) = struct.unpack('<HHIIHH', fmt[:16])
                    skip = min(start_frame * block_align, size)
                    f.seek(skip, 1)
                    # clamp to the data chunk — reading past it would
                    # swallow trailing LIST/INFO chunk bytes as PCM
                    want = min(num_frames * block_align, size - skip)
                    data = f.read(max(want, 0))
                    break
                data = f.read(size)
            else:
                f.seek(size + (size % 2), 1)
        assert fmt is not None and data is not None, 'malformed wav'
        (audio_fmt, channels, rate, _, _,
         bits) = struct.unpack('<HHIIHH', fmt[:16])
        if audio_fmt == 3 or (audio_fmt == 0xFFFE and bits == 32):
            wavf = np.frombuffer(data, '<f4').astype(np.float32)
        elif bits == 16:
            wavf = np.frombuffer(data, '<i2').astype(np.float32) / 32768.0
        elif bits == 32:
            wavf = np.frombuffer(data,
                                 '<i4').astype(np.float32) / 2147483648.0
        elif bits == 8:
            wavf = (np.frombuffer(data, np.uint8).astype(np.float32) -
                    128.0) / 128.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8).reshape(-1, 3)
            ints = (raw[:, 0].astype(np.int32) |
                    (raw[:, 1].astype(np.int32) << 8) |
                    (raw[:, 2].astype(np.int32) << 16))
            ints = np.where(ints >= (1 << 23), ints - (1 << 24), ints)
            wavf = ints.astype(np.float32) / 8388608.0
        else:
            raise ValueError(f'unsupported wav: fmt={audio_fmt} '
                             f'bits={bits}')
        n = (len(wavf) // channels) * channels
        wav = wavf[:n].reshape(-1, channels).T  # (C, S)
        if num_frames >= 0 and data is not None and \
                len(data) != num_frames * channels * (bits // 8):
            pass  # short read at EOF is fine
        return np.ascontiguousarray(wav), rate
    finally:
        f.close()


_flac_lib = None


def _load_flac():
    """ctypes handle to the from-scratch C++ FLAC decoder
    (runtime/cpp/flac_decoder.cc); builds on first use like
    runtime/native_beam.py."""
    global _flac_lib
    if _flac_lib is not None:
        return _flac_lib or None
    import ctypes
    import os
    import subprocess
    lib_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'runtime', 'cpp')
    lib_path = os.path.join(lib_dir, 'libflac_dec.so')
    if not os.path.exists(lib_path):
        try:
            subprocess.run(['make', '-C', lib_dir, 'libflac_dec.so'],
                           check=True, capture_output=True)
        except Exception:  # noqa: BLE001
            _flac_lib = False
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        _flac_lib = False
        return None
    c = ctypes
    lib.flac_decode.restype = c.c_int
    lib.flac_decode.argtypes = [
        c.c_char_p, c.c_size_t, c.POINTER(c.POINTER(c.c_int32)),
        c.POINTER(c.c_int64), c.POINTER(c.c_int), c.POINTER(c.c_int),
        c.POINTER(c.c_int)]
    lib.flac_info.restype = c.c_int
    lib.flac_info.argtypes = [
        c.c_char_p, c.c_size_t, c.POINTER(c.c_int64),
        c.POINTER(c.c_int), c.POINTER(c.c_int), c.POINTER(c.c_int)]
    lib.flac_free.argtypes = [c.POINTER(c.c_int32)]
    _flac_lib = lib
    return lib


def read_flac(path_or_bytes) -> Tuple[np.ndarray, int]:
    """FLAC -> ((channels, S) float32 in [-1, 1], rate) via the native
    decoder.  LibriSpeech-family corpora ship flac; the reference reads
    them through torchaudio/sox (ref processor.py:125-153)."""
    import ctypes
    lib = _load_flac()
    if lib is None:
        raise RuntimeError('libflac_dec.so unavailable (g++ missing?)')
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, 'rb') as f:
            raw = f.read()
    samples = ctypes.POINTER(ctypes.c_int32)()
    frames = ctypes.c_int64()
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    bps = ctypes.c_int()
    rc = lib.flac_decode(raw, len(raw), ctypes.byref(samples),
                         ctypes.byref(frames), ctypes.byref(channels),
                         ctypes.byref(rate), ctypes.byref(bps))
    if rc != 0:
        raise ValueError(f'flac decode failed rc={rc}')
    try:
        n = frames.value * channels.value
        pcm = np.ctypeslib.as_array(samples, shape=(n,)).copy()
    finally:
        lib.flac_free(samples)
    wav = pcm.astype(np.float32) / float(1 << (bps.value - 1))
    return (np.ascontiguousarray(
        wav.reshape(-1, channels.value).T), rate.value)


def flac_info(path) -> Tuple[int, int, int]:
    """(sample_rate, num_frames, channels) from STREAMINFO only."""
    import ctypes
    lib = _load_flac()
    if lib is None:
        raise RuntimeError('libflac_dec.so unavailable (g++ missing?)')
    with open(path, 'rb') as f:
        head = f.read(64)
    frames = ctypes.c_int64()
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    bps = ctypes.c_int()
    rc = lib.flac_info(head, len(head), ctypes.byref(frames),
                       ctypes.byref(channels), ctypes.byref(rate),
                       ctypes.byref(bps))
    if rc != 0:
        raise ValueError(f'flac info failed rc={rc}')
    return rate.value, int(frames.value), channels.value


def read_audio(path_or_bytes) -> Tuple[np.ndarray, int]:
    """Magic-sniffing reader: RIFF wav or FLAC."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        head = bytes(path_or_bytes[:4])
    else:
        with open(path_or_bytes, 'rb') as f:
            head = f.read(4)
    if head == b'fLaC':
        return read_flac(path_or_bytes)
    return read_wav(path_or_bytes)


def wav_info(path) -> Tuple[int, int, int]:
    """(sample_rate, num_frames, channels) without reading data."""
    with open(path, 'rb') as f:
        f.read(12)
        rate, channels, bits, data_size = 16000, 1, 16, 0
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = struct.unpack('<4sI', hdr)
            if cid == b'fmt ':
                fmt = f.read(size)
                (_, channels, rate, _, _,
                 bits) = struct.unpack('<HHIIHH', fmt[:16])
                if size % 2:
                    f.read(1)
            elif cid == b'data':
                data_size = size
                break
            else:
                f.seek(size + (size % 2), 1)
    return rate, data_size // (channels * (bits // 8)), channels


def write_wav(path, waveform: np.ndarray, rate: int):
    """float32 (C, S) or (S,) -> 16-bit PCM wav."""
    wav = np.atleast_2d(np.asarray(waveform))
    pcm = np.clip(wav.T * 32768.0, -32768, 32767).astype('<i2')
    data = pcm.tobytes()
    C = wav.shape[0]
    with open(path, 'wb') as f:
        f.write(struct.pack('<4sI4s', b'RIFF', 36 + len(data), b'WAVE'))
        f.write(struct.pack('<4sIHHIIHH', b'fmt ', 16, 1, C, rate,
                            rate * C * 2, C * 2, 16))
        f.write(struct.pack('<4sI', b'data', len(data)))
        f.write(data)


def resample(waveform: np.ndarray, orig_rate: int,
             new_rate: int) -> np.ndarray:
    """Polyphase resampling (scipy), replaces torchaudio Resample."""
    if orig_rate == new_rate:
        return waveform
    from math import gcd
    from scipy.signal import resample_poly
    g = gcd(orig_rate, new_rate)
    return resample_poly(waveform, new_rate // g, orig_rate // g,
                         axis=-1).astype(np.float32)


def speed_perturb(waveform: np.ndarray, rate: int,
                  speed: float) -> np.ndarray:
    """sox-style tempo+pitch 'speed' effect == resample by 1/speed.

    ref: processor.py:199-224 (sox_effects speed)."""
    if speed == 1.0:
        return waveform
    from math import gcd
    from scipy.signal import resample_poly
    up = int(round(rate / speed))
    down = rate
    g = gcd(up, down)
    return resample_poly(waveform, up // g, down // g,
                         axis=-1).astype(np.float32)
