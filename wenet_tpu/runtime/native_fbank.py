"""ctypes wrapper over the C++ kaldi fbank (libfbank.so).

Used by FeaturePipeline when available; falls back to the numpy
implementation (identical numerics, tested to 1e-3 relative)."""

import ctypes
import os
import subprocess

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), 'cpp')
_LIB_PATH = os.path.join(_LIB_DIR, 'libfbank.so')
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', _LIB_DIR, 'libfbank.so'],
                           check=True, capture_output=True)
        except Exception:  # noqa: BLE001
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fbank_create.restype = ctypes.c_void_p
    lib.fbank_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                 ctypes.c_float, ctypes.c_float]
    lib.fbank_destroy.argtypes = [ctypes.c_void_p]
    lib.fbank_num_frames.restype = ctypes.c_int
    lib.fbank_num_frames.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.fbank_compute.restype = ctypes.c_int
    lib.fbank_compute.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeFbank:

    def __init__(self, num_mel_bins: int = 80, sample_rate: int = 16000,
                 frame_length_ms: float = 25.0,
                 frame_shift_ms: float = 10.0):
        lib = _load()
        assert lib is not None, 'libfbank.so not available'
        self._lib = lib
        self._h = lib.fbank_create(num_mel_bins, sample_rate,
                                   frame_length_ms, frame_shift_ms)
        self.num_mel_bins = num_mel_bins

    def __del__(self):
        if getattr(self, '_h', None):
            self._lib.fbank_destroy(self._h)
            self._h = None

    def compute(self, wav: np.ndarray) -> np.ndarray:
        """wav: int16-scaled float samples -> (T, mel) float32."""
        wav = np.ascontiguousarray(wav, np.float32)
        T = self._lib.fbank_num_frames(self._h, len(wav))
        out = np.zeros((max(T, 0), self.num_mel_bins), np.float32)
        if T > 0:
            self._lib.fbank_compute(
                self._h, wav.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)), len(wav),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
