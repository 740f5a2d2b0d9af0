"""ctypes wrapper over the C++ incremental prefix beam search.

Falls back to the pure-python searcher when the shared lib isn't built
(build with `make -C wenet_tpu/runtime/cpp`)."""

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), 'cpp')
_LIB_PATH = os.path.join(_LIB_DIR, 'libctc_beam.so')
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', _LIB_DIR], check=True,
                           capture_output=True)
        except Exception:  # noqa: BLE001
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    if not hasattr(lib, 'ctc_beam_search_topk'):
        # stale .so from before the sparse entry existed: rebuild once
        try:
            subprocess.run(['make', '-C', _LIB_DIR, '-B',
                            'libctc_beam.so'],
                           check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:  # noqa: BLE001
            pass
        if not hasattr(lib, 'ctc_beam_search_topk'):
            return None
    lib.ctc_beam_create.restype = ctypes.c_void_p
    lib.ctc_beam_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.ctc_beam_destroy.argtypes = [ctypes.c_void_p]
    lib.ctc_beam_reset.argtypes = [ctypes.c_void_p]
    lib.ctc_beam_search.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int, ctypes.c_int]
    if hasattr(lib, 'ctc_beam_search_topk'):
        lib.ctc_beam_search_topk.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int]
    lib.ctc_beam_num_hyps.restype = ctypes.c_int
    lib.ctc_beam_num_hyps.argtypes = [ctypes.c_void_p]
    lib.ctc_beam_hyp_len.restype = ctypes.c_int
    lib.ctc_beam_hyp_len.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ctc_beam_hyp.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeCtcPrefixBeamSearch:
    """Drop-in replacement for runtime.ctc_prefix_beam_search (no
    context-graph support; python fallback covers biasing)."""

    def __init__(self, beam_size: int = 10, blank_id: int = 0):
        lib = _load()
        assert lib is not None, 'libctc_beam.so not available'
        self._lib = lib
        self._h = lib.ctc_beam_create(beam_size, blank_id)
        self.beam_size = beam_size
        self.blank_id = blank_id
        self._cache = None

    def __del__(self):
        if getattr(self, '_h', None):
            self._lib.ctc_beam_destroy(self._h)
            self._h = None

    def reset(self):
        self._lib.ctc_beam_reset(self._h)
        self._cache = None

    def search(self, ctc_log_probs: np.ndarray):
        logp = np.ascontiguousarray(ctc_log_probs, np.float32)
        T, V = logp.shape
        if T == 0:
            return
        self._cache = None
        self._lib.ctc_beam_search(
            self._h, logp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            T, V)

    def search_topk(self, vals: np.ndarray, ids: np.ndarray):
        """Advance over pre-selected per-frame candidates
        (vals/ids: (T, K) from a device-side jax.lax.top_k).
        Exactly equivalent to search() — the reference beam only
        considers the per-frame top-k (ref search.py:146)."""
        vals = np.ascontiguousarray(vals, np.float32)
        ids = np.ascontiguousarray(ids, np.int32)
        T, K = vals.shape
        if T == 0:
            return
        self._cache = None
        self._lib.ctc_beam_search_topk(
            self._h, vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), T, K)

    def finalize_search(self):
        pass

    def _collect(self):
        # cached between searches: _update_result reads hypotheses/
        # times/likelihood back-to-back every chunk — re-walking the C
        # beam via FFI each time is redundant
        if self._cache is not None:
            return self._cache
        n = self._lib.ctc_beam_num_hyps(self._h)
        hyps, times, scores = [], [], []
        for i in range(n):
            L = self._lib.ctc_beam_hyp_len(self._h, i)
            toks = (ctypes.c_int * max(L, 1))()
            tms = (ctypes.c_int * max(L, 1))()
            score = ctypes.c_float()
            self._lib.ctc_beam_hyp(self._h, i, toks, tms,
                                   ctypes.byref(score))
            hyps.append(list(toks[:L]))
            times.append(list(tms[:L]))
            scores.append(float(score.value))
        self._cache = (hyps, times, scores)
        return self._cache

    @property
    def hypotheses(self) -> List[List[int]]:
        return self._collect()[0]

    @property
    def times(self) -> List[List[int]]:
        return self._collect()[1]

    @property
    def likelihood(self) -> List[float]:
        return self._collect()[2]


def batch_search_topk(vals: np.ndarray, ids: np.ndarray,
                      lens: np.ndarray, beam_size: int,
                      blank_id: int = 0, num_threads: int = 8):
    """Run the C++ beam over a batch of utterances in parallel.

    vals/ids: (B, T, K) per-frame top-k from the device; lens: (B,)
    valid frame counts.  ctypes releases the GIL during the C call, so
    a thread pool gives real parallelism.  Returns per-utterance
    (hyps, times, scores) triples (beam-sorted, like _collect)."""
    from concurrent.futures import ThreadPoolExecutor
    B = vals.shape[0]

    def one(b):
        s = NativeCtcPrefixBeamSearch(beam_size, blank_id)
        n = int(lens[b])
        s.search_topk(vals[b, :n], ids[b, :n])
        return s._collect()

    if B == 1:
        return [one(0)]
    with ThreadPoolExecutor(min(num_threads, B)) as ex:
        return list(ex.map(one, range(B)))


def make_searcher(beam_size: int = 10, blank_id: int = 0,
                  context_graph=None, prefer_native: bool = True):
    """Factory: native C++ unless biasing requested or lib missing."""
    if prefer_native and context_graph is None and available():
        return NativeCtcPrefixBeamSearch(beam_size, blank_id)
    from wenet_tpu.runtime.ctc_prefix_beam_search import (
        CtcPrefixBeamSearch)
    return CtcPrefixBeamSearch(beam_size, context_graph=context_graph,
                               blank_id=blank_id)
