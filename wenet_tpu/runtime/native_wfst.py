"""ctypes wrapper over the C++ lattice WFST decoder
(runtime/cpp/wfst_lattice_decoder.cc) with the same searcher interface
as the python CtcWfstBeamSearch (runtime/wfst_beam_search.py):
reset/search/finalize_search + hypotheses/likelihood/times.

The native decoder keeps a real per-frame forward-link lattice (kaldi
LatticeFasterOnlineDecoder analog, ref
runtime/core/decoder/ctc_wfst_beam_search.{h,cc}) so its n-best comes
from exact best-first path enumeration over the lattice, not the
distinct-word-history token beam the python searcher uses.

`make_wfst_searcher` returns the native searcher when the shared lib
builds and the TLG is available as a file, else the python one.
"""

import ctypes
import os
import subprocess
import tempfile
from typing import Dict, List, Optional

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), 'cpp')
_LIB_PATH = os.path.join(_LIB_DIR, 'libwfst.so')
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', _LIB_DIR, 'libwfst.so'],
                           check=True, capture_output=True)
        except Exception:  # noqa: BLE001
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_int, c_float, c_void = ctypes.c_int, ctypes.c_float, ctypes.c_void_p
    lib.wfst_create.restype = c_void
    lib.wfst_create.argtypes = [ctypes.c_char_p, c_int, c_float,
                                c_float, c_float, c_float, c_int, c_int]
    lib.wfst_destroy.argtypes = [c_void]
    lib.wfst_reset.argtypes = [c_void]
    lib.wfst_search.argtypes = [c_void, ctypes.POINTER(c_float),
                                c_int, c_int]
    lib.wfst_finalize.argtypes = [c_void]
    lib.wfst_num_hyps.restype = c_int
    lib.wfst_num_hyps.argtypes = [c_void]
    lib.wfst_hyp_words_len.restype = c_int
    lib.wfst_hyp_words_len.argtypes = [c_void, c_int]
    lib.wfst_hyp_inputs_len.restype = c_int
    lib.wfst_hyp_inputs_len.argtypes = [c_void, c_int]
    lib.wfst_hyp.argtypes = [c_void, c_int, ctypes.POINTER(c_int),
                             ctypes.POINTER(c_int),
                             ctypes.POINTER(c_int),
                             ctypes.POINTER(c_int),
                             ctypes.POINTER(c_float)]
    _lib = lib
    return lib


class NativeCtcWfstBeamSearch:
    """Drop-in for runtime.wfst_beam_search.CtcWfstBeamSearch."""

    def __init__(self, fst_path: str,
                 word_table: Optional[Dict[int, str]] = None,
                 beam_size: int = 10,
                 max_active: int = 7000,
                 acoustic_scale: float = 1.0,
                 blank_skip_thresh: float = 0.98,
                 blank_scale: float = 1.0,
                 beam: float = 16.0,
                 blank_id: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError('libwfst.so unavailable')
        self._lib = lib
        self.word_table = word_table or {}
        self._h = lib.wfst_create(
            fst_path.encode(), blank_id, acoustic_scale,
            blank_skip_thresh, blank_scale, beam, max_active, beam_size)
        if not self._h:
            raise RuntimeError(f'could not parse TLG at {fst_path}')
        self._cache = None

    def __del__(self):
        if getattr(self, '_h', None):
            self._lib.wfst_destroy(self._h)
            self._h = None

    def reset(self):
        self._lib.wfst_reset(self._h)
        self._cache = None

    def search(self, ctc_log_probs: np.ndarray):
        logp = np.ascontiguousarray(ctc_log_probs, np.float32)
        if logp.ndim != 2 or logp.shape[0] == 0:
            return
        self._lib.wfst_search(
            self._h,
            logp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            logp.shape[0], logp.shape[1])
        self._cache = None

    def finalize_search(self):
        self._lib.wfst_finalize(self._h)
        self._cache = None

    def _collect(self):
        if self._cache is not None:
            return self._cache
        n = self._lib.wfst_num_hyps(self._h)
        hyps, wtimes, inputs, times, scores = [], [], [], [], []
        for i in range(n):
            wlen = self._lib.wfst_hyp_words_len(self._h, i)
            ilen = self._lib.wfst_hyp_inputs_len(self._h, i)
            w = (ctypes.c_int * max(1, wlen))()
            wt = (ctypes.c_int * max(1, wlen))()
            inp = (ctypes.c_int * max(1, ilen))()
            t = (ctypes.c_int * max(1, ilen))()
            sc = (ctypes.c_float * 3)()
            self._lib.wfst_hyp(self._h, i, w, wt, inp, t, sc)
            hyps.append(list(w[:wlen]))
            wtimes.append(list(wt[:wlen]))
            inputs.append(list(inp[:ilen]))
            times.append(list(t[:ilen]))
            scores.append((float(sc[0]), float(sc[1]), float(sc[2])))
        self._cache = (hyps, wtimes, inputs, times, scores)
        return self._cache

    @property
    def hypotheses(self) -> List[List[int]]:
        return self._collect()[0]

    @property
    def likelihood(self) -> List[float]:
        return [s[0] for s in self._collect()[4]]

    @property
    def times(self) -> List[List[int]]:
        """Word-level times (python-searcher convention)."""
        return self._collect()[1]

    @property
    def inputs(self) -> List[List[int]]:
        """CTC-token-level alignments (reference Inputs())."""
        return self._collect()[2]

    @property
    def input_times(self) -> List[List[int]]:
        return self._collect()[3]

    def split_costs(self) -> List[tuple]:
        """(graph_cost, acoustic_cost) per hyp, for hlg_rescore-style
        fusion."""
        return [(s[1], s[2]) for s in self._collect()[4]]

    def words(self) -> List[str]:
        hyps = self.hypotheses
        if not hyps:
            return []
        return [self.word_table.get(w, str(w)) for w in hyps[0]]


def make_wfst_searcher(tlg_fst, fst_path: Optional[str] = None,
                       **kwargs):
    """Native lattice searcher when available, python fallback.

    tlg_fst: a lm.fst.TextFst (used by the fallback, and serialized
    for the native decoder when no fst_path is given)."""
    if _load() is not None:
        tmp_path = None
        try:
            if fst_path is None and tlg_fst is not None:
                from wenet_tpu.lm.build_graph import write_text
                tmp = tempfile.NamedTemporaryFile(
                    mode='w', suffix='.tlg.txt', delete=False)
                tmp.close()
                write_text(tlg_fst, tmp.name)
                fst_path = tmp_path = tmp.name
            if fst_path is not None:
                return NativeCtcWfstBeamSearch(fst_path, **kwargs)
        except Exception:  # noqa: BLE001 - fall back to python
            pass
        finally:
            if tmp_path is not None:
                # the C++ side fully parses the file in wfst_create —
                # the serialization (can be 100s of MB) must not pile
                # up in /tmp
                try:
                    os.unlink(tmp_path)
                except OSError:
                    pass
    from wenet_tpu.runtime.wfst_beam_search import CtcWfstBeamSearch
    if tlg_fst is None and fst_path is not None:
        from wenet_tpu.lm.fst import TextFst
        tlg_fst = TextFst.read(fst_path)
    allowed = ('word_table', 'beam_size', 'max_active',
               'acoustic_scale', 'blank_skip_thresh', 'blank_id')
    py_kwargs = {k: v for k, v in kwargs.items() if k in allowed}
    return CtcWfstBeamSearch(tlg_fst, **py_kwargs)
