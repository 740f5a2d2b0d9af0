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
    if not hasattr(lib, 'ctc_beam_set_context'):
        # stale .so from before sparse/biasing entries existed:
        # rebuild once
        try:
            subprocess.run(['make', '-C', _LIB_DIR, '-B',
                            'libctc_beam.so'],
                           check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:  # noqa: BLE001
            pass
        if not hasattr(lib, 'ctc_beam_set_context'):
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
    if hasattr(lib, 'ctc_beam_set_context'):
        lib.ctc_beam_set_context.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.ctc_lm_create.restype = ctypes.c_void_p
        lib.ctc_lm_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int]
        lib.ctc_lm_add_table.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        lib.ctc_lm_destroy.argtypes = [ctypes.c_void_p]
        lib.ctc_beam_attach_lm.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_float]
        lib.ctc_beam_finalize.argtypes = [ctypes.c_void_p]
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


def _carr(dtype, seq):
    a = np.ascontiguousarray(seq, dtype)
    ptr = {np.int32: ctypes.POINTER(ctypes.c_int),
           np.float32: ctypes.POINTER(ctypes.c_float)}[dtype]
    return a, a.ctypes.data_as(ptr)


def flatten_context_graph(graph):
    """ContextGraph (utils/context_graph.py) -> flat arrays for the C++
    searcher: (fail, node_score, output_score, token_score, trans).

    The flat arrays are cached on the graph object: the trie is
    immutable after construction, and batch_search_topk builds one
    searcher per utterance — without the cache a B=16 batch re-walks
    the full python trie 16 times per decode call."""
    flat = getattr(graph, '_native_flat', None)
    if flat is not None:
        return flat
    flat = _flatten_context_graph_impl(graph)
    try:
        graph._native_flat = flat
    except AttributeError:
        pass
    return flat


def _flatten_context_graph_impl(graph):
    n = graph.num_nodes + 1
    fail = np.zeros(n, np.int32)
    node_score = np.zeros(n, np.float32)
    output_score = np.zeros(n, np.float32)
    token_score = np.zeros(n, np.float32)
    trans = []
    stack = [graph.root]
    seen = set()
    while stack:
        node = stack.pop()
        if node.id in seen:
            continue
        seen.add(node.id)
        fail[node.id] = node.fail.id if node.fail is not None else 0
        node_score[node.id] = node.node_score
        output_score[node.id] = node.output_score
        token_score[node.id] = node.token_score
        for tok, child in node.next.items():
            trans.append((node.id, tok, child.id))
            stack.append(child)
    trans = np.asarray(trans or np.zeros((0, 3)), np.int32)
    return fail, node_score, output_score, token_score, trans


def _flatten_lm(lm, symbol_table, vocab_size):
    """NgramLM (lm/arpa.py) -> (tok2word, bos, eos, tables) with word
    ids; tables[k] = (ids (count, k+1), logp, backoff) natural log."""
    word2id = {}

    def wid(w):
        if w not in word2id:
            word2id[w] = len(word2id)
        return word2id[w]

    tables = []
    for k, grams in enumerate(lm.ngrams):
        ids = np.zeros((len(grams), k + 1), np.int32)
        logp = np.zeros(len(grams), np.float32)
        backoff = np.zeros(len(grams), np.float32)
        for e, (words, (lp, bo)) in enumerate(grams.items()):
            for j, w in enumerate(words):
                ids[e, j] = wid(w)
            logp[e] = lp
            backoff[e] = bo
        tables.append((ids, logp, backoff))
    unk = word2id.get('<unk>', -1)
    symbol_table = symbol_table or {}
    tok2word = np.full(vocab_size, unk, np.int32)
    for t in range(vocab_size):
        sym = symbol_table.get(t, str(t))
        if sym in lm.vocab:
            tok2word[t] = word2id[sym]
    bos = word2id.get('<s>', -9)   # -9: matches nothing, backs off
    eos = word2id.get('</s>', unk)
    return tok2word, bos, eos, tables


class NativeLm:
    """Shared flattened ARPA LM living in C++; built ONCE per
    (NgramLM, symbol_table) and attached to any number of searchers
    (read-only scoring, thread-safe)."""

    def __init__(self, lm, symbol_table=None, vocab_size=0):
        lib = _load()
        assert lib is not None
        self._lib = lib
        if not vocab_size:
            vocab_size = (max(symbol_table) + 1) if symbol_table else \
                65536
        tok2word, bos, eos, tables = _flatten_lm(lm, symbol_table,
                                                 vocab_size)
        t2w_a, p_t2w = _carr(np.int32, tok2word)
        self.handle = lib.ctc_lm_create(lm.order, len(tok2word), p_t2w,
                                        bos, eos)
        for k, (ids, logp, backoff) in enumerate(tables):
            i_a, p_i = _carr(np.int32, ids)
            l_a, p_l = _carr(np.float32, logp)
            b_a, p_b = _carr(np.float32, backoff)
            lib.ctc_lm_add_table(self.handle, k + 1, ids.shape[0],
                                 p_i, p_l, p_b)

    def __del__(self):
        if getattr(self, 'handle', None):
            self._lib.ctc_lm_destroy(self.handle)
            self.handle = None

    @classmethod
    def get(cls, lm, symbol_table=None, vocab_size=0):
        """Cached build, stored ON the NgramLM object itself so the
        flattened C++ copy (a) dies with the python LM — no unbounded
        class-level growth under per-connection AsrDecoder creation —
        and (b) can never be served to an unrelated LM whose id() was
        recycled.  Reused across calls when the symbol mapping is
        equal (serving rebuilds the dict per session) and the cached
        vocab covers the requested one."""
        if not vocab_size:
            vocab_size = (max(symbol_table) + 1) if symbol_table else \
                65536
        ent = getattr(lm, '_native_lm_cache', None)
        if ent is not None:
            c_syms, c_vocab, native = ent
            if c_vocab >= int(vocab_size) and c_syms == symbol_table:
                return native
        native = cls(lm, symbol_table, vocab_size)
        try:
            lm._native_lm_cache = (symbol_table, int(vocab_size),
                                   native)
        except AttributeError:
            pass
        return native


class NativeCtcPrefixBeamSearch:
    """Drop-in replacement for runtime.ctc_prefix_beam_search, incl.
    context-graph biasing and ARPA shallow fusion IN the C++ hot loop
    (the reference integrates biasing the same way,
    runtime/core/decoder/ctc_prefix_beam_search.h:35-125 +
    context_graph.cc)."""

    def __init__(self, beam_size: int = 10, blank_id: int = 0,
                 context_graph=None, lm=None, lm_weight: float = 0.5,
                 symbol_table=None, lm_vocab_size: int = 0):
        lib = _load()
        assert lib is not None, 'libctc_beam.so not available'
        self._lib = lib
        self._h = lib.ctc_beam_create(beam_size, blank_id)
        self.beam_size = beam_size
        self.blank_id = blank_id
        self._cache = None
        if context_graph is not None:
            self.set_context_graph(context_graph)
        if lm is not None:
            self.set_lm(lm, lm_weight, symbol_table, lm_vocab_size)

    def set_context_graph(self, graph):
        fail, ns, os_, ts, trans = flatten_context_graph(graph)
        _, p_fail = _carr(np.int32, fail)
        _, p_ns = _carr(np.float32, ns)
        _, p_os = _carr(np.float32, os_)
        _, p_ts = _carr(np.float32, ts)
        tf, p_tf = _carr(np.int32, trans[:, 0] if len(trans) else [])
        tt, p_tt = _carr(np.int32, trans[:, 1] if len(trans) else [])
        tc, p_tc = _carr(np.int32, trans[:, 2] if len(trans) else [])
        self._lib.ctc_beam_set_context(
            self._h, len(fail), p_fail, p_ns, p_os, p_ts, len(trans),
            p_tf, p_tt, p_tc)
        self._cache = None

    def set_lm(self, lm, lm_weight=0.5, symbol_table=None,
               vocab_size=0):
        native = NativeLm.get(lm, symbol_table, vocab_size)
        self._native_lm = native  # keep alive
        self._lib.ctc_beam_attach_lm(self._h, native.handle,
                                     ctypes.c_float(lm_weight))
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
        """End-of-utterance: LM </s> + context partial-match backoff
        (python analog: ctc_prefix_beam_search.py:130-152)."""
        self._lib.ctc_beam_finalize(self._h)
        self._cache = None

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
                      blank_id: int = 0, num_threads: int = 8,
                      context_graph=None, lm=None,
                      lm_weight: float = 0.5, symbol_table=None,
                      finalize: bool = False):
    """Run the C++ beam over a batch of utterances in parallel.

    vals/ids: (B, T, K) per-frame top-k from the device; lens: (B,)
    valid frame counts.  ctypes releases the GIL during the C call, so
    a thread pool gives real parallelism.  Returns per-utterance
    (hyps, times, scores) triples (beam-sorted, like _collect)."""
    from concurrent.futures import ThreadPoolExecutor
    B = vals.shape[0]
    # stable vocab: with a symbol_table NativeLm derives
    # max(symbol_table)+1 itself (vocab_size=0) so every batch hits the
    # same cached C++ LM; the ids.max() fallback only applies when no
    # symbol mapping exists at all
    lm_vocab = 0
    if lm is not None and symbol_table is None and ids.size:
        lm_vocab = int(ids.max()) + 1

    def one(b):
        s = NativeCtcPrefixBeamSearch(
            beam_size, blank_id, context_graph=context_graph, lm=lm,
            lm_weight=lm_weight, symbol_table=symbol_table,
            lm_vocab_size=lm_vocab)
        n = int(lens[b])
        s.search_topk(vals[b, :n], ids[b, :n])
        if finalize or context_graph is not None or lm is not None:
            s.finalize_search()
        return s._collect()

    if B == 1:
        return [one(0)]
    with ThreadPoolExecutor(min(num_threads, B)) as ex:
        return list(ex.map(one, range(B)))


def make_searcher(beam_size: int = 10, blank_id: int = 0,
                  context_graph=None, lm=None, lm_weight: float = 0.5,
                  symbol_table=None, prefer_native: bool = True):
    """Factory: native C++ (incl. biasing/LM fusion) unless the lib is
    missing."""
    if prefer_native and available():
        return NativeCtcPrefixBeamSearch(
            beam_size, blank_id, context_graph=context_graph, lm=lm,
            lm_weight=lm_weight, symbol_table=symbol_table)
    from wenet_tpu.runtime.ctc_prefix_beam_search import (
        CtcPrefixBeamSearch)
    return CtcPrefixBeamSearch(beam_size, context_graph=context_graph,
                               blank_id=blank_id, lm=lm,
                               lm_weight=lm_weight,
                               symbol_table=symbol_table)
