"""CTC TLG/WFST beam search (token passing Viterbi over a text FST).

Analog of the reference's CtcWfstBeamSearch + Kaldi
LatticeFasterOnlineDecoder (ref:
runtime/core/decoder/ctc_wfst_beam_search.{h,cc}): per frame, if the
blank posterior exceeds `blank_skip_thresh` the frame is skipped
(blank frame-skipping, ctc_wfst_beam_search.cc:77-85); otherwise the
top-k tokens advance every active decoding state over matching TLG
arcs, epsilon closures are expanded eagerly, and the beam keeps the
best `max_active` states.  Output words come from arc olabels.

Incremental + stateful like the prefix beam searcher, so it drops into
`AsrDecoder` via the same searcher interface.
"""

import heapq
import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from wenet_tpu.lm.fst import TextFst


@dataclass
class _Token:
    cost: float  # total -log score (acoustic*scale + graph)
    words: Tuple[int, ...]
    times: Tuple[int, ...]


class CtcWfstBeamSearch:

    def __init__(self, fst: TextFst,
                 word_table: Optional[Dict[int, str]] = None,
                 beam_size: int = 10,
                 max_active: int = 7000,
                 acoustic_scale: float = 1.0,
                 blank_skip_thresh: float = 0.98,
                 blank_id: int = 0,
                 top_k: int = 10):
        self.fst = fst
        self.word_table = word_table or {}
        self.beam_size = beam_size
        self.max_active = max_active
        self.acoustic_scale = acoustic_scale
        self.blank_skip_thresh = blank_skip_thresh
        self.blank_id = blank_id
        self.top_k = top_k
        self.reset()

    def reset(self):
        self.abs_time = 0
        # state -> best token reaching it
        self.tokens: Dict[int, _Token] = {}
        self._add_token(self.fst.start, _Token(0.0, (), ()))
        self._expand_eps()
        self._final = None

    # -- internals -----------------------------------------------------
    def _add_token(self, state: int, tok: _Token) -> bool:
        cur = self.tokens.get(state)
        if cur is None or tok.cost < cur.cost:
            self.tokens[state] = tok
            return True
        return False

    def _expand_eps(self):
        """Eagerly follow ilabel-0 arcs (eps/blank loops handled in
        Search)."""
        queue = list(self.tokens.items())
        while queue:
            state, tok = queue.pop()
            if self.tokens.get(state) is not tok:
                continue
            for arc in self.fst.state_arcs(state):
                if arc.ilabel != 0:
                    continue
                nw = tok.words + ((arc.olabel,) if arc.olabel else ())
                nt = _Token(tok.cost + arc.weight, nw, tok.times)
                if self._add_token(arc.nextstate, nt):
                    queue.append((arc.nextstate, nt))

    def _prune(self):
        if len(self.tokens) <= self.max_active:
            return
        best = heapq.nsmallest(self.max_active, self.tokens.items(),
                               key=lambda kv: kv[1].cost)
        self.tokens = dict(best)

    # -- searcher interface (matches CtcPrefixBeamSearch) --------------
    def search(self, ctc_log_probs: np.ndarray):
        for frame in np.asarray(ctc_log_probs):
            t = self.abs_time
            self.abs_time += 1
            if math.exp(frame[self.blank_id]) > self.blank_skip_thresh:
                continue  # blank frame-skip (stay via implicit self-loop)
            k = min(self.top_k, len(frame))
            cand = np.argpartition(-frame, k - 1)[:k]
            next_tokens: Dict[int, _Token] = {}

            def add(state, tok):
                cur = next_tokens.get(state)
                if cur is None or tok.cost < cur.cost:
                    next_tokens[state] = tok

            for state, tok in self.tokens.items():
                # blank / token self-loop: stay put paying blank cost
                stay = _Token(
                    tok.cost - self.acoustic_scale *
                    float(frame[self.blank_id]),
                    tok.words, tok.times)
                add(state, stay)
                for arc in self.fst.state_arcs(state):
                    if arc.ilabel == 0:
                        continue
                    u = arc.ilabel - 1  # ilabel = token_id + 1
                    if u not in cand and u != int(np.argmax(frame)):
                        continue
                    ac = -self.acoustic_scale * float(frame[u])
                    nw = tok.words + ((arc.olabel,) if arc.olabel
                                      else ())
                    ntimes = tok.times + ((t,) if arc.olabel else ())
                    add(arc.nextstate,
                        _Token(tok.cost + arc.weight + ac, nw, ntimes))
            self.tokens = next_tokens
            self._expand_eps()
            self._prune()

    def finalize_search(self):
        """Add final costs; keep only completable paths if any."""
        finals: List[Tuple[float, _Token]] = []
        for state, tok in self.tokens.items():
            fc = self.fst.final_cost(state)
            if fc != float('inf'):
                finals.append((tok.cost + fc, tok))
        if finals:
            finals.sort(key=lambda x: x[0])
            self._final = finals[:self.beam_size]
        else:
            best = sorted(self.tokens.values(),
                          key=lambda tk: tk.cost)[:self.beam_size]
            self._final = [(tk.cost, tk) for tk in best]

    def _nbest(self):
        if self._final is not None:
            pool = self._final
        else:
            # dedupe by word sequence, best-cost first
            best: Dict[Tuple[int, ...], Tuple[float, _Token]] = {}
            for tok in self.tokens.values():
                cur = best.get(tok.words)
                if cur is None or tok.cost < cur[0]:
                    best[tok.words] = (tok.cost, tok)
            pool = sorted(best.values(), key=lambda x: x[0])
            pool = pool[:self.beam_size]
        return pool

    @property
    def hypotheses(self) -> List[List[int]]:
        return [list(tok.words) for _, tok in self._nbest()]

    @property
    def likelihood(self) -> List[float]:
        return [-cost for cost, _ in self._nbest()]

    @property
    def times(self) -> List[List[int]]:
        return [list(tok.times) for _, tok in self._nbest()]

    def words(self) -> List[str]:
        """Best path as word strings (olabel lookup)."""
        hyps = self.hypotheses
        if not hyps:
            return []
        return [self.word_table.get(w, str(w)) for w in hyps[0]]
