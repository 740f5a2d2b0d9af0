"""Incremental CTC prefix beam search for streaming serving.

ref: runtime/core/decoder/ctc_prefix_beam_search.{h,cc}.  Stateful: each
`search(chunk_log_probs)` call advances the beam over the new frames;
absolute frame indices keep timestamps consistent across chunks.
Posteriors come from the chip; this host search is O(frames * beam^2)
python, overlapped with the next chunk's device compute by the server.
"""

import math
from collections import defaultdict
from typing import List, Optional

import numpy as np

from wenet_tpu.utils.context_graph import _PrefixScore, _log_add


class CtcPrefixBeamSearch:

    def __init__(self, opts_beam_size: int = 10,
                 first_beam_size: Optional[int] = None,
                 context_graph=None, blank_id: int = 0,
                 lm=None, lm_weight: float = 0.5,
                 symbol_table=None):
        """lm: optional `wenet_tpu.lm.arpa.NgramLM` for token-level
        shallow fusion (TPU-native replacement for the reference's TLG
        G composition, docs/lm.md); symbol_table maps token id -> LM
        word (char models: tokens ARE words)."""
        self.beam_size = opts_beam_size
        self.first_beam_size = first_beam_size or opts_beam_size
        self.context_graph = context_graph
        self.blank_id = blank_id
        self.lm = lm
        self.lm_weight = lm_weight
        self.symbol_table = symbol_table or {}
        self.reset()

    def reset(self):
        root = (self.context_graph.root
                if self.context_graph is not None else None)
        self.cur_hyps = [(tuple(),
                          _PrefixScore(s=0.0, ns=-float('inf'), v_s=0.0,
                                       v_ns=0.0, context_state=root))]
        self.abs_time_step = 0
        self._lm_cache = {tuple(): (0.0, self.lm.start_state()
                                    if self.lm else None)}

    def _lm_score(self, prefix: tuple) -> float:
        """Cumulative fused LM score of `prefix` (lazily extended —
        each new prefix differs from a cached ancestor by one token)."""
        if self.lm is None:
            return 0.0
        cached = self._lm_cache.get(prefix)
        if cached is None:
            base = self._lm_score(prefix[:-1])  # fills parent entry
            state = self._lm_cache[prefix[:-1]][1]
            sym = self.symbol_table.get(int(prefix[-1]),
                                        str(int(prefix[-1])))
            delta, nstate = self.lm.advance(state, sym)
            cached = (base + delta, nstate)
            self._lm_cache[prefix] = cached
        return cached[0]

    def search(self, ctc_log_probs: np.ndarray):
        """Advance over (T, V) new frames. ref: ctc_prefix_beam_search.cc."""
        logp = np.asarray(ctc_log_probs)
        for t in range(logp.shape[0]):
            frame = logp[t]
            next_hyps = defaultdict(_PrefixScore)
            top_k = np.argpartition(-frame,
                                    min(self.first_beam_size,
                                        len(frame) - 1)
                                    )[:self.first_beam_size]
            for u in top_k:
                u = int(u)
                prob = float(frame[u])
                for prefix, ps in self.cur_hyps:
                    last = prefix[-1] if prefix else None
                    ts = self.abs_time_step
                    if u == self.blank_id:
                        nxt = next_hyps[prefix]
                        nxt.s = _log_add(nxt.s, ps.score() + prob)
                        nxt.v_s = ps.viterbi_score() + prob
                        nxt.times_s = ps.times().copy()
                        if self.context_graph and not nxt.has_context:
                            nxt.copy_context(ps)
                            nxt.has_context = True
                    elif u == last:
                        n1 = next_hyps[prefix]
                        n1.ns = _log_add(n1.ns, ps.ns + prob)
                        if n1.v_ns < ps.v_ns + prob:
                            n1.v_ns = ps.v_ns + prob
                            if n1.cur_token_prob < prob:
                                n1.cur_token_prob = prob
                                n1.times_ns = ps.times_ns.copy()
                                if n1.times_ns:
                                    n1.times_ns[-1] = ts
                        if self.context_graph and not n1.has_context:
                            n1.copy_context(ps)
                            n1.has_context = True
                        n2 = next_hyps[prefix + (u,)]
                        n2.ns = _log_add(n2.ns, ps.s + prob)
                        if n2.v_ns < ps.v_s + prob:
                            n2.v_ns = ps.v_s + prob
                            n2.cur_token_prob = prob
                            n2.times_ns = ps.times_s.copy()
                            n2.times_ns.append(ts)
                        if self.context_graph and not n2.has_context:
                            n2.update_context(self.context_graph, ps, u)
                            n2.has_context = True
                    else:
                        nxt = next_hyps[prefix + (u,)]
                        nxt.ns = _log_add(nxt.ns, ps.score() + prob)
                        if nxt.v_ns < ps.viterbi_score() + prob:
                            nxt.v_ns = ps.viterbi_score() + prob
                            nxt.cur_token_prob = prob
                            nxt.times_ns = ps.times().copy()
                            nxt.times_ns.append(ts)
                        if self.context_graph and not nxt.has_context:
                            nxt.update_context(self.context_graph, ps, u)
                            nxt.has_context = True
            self.cur_hyps = sorted(
                next_hyps.items(),
                key=lambda x: (x[1].total_score() +
                               self.lm_weight * self._lm_score(x[0])),
                reverse=True)[:self.beam_size]
            self.abs_time_step += 1

    def finalize_search(self):
        """Backoff context scores at utterance end; add LM </s>.
        ref: .cc FinalizeSearch."""
        if self.lm is not None:
            for prefix, ps in self.cur_hyps:
                self._lm_score(prefix)  # ensure cached
                score, state = self._lm_cache[prefix]
                self._lm_cache[prefix] = (score + self.lm.final(state),
                                          state)
            self.cur_hyps.sort(
                key=lambda x: (x[1].total_score() +
                               self.lm_weight * self._lm_score(x[0])),
                reverse=True)
        if self.context_graph is None:
            return
        for i, (prefix, ps) in enumerate(self.cur_hyps):
            score, state = self.context_graph.finalize(ps.context_state)
            # assignment (not +=) matches the reference exactly
            # (search.py:229-234): the final reported score carries
            # only the un-completed-match backoff; accumulated bonuses
            # influence pruning during the search, not the final score
            ps.context_score = score
            ps.context_state = state

    # -- results ---------------------------------------------------------
    @property
    def hypotheses(self) -> List[List[int]]:
        return [list(p) for p, _ in self.cur_hyps]

    @property
    def likelihood(self) -> List[float]:
        return [ps.total_score() +
                self.lm_weight * self._lm_score(p)
                for p, ps in self.cur_hyps]

    @property
    def viterbi_likelihood(self) -> List[float]:
        return [ps.viterbi_score() for _, ps in self.cur_hyps]

    @property
    def times(self) -> List[List[int]]:
        return [ps.times() for _, ps in self.cur_hyps]
