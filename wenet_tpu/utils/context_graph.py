"""Context biasing: Aho-Corasick trie with fail/output arcs.

ref: wenet/utils/context_graph.py:24-265.  Pure-python host component
(the graph walk is inherently sequential/pointer-chasing); the vectorized
TPU prefix beam search falls back to the sequential implementation below
when biasing is requested — posteriors still come from the device.
"""

import math
from collections import defaultdict, deque
from typing import Dict, List, Optional, Tuple


def tokenize(context_list_path: str, symbol_table: Dict[str, int],
             tokenizer=None) -> List[List[int]]:
    """Biasing phrases -> token id lists. ref: context_graph.py:24-58.

    `tokenizer` is any wenet_tpu BaseTokenizer (preferred over the
    reference's raw bpe_model path)."""
    with open(context_list_path) as fin:
        lines = [line.strip() for line in fin if line.strip()]
    out = []
    for txt in lines:
        labels = []
        if tokenizer is not None:
            _, labels = tokenizer.tokenize(txt)
        else:
            for ch in txt:
                if ch == ' ':
                    ch = '▁'
                if ch in symbol_table:
                    labels.append(symbol_table[ch])
                elif '<unk>' in symbol_table:
                    labels.append(symbol_table['<unk>'])
        out.append(labels)
    return out


class ContextState:
    """Trie node. ref: context_graph.py:61-100."""

    def __init__(self, id: int, token: int, token_score: float,
                 node_score: float, output_score: float, is_end: bool):
        self.id = id
        self.token = token
        self.token_score = token_score
        self.node_score = node_score
        self.output_score = output_score
        self.is_end = is_end
        self.next: Dict[int, 'ContextState'] = {}
        self.fail: Optional['ContextState'] = None
        self.output: Optional['ContextState'] = None


class ContextGraph:
    """Aho-Corasick biasing graph. ref: context_graph.py:103-265."""

    def __init__(self, context_list_path: str,
                 symbol_table: Dict[str, int], tokenizer=None,
                 context_score: float = 6.0,
                 context_list: Optional[List[List[int]]] = None):
        self.context_score = context_score
        if context_list is None:
            context_list = tokenize(context_list_path, symbol_table,
                                    tokenizer)
        self.context_list = context_list
        self.num_nodes = 0
        self.root = ContextState(0, -1, 0, 0, 0, False)
        self.root.fail = self.root
        self.build_graph(self.context_list)

    def build_graph(self, token_ids: List[List[int]]):
        for tokens in token_ids:
            node = self.root
            for i, token in enumerate(tokens):
                if token not in node.next:
                    self.num_nodes += 1
                    is_end = i == len(tokens) - 1
                    node_score = node.node_score + self.context_score
                    node.next[token] = ContextState(
                        self.num_nodes, token, self.context_score,
                        node_score, node_score if is_end else 0, is_end)
                node = node.next[token]
        self._fill_fail_output()

    def _fill_fail_output(self):
        queue = deque()
        for node in self.root.next.values():
            node.fail = self.root
            queue.append(node)
        while queue:
            current = queue.popleft()
            for token, node in current.next.items():
                fail = current.fail
                if token in fail.next:
                    fail = fail.next[token]
                else:
                    fail = fail.fail
                    while token not in fail.next:
                        fail = fail.fail
                        if fail.token == -1:
                            break
                    if token in fail.next:
                        fail = fail.next[token]
                node.fail = fail
                output = node.fail
                while not output.is_end:
                    output = output.fail
                    if output.token == -1:
                        output = None
                        break
                node.output = output
                node.output_score += (0 if output is None else
                                      output.output_score)
                queue.append(node)

    def forward_one_step(self, state: ContextState,
                         token: int) -> Tuple[float, ContextState]:
        if token in state.next:
            node = state.next[token]
            score = node.token_score
        else:
            node = state.fail
            while token not in node.next:
                node = node.fail
                if node.token == -1:
                    break
            if token in node.next:
                node = node.next[token]
            score = node.node_score - state.node_score
        return score + node.output_score, node

    def finalize(self, state: ContextState) -> Tuple[float, ContextState]:
        return -state.node_score, self.root


# ---------------------------------------------------------------------------
# sequential prefix beam search with biasing (host fallback)
# ---------------------------------------------------------------------------
def _log_add(a: float, b: float) -> float:
    if a == -float('inf') and b == -float('inf'):
        return -float('inf')
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


class _PrefixScore:
    """ref: search.py:64-106."""

    __slots__ = ('s', 'ns', 'v_s', 'v_ns', 'cur_token_prob', 'times_s',
                 'times_ns', 'context_state', 'context_score',
                 'has_context')

    def __init__(self, s=-float('inf'), ns=-float('inf'),
                 v_s=-float('inf'), v_ns=-float('inf'),
                 context_state=None, context_score=0.0):
        self.s = s
        self.ns = ns
        self.v_s = v_s
        self.v_ns = v_ns
        self.cur_token_prob = -float('inf')
        self.times_s: List[int] = []
        self.times_ns: List[int] = []
        self.context_state = context_state
        self.context_score = context_score
        self.has_context = False

    def score(self):
        return _log_add(self.s, self.ns)

    def viterbi_score(self):
        return self.v_s if self.v_s > self.v_ns else self.v_ns

    def times(self):
        return self.times_s if self.v_s > self.v_ns else self.times_ns

    def total_score(self):
        return self.score() + self.context_score

    def copy_context(self, other):
        self.context_score = other.context_score
        self.context_state = other.context_state

    def update_context(self, graph, other, word_id):
        self.copy_context(other)
        score, state = graph.forward_one_step(other.context_state,
                                              word_id)
        self.context_score += score
        self.context_state = state


def ctc_prefix_beam_search_with_context(ctc_probs, ctc_lens, beam_size,
                                        context_graph, blank_id=0):
    """Sequential biased beam search. ref: search.py:127-249."""
    import numpy as np
    from wenet_tpu.models.transformer.search import DecodeResult
    results = []
    for i in range(ctc_probs.shape[0]):
        ctc_prob = np.asarray(ctc_probs[i])
        num_t = int(ctc_lens[i])
        cur_hyps = [(tuple(),
                     _PrefixScore(s=0.0, ns=-float('inf'), v_s=0.0,
                                  v_ns=0.0,
                                  context_state=context_graph.root))]
        for t in range(num_t):
            logp = ctc_prob[t]
            next_hyps = defaultdict(_PrefixScore)
            top_k_index = np.argpartition(-logp, beam_size)[:beam_size]
            for u in top_k_index:
                u = int(u)
                prob = float(logp[u])
                for prefix, ps in cur_hyps:
                    last = prefix[-1] if prefix else None
                    if u == blank_id:
                        nxt = next_hyps[prefix]
                        nxt.s = _log_add(nxt.s, ps.score() + prob)
                        nxt.v_s = ps.viterbi_score() + prob
                        nxt.times_s = ps.times().copy()
                        if not nxt.has_context:
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
                                    n1.times_ns[-1] = t
                        if not n1.has_context:
                            n1.copy_context(ps)
                            n1.has_context = True
                        n_prefix = prefix + (u,)
                        n2 = next_hyps[n_prefix]
                        n2.ns = _log_add(n2.ns, ps.s + prob)
                        if n2.v_ns < ps.v_s + prob:
                            n2.v_ns = ps.v_s + prob
                            n2.cur_token_prob = prob
                            n2.times_ns = ps.times_s.copy()
                            n2.times_ns.append(t)
                        if not n2.has_context:
                            n2.update_context(context_graph, ps, u)
                            n2.has_context = True
                    else:
                        n_prefix = prefix + (u,)
                        nxt = next_hyps[n_prefix]
                        nxt.ns = _log_add(nxt.ns, ps.score() + prob)
                        if nxt.v_ns < ps.viterbi_score() + prob:
                            nxt.v_ns = ps.viterbi_score() + prob
                            nxt.cur_token_prob = prob
                            nxt.times_ns = ps.times().copy()
                            nxt.times_ns.append(t)
                        if not nxt.has_context:
                            nxt.update_context(context_graph, ps, u)
                            nxt.has_context = True
            cur_hyps = sorted(next_hyps.items(),
                              key=lambda x: x[1].total_score(),
                              reverse=True)[:beam_size]
        for k, hyp in enumerate(cur_hyps):
            score, state = context_graph.finalize(hyp[1].context_state)
            cur_hyps[k][1].context_score = score
            cur_hyps[k][1].context_state = state
        nbest = [list(y[0]) for y in cur_hyps]
        nbest_scores = [y[1].total_score() for y in cur_hyps]
        nbest_times = [y[1].times() for y in cur_hyps]
        results.append(
            DecodeResult(tokens=nbest[0], score=nbest_scores[0],
                         times=nbest_times[0], nbest=nbest,
                         nbest_scores=nbest_scores,
                         nbest_times=nbest_times))
    return results
