"""Text-format WFST (AT&T/OpenFst text) reader + epsilon-aware
token-passing structures for TLG decoding.

The reference builds TLG.fst with openfst binaries and decodes with the
vendored Kaldi LatticeFasterOnlineDecoder (ref: docs/lm.md,
runtime/core/decoder/ctc_wfst_beam_search.{h,cc},
tools/fst/make_tlg.sh).  Here the graph is loaded from its *text*
serialization (`fstprint TLG.fst`), so no openfst runtime is needed on
the serving host; the decoder is `wenet_tpu/runtime/wfst_beam_search.py`.

Arc convention (tropical semiring): ilabel = T-level token id + 1 with
0 = <eps>/<blank> (ref tools/fst/ctc_token_fst.py), olabel = word id,
weight = -log prob (costs add).
"""

from dataclasses import dataclass
from typing import Dict, List, Tuple


@dataclass
class Arc:
    ilabel: int
    olabel: int
    weight: float
    nextstate: int


class TextFst:

    def __init__(self):
        self.start = 0
        self.arcs: Dict[int, List[Arc]] = {}
        self.finals: Dict[int, float] = {}

    @classmethod
    def read(cls, path: str) -> 'TextFst':
        """Parse `fstprint` output: lines of
        `src dst ilabel olabel [weight]` or `state [weight]` (final)."""
        fst = cls()
        first = True
        with open(path, encoding='utf-8') as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if len(parts) >= 4:
                    src, dst = int(parts[0]), int(parts[1])
                    il, ol = int(parts[2]), int(parts[3])
                    w = float(parts[4]) if len(parts) > 4 else 0.0
                    fst.arcs.setdefault(src, []).append(
                        Arc(il, ol, w, dst))
                    if first:
                        fst.start = src
                        first = False
                else:
                    state = int(parts[0])
                    w = float(parts[1]) if len(parts) > 1 else 0.0
                    fst.finals[state] = w
                    if first:
                        fst.start = state
                        first = False
        return fst

    def state_arcs(self, s: int) -> List[Arc]:
        return self.arcs.get(s, [])

    def final_cost(self, s: int) -> float:
        return self.finals.get(s, float('inf'))


def read_symbol_table(path: str) -> Dict[int, str]:
    """words.txt / tokens.txt: `symbol id` per line."""
    table = {}
    with open(path, encoding='utf-8') as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                table[int(parts[1])] = parts[0]
    return table
