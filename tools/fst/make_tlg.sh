#!/usr/bin/env bash
# Build TLG.txt for wenet_tpu's WFST decoder
# (wenet_tpu/runtime/wfst_beam_search.py).
#
# Analog of the reference tools/fst/compile_lexicon_token_fst.sh +
# tools/fst/make_tlg.sh, but pure python (wenet_tpu/lm/build_graph.py):
# no openfst/kaldi binaries and no #N disambiguation symbols are needed
# because the python pipeline never determinizes LG.
#
# usage: make_tlg.sh <lang-dir> <arpa> <out-dir>
#   <lang-dir> must contain units.txt (model units, ctc ids) and
#   lexicon.txt (`word unit1 unit2 ...`).
set -e
if [ $# -ne 3 ]; then
  echo "usage: $0 <lang-dir with units.txt lexicon.txt> <lm.arpa> <out>" >&2
  exit 1
fi
lang=$1
arpa=$2
out=$3
python3 - "$lang/units.txt" "$lang/lexicon.txt" "$arpa" "$out" <<'EOF'
import sys
from wenet_tpu.lm.build_graph import build_tlg
tlg = build_tlg(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
n_arcs = sum(len(a) for a in tlg.arcs.values())
print(f"wrote {sys.argv[4]}/TLG.txt "
      f"({len(tlg.arcs)} states, {n_arcs} arcs) — load with "
      f"wenet_tpu.lm.fst.TextFst.read")
EOF
