#!/usr/bin/env bash
# Build HLG.txt for K2Model hlg_onebest/hlg_rescore
# (wenet_tpu/models/k2/model.py).
#
# Analog of the reference tools/k2/make_hlg.sh (icefall compile_hlg.py
# over k2 graphs); here HLG = ctc_topo o L o G built pure python —
# structurally the same composition wenet_tpu's TLG builder performs,
# so this delegates to it (wenet_tpu/lm/build_graph.py build_hlg).
#
# usage: make_hlg.sh <lang-dir with units.txt lexicon.txt> <lm.arpa> <out>
set -e
if [ $# -ne 3 ]; then
  echo "usage: $0 <lang-dir with units.txt lexicon.txt> <lm.arpa> <out>" >&2
  exit 1
fi
lang=$1
arpa=$2
out=$3
python3 - "$lang/units.txt" "$lang/lexicon.txt" "$arpa" "$out" <<'EOF'
import os, sys
from wenet_tpu.lm.build_graph import build_hlg
hlg = build_hlg(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
os.rename(os.path.join(sys.argv[4], 'TLG.txt'),
          os.path.join(sys.argv[4], 'HLG.txt'))
n_arcs = sum(len(a) for a in hlg.arcs.values())
print(f"wrote {sys.argv[4]}/HLG.txt ({len(hlg.arcs)} states, "
      f"{n_arcs} arcs)")
EOF
