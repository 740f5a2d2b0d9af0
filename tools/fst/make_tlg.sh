#!/usr/bin/env bash
# Compose T (ctc topology), L (lexicon), G (arpa LM) into TLG.fst and
# print the text serialization consumed by wenet_tpu's python decoder
# (wenet_tpu/runtime/wfst_beam_search.py).  Analog of the reference
# tools/fst/make_tlg.sh; requires openfst binaries on PATH at *build*
# time only — the serving host needs just the text file.
set -e
for tool in fstcompile fstdeterminize fstminimize fstarcsort \
            fstcompose fstprint arpa2fst; do
  command -v $tool >/dev/null || {
    echo "ERROR: $tool not found. TLG graph *building* needs openfst" \
         "+ kaldi arpa2fst installed (decode-time does not: the python" \
         "decoder reads the text FST). Alternatively use ARPA shallow" \
         "fusion (docs/lm.md) which needs no graph at all." >&2
    exit 1
  }
done
lang=$1   # dir with tokens.txt lexicon.txt words.txt
arpa=$2
out=$3
mkdir -p $out
python3 $(dirname $0)/ctc_token_fst.py $lang/tokens.txt > $out/T.txt
fstcompile --isymbols=$lang/tokens.txt --osymbols=$lang/tokens.txt \
  $out/T.txt | fstarcsort --sort_type=olabel > $out/T.fst
arpa2fst --read-symbol-table=$lang/words.txt $arpa $out/G.fst
fstcompose $out/L.fst $out/G.fst | fstdeterminize | fstminimize | \
  fstarcsort --sort_type=ilabel > $out/LG.fst
fstcompose $out/T.fst $out/LG.fst > $out/TLG.fst
fstprint $out/TLG.fst > $out/TLG.txt
echo "wrote $out/TLG.txt (load with wenet_tpu.lm.fst.TextFst.read)"
