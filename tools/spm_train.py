#!/usr/bin/env python3
"""sentencepiece training wrapper (analog of ref tools/spm_train)."""
import sys

try:
    import sentencepiece as spm
except ImportError as e:
    raise SystemExit('sentencepiece is required for BPE training/'
                     'encoding (pip install sentencepiece); the BPE '
                     'tokenizer in wenet_tpu/text also accepts a '
                     'pre-built units file without it') from e

if __name__ == '__main__':
    spm.SentencePieceTrainer.Train(' '.join(sys.argv[1:]))
