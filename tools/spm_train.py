#!/usr/bin/env python3
"""sentencepiece training wrapper (analog of ref tools/spm_train)."""
import sys

import sentencepiece as spm

if __name__ == '__main__':
    spm.SentencePieceTrainer.Train(' '.join(sys.argv[1:]))
