#!/usr/bin/env python3
"""CER scoring (char split forced). ref: tools/compute-cer.py."""

import sys

from compute_wer import main as wer_main  # noqa: F401

if __name__ == '__main__':
    sys.argv.insert(1, '--char=1')
    wer_main()
