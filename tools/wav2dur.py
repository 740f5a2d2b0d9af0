#!/usr/bin/env python3
"""Total duration of a wav.scp. ref: tools/wav2dur.py."""

import sys

from wenet_tpu.dataset.audio import wav_info

scp = sys.argv[1]
out = sys.argv[2] if len(sys.argv) > 2 else None
total = 0.0
lines = []
with open(scp, encoding='utf8') as f:
    for line in f:
        arr = line.strip().split()
        if len(arr) != 2:
            continue
        rate, frames, _ = wav_info(arr[1])
        dur = frames / rate
        total += dur
        lines.append(f'{arr[0]} {dur:.4f}')
if out:
    with open(out, 'w') as f:
        f.write('\n'.join(lines) + '\n')
print(f'total {len(lines)} utts, {total / 3600:.4f} hours')
