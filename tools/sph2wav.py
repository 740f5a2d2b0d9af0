#!/usr/bin/env python3
"""NIST SPHERE → wav conversion, natively (no sph2pipe for PCM/ulaw).

ref: tools/sph2wav.sh — which downloads+builds sph2pipe and pipes
through sox to produce per-channel, per-segment wavs. Here the SPHERE
header/PCM/ulaw decode is ~60 lines of python (swbd/hkust-style
"embedded-shorten" compressed files still need sph2pipe; we fall back
to it when found on PATH).

Single file:   sph2wav.py in.sph out.wav [--channel 1]
Data-dir mode: sph2wav.py --scp sph.scp --segments segments \
                   --wav_dir out/wavs --outscp out/wav.scp
   Produces `<utt>-A`/`<utt>-B` channel entries like the reference,
   trimmed to segment [start, end) when --segments is given.
"""

import argparse
import os
import shutil
import struct
import subprocess
import sys

import numpy as np

# mu-law expansion table (G.711), computed once.
_ULAW = None


def _ulaw_table():
    global _ULAW
    if _ULAW is None:
        u = np.arange(256, dtype=np.uint8) ^ 0xFF
        sign = np.where(u & 0x80, -1, 1)
        exponent = (u >> 4) & 0x07
        mantissa = u & 0x0F
        mag = ((mantissa.astype(np.int32) << 3) + 0x84) << exponent
        _ULAW = (sign * (mag - 0x84)).astype(np.int16)
    return _ULAW


def read_sph(path):
    """Returns (samples int16 (channels, n), sample_rate)."""
    with open(path, 'rb') as f:
        magic = f.readline()
        if not magic.startswith(b'NIST_1A'):
            raise ValueError(f'{path}: not a NIST SPHERE file')
        header_size = int(f.readline().strip())
        fields = {}
        while True:
            line = f.readline().decode('ascii', 'replace').strip()
            if line == 'end_head':
                break
            parts = line.split(None, 2)
            if len(parts) == 3:
                name, typ, value = parts
                fields[name] = int(value) if typ.startswith('-i') else value
        f.seek(header_size)
        data = f.read()

    coding = fields.get('sample_coding', 'pcm')
    channels = int(fields.get('channel_count', 1))
    rate = int(fields.get('sample_rate', 8000))
    nbytes = int(fields.get('sample_n_bytes', 2))
    if 'shorten' in str(coding):
        sph2pipe = shutil.which('sph2pipe')
        if not sph2pipe:
            raise RuntimeError(
                f'{path}: shorten-compressed SPHERE needs sph2pipe on PATH')
        out = subprocess.run([sph2pipe, '-f', 'wav', path],
                             capture_output=True, check=True).stdout
        from wenet_tpu.dataset.audio import read_wav
        wav, rate = read_wav(out)
        return (wav * 32768.0).clip(-32768, 32767).astype(np.int16), rate
    if str(coding).startswith('ulaw') or nbytes == 1 and 'ulaw' in str(
            coding):
        samples = _ulaw_table()[np.frombuffer(data, np.uint8)]
    elif nbytes == 2:
        fmt = fields.get('sample_byte_format', '01')
        dt = '<i2' if str(fmt) == '01' else '>i2'
        samples = np.frombuffer(data, dt).astype(np.int16)
    else:
        raise ValueError(f'{path}: unsupported sample_n_bytes={nbytes} '
                         f'coding={coding}')
    n = samples.size // channels * channels
    return samples[:n].reshape(-1, channels).T, rate


def write_wav_int16(path, samples, rate):
    from wenet_tpu.dataset.audio import write_wav
    write_wav(path, samples.astype(np.float32) / 32768.0, rate)


def _scp_mode(args):
    segs = []
    if args.segments:
        with open(args.segments, encoding='utf8') as f:
            for line in f:
                arr = line.split()
                if len(arr) >= 4:
                    segs.append((arr[0], arr[1], float(arr[2]),
                                 float(arr[3])))
    os.makedirs(args.wav_dir, exist_ok=True)
    scp = {}
    cache_key, cache = None, None
    with open(args.scp, encoding='utf8') as f:
        sph_paths = dict(line.split()[:2] for line in f if line.strip())
    if not segs:  # whole-file conversion, one wav per channel
        for key, path in sorted(sph_paths.items()):
            samples, rate = read_sph(path)
            for ch in range(samples.shape[0]):
                suffix = '-' + 'AB'[ch] if samples.shape[0] > 1 else ''
                out = os.path.join(args.wav_dir, f'{key}{suffix}.wav')
                write_wav_int16(out, samples[ch], rate)
                scp[f'{key}{suffix}'] = out
    else:
        for seg_id, utt, start, end in segs:
            # utt may carry a -A/-B channel suffix added upstream
            base, ch = utt, 0
            if utt not in sph_paths and utt[-2:] in ('-A', '-B'):
                base, ch = utt[:-2], 'AB'.index(utt[-1])
            if base not in sph_paths:
                continue
            if cache_key != base:
                cache = read_sph(sph_paths[base])
                cache_key = base
            samples, rate = cache
            ch = min(ch, samples.shape[0] - 1)
            s, e = int(start * rate), int(end * rate)
            out = os.path.join(args.wav_dir, f'{seg_id}.wav')
            write_wav_int16(out, samples[ch, s:e], rate)
            scp[seg_id] = out
    with open(args.outscp, 'w', encoding='utf8') as f:
        for key in sorted(scp):
            f.write(f'{key} {scp[key]}\n')
    print(f'wrote {len(scp)} wavs -> {args.outscp}')


def main():
    parser = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    parser.add_argument('inp', nargs='?')
    parser.add_argument('out', nargs='?')
    parser.add_argument('--channel', type=int, default=1)
    parser.add_argument('--scp')
    parser.add_argument('--segments')
    parser.add_argument('--wav_dir')
    parser.add_argument('--outscp')
    args = parser.parse_args()
    if args.scp:
        if not (args.wav_dir and args.outscp):
            sys.exit('--scp mode needs --wav_dir and --outscp')
        _scp_mode(args)
    else:
        if not (args.inp and args.out):
            sys.exit('usage: sph2wav.py in.sph out.wav')
        samples, rate = read_sph(args.inp)
        write_wav_int16(args.out, samples[args.channel - 1], rate)


if __name__ == '__main__':
    main()
