"""FLAC decoder round-trip tests.

The decoder (runtime/cpp/flac_decoder.cc, from scratch) is verified
against a minimal test-only FLAC *encoder* built here from the public
format spec: since FLAC is lossless, encode(pcm) -> decode must
reproduce pcm exactly for every subframe type (constant, verbatim,
fixed 0-4, LPC), Rice residual coding (both methods + escape), and the
stereo decorrelation modes.  (Ref reads flac via torchaudio/sox —
wenet/dataset/processor.py:125-153; this image has neither.)
"""

import numpy as np
import pytest

from wenet_tpu.dataset.audio import _load_flac, read_audio, read_flac


class BitWriter:

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, value, n):
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def sbits(self, value, n):
        self.bits(value & ((1 << n) - 1), n)

    def align(self):
        if self.nbits:
            self.bits(0, 8 - self.nbits)

    def bytes(self):
        assert self.nbits == 0
        return bytes(self.buf)


def rice_encode(w, residuals, k, method=0):
    plen = 4 if method == 0 else 5
    w.bits(method, 2)     # residual coding method
    w.bits(0, 4)          # partition order 0
    w.bits(k, plen)       # rice parameter
    for e in residuals:
        u = 2 * e if e >= 0 else -2 * e - 1
        q = u >> k
        w.bits(0, q) if q else None
        w.bits(1, 1)
        if k:
            w.bits(u & ((1 << k) - 1), k)


def rice_escape_encode(w, residuals, raw_bits, method=0):
    plen = 4 if method == 0 else 5
    w.bits(method, 2)
    w.bits(0, 4)
    w.bits((1 << plen) - 1, plen)  # escape code
    w.bits(raw_bits, 5)
    for e in residuals:
        w.sbits(e, raw_bits)


FIXED_PRED = {
    0: lambda x, i: 0,
    1: lambda x, i: x[i - 1],
    2: lambda x, i: 2 * x[i - 1] - x[i - 2],
    3: lambda x, i: 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3],
    4: lambda x, i: 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3]
    - x[i - 4],
}


def write_subframe(w, samples, bps, kind, wasted=0, method=0,
                   escape=False):
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
        bps -= wasted
    w.bits(0, 1)  # pad
    if kind == 'constant':
        w.bits(0, 6)
    elif kind == 'verbatim':
        w.bits(1, 6)
    elif kind.startswith('fixed'):
        order = int(kind[-1])
        w.bits(0x08 | order, 6)
    elif kind == 'lpc2':
        w.bits(0x20 | 1, 6)  # order 2
    if wasted:
        w.bits(1, 1)
        w.bits(0, wasted - 1)  # unary count-1: (wasted-1) zeros
        w.bits(1, 1)
    else:
        w.bits(0, 1)
    if kind == 'constant':
        assert len(set(samples)) == 1
        w.sbits(samples[0], bps)
    elif kind == 'verbatim':
        for s in samples:
            w.sbits(s, bps)
    elif kind.startswith('fixed'):
        order = int(kind[-1])
        for s in samples[:order]:
            w.sbits(s, bps)
        res = [samples[i] - FIXED_PRED[order](samples, i)
               for i in range(order, len(samples))]
        if escape:
            rice_escape_encode(w, res, 17, method)
        else:
            k = max(0, int(np.log2(max(
                1, 2 * (np.mean(np.abs(res)) + 1)))))
            rice_encode(w, res, min(k, 14), method)
    elif kind == 'lpc2':
        # x[i] ~ (2*x[i-1] - 1*x[i-2] ... with coef scaling) >> shift
        order, precision, shift = 2, 5, 1
        coefs = [3, -1]  # p = (3*x[i-1] - x[i-2]) >> 1
        for s in samples[:order]:
            w.sbits(s, bps)
        w.bits(precision - 1, 4)
        w.sbits(shift, 5)
        for c in coefs:
            w.sbits(c, precision)
        res = [samples[i]
               - ((coefs[0] * samples[i - 1]
                   + coefs[1] * samples[i - 2]) >> shift)
               for i in range(order, len(samples))]
        rice_encode(w, res, 6, method)


def utf8_number(w, v):
    assert v < 128
    w.bits(v, 8)


def encode_flac(channels, rate=16000, bps=16, frame_plan=None,
                ch_mode='independent'):
    """channels: list of 1-2 int lists (same length).  frame_plan:
    list of (blocksize, subframe kind[, opts]) consuming the signal."""
    n = len(channels[0])
    nch = len(channels)
    w = BitWriter()
    w.buf += b'fLaC'
    # STREAMINFO: last-metadata, type 0, length 34
    w.bits(1, 1)
    w.bits(0, 7)
    w.bits(34, 24)
    w.bits(16, 16)        # min blocksize
    w.bits(65535, 16)     # max blocksize
    w.bits(0, 24)         # min framesize
    w.bits(0, 24)         # max framesize
    w.bits(rate, 20)
    w.bits(nch - 1, 3)
    w.bits(bps - 1, 5)
    w.bits(n, 36)
    for _ in range(16):
        w.bits(0, 8)      # md5
    pos = 0
    for fi, plan in enumerate(frame_plan):
        bs, kind = plan[0], plan[1]
        opts = plan[2] if len(plan) > 2 else {}
        w.bits(0x3FFE, 14)
        w.bits(0, 1)      # reserved
        w.bits(0, 1)      # fixed blocking
        w.bits(7, 4)      # blocksize: 16-bit at end of header
        w.bits(0, 4)      # rate: from streaminfo
        if ch_mode == 'independent':
            w.bits(nch - 1, 4)
        elif ch_mode == 'left_side':
            w.bits(8, 4)
        elif ch_mode == 'right_side':
            w.bits(9, 4)
        elif ch_mode == 'mid_side':
            w.bits(10, 4)
        w.bits(0, 3)      # sample size: from streaminfo
        w.bits(0, 1)      # reserved
        utf8_number(w, fi)
        w.bits(bs - 1, 16)
        w.bits(0, 8)      # crc8 (decoder skips)
        segs = [list(c[pos:pos + bs]) for c in channels]
        if ch_mode == 'independent':
            for seg in segs:
                write_subframe(w, seg, bps, kind, **opts)
        elif ch_mode == 'left_side':
            side = [a - b for a, b in zip(segs[0], segs[1])]
            write_subframe(w, segs[0], bps, kind, **opts)
            write_subframe(w, side, bps + 1, kind, **opts)
        elif ch_mode == 'right_side':
            side = [a - b for a, b in zip(segs[0], segs[1])]
            write_subframe(w, side, bps + 1, kind, **opts)
            write_subframe(w, segs[1], bps, kind, **opts)
        elif ch_mode == 'mid_side':
            side = [a - b for a, b in zip(segs[0], segs[1])]
            mid = [(a + b) >> 1 for a, b in zip(segs[0], segs[1])]
            write_subframe(w, mid, bps, kind, **opts)
            write_subframe(w, side, bps + 1, kind, **opts)
        w.align()
        w.bits(0, 16)     # crc16 (decoder skips)
        pos += bs
    assert pos == n, f'frame plan covers {pos} of {n}'
    return w.bytes()


needs_lib = pytest.mark.skipif(_load_flac() is None,
                               reason='libflac_dec.so not built')


def ref_int16(n, seed, smooth=False):
    rng = np.random.RandomState(seed)
    if smooth:  # random walk, stays well within int16
        x = np.cumsum(rng.randint(-50, 51, n))
        return [int(v) for v in np.clip(x, -30000, 30000)]
    return [int(v) for v in rng.randint(-32768, 32768, n)]


@needs_lib
@pytest.mark.parametrize('kind,smooth', [
    ('verbatim', False), ('fixed0', False), ('fixed1', True),
    ('fixed2', True), ('fixed3', True), ('fixed4', True),
    ('lpc2', True)])
def test_mono_roundtrip(kind, smooth):
    pcm = ref_int16(96 + 32, seed=3, smooth=smooth)
    raw = encode_flac([pcm], frame_plan=[(96, kind), (32, kind)])
    wav, rate = read_flac(raw)
    assert rate == 16000 and wav.shape == (1, 128)
    np.testing.assert_array_equal(
        np.round(wav[0] * 32768.0).astype(np.int64), pcm)


@needs_lib
def test_constant_and_escape_and_method1():
    pcm = [1234] * 64 + ref_int16(64, seed=5, smooth=True)
    raw = encode_flac([pcm], frame_plan=[
        (64, 'constant'), (64, 'fixed1', {'escape': True}),
    ])
    wav, _ = read_flac(raw)
    np.testing.assert_array_equal(
        np.round(wav[0] * 32768.0).astype(np.int64), pcm)
    raw = encode_flac([pcm[64:]],
                      frame_plan=[(64, 'fixed2', {'method': 1})])
    wav, _ = read_flac(raw)
    np.testing.assert_array_equal(
        np.round(wav[0] * 32768.0).astype(np.int64), pcm[64:])


@needs_lib
def test_wasted_bits():
    pcm = [v & ~3 for v in ref_int16(64, seed=11, smooth=True)]
    raw = encode_flac([pcm], frame_plan=[(64, 'verbatim',
                                          {'wasted': 2})])
    wav, _ = read_flac(raw)
    np.testing.assert_array_equal(
        np.round(wav[0] * 32768.0).astype(np.int64), pcm)


@needs_lib
@pytest.mark.parametrize('mode', ['independent', 'left_side',
                                  'right_side', 'mid_side'])
def test_stereo_modes(mode):
    left = ref_int16(96, seed=7, smooth=True)
    right = ref_int16(96, seed=8, smooth=True)
    raw = encode_flac([left, right], frame_plan=[(96, 'fixed2')],
                      ch_mode=mode)
    wav, rate = read_flac(raw)
    assert wav.shape == (2, 96)
    np.testing.assert_array_equal(
        np.round(wav[0] * 32768.0).astype(np.int64), left)
    np.testing.assert_array_equal(
        np.round(wav[1] * 32768.0).astype(np.int64), right)


@needs_lib
def test_processor_and_sniffing(tmp_path):
    from wenet_tpu.dataset.audio import flac_info
    from wenet_tpu.dataset.processor import decode_wav
    pcm = ref_int16(200, seed=9, smooth=True)
    raw = encode_flac([pcm], frame_plan=[(200, 'fixed1')])
    p = tmp_path / 'x.flac'
    p.write_bytes(raw)
    # path read through the UIO processor
    s = decode_wav({'wav': str(p)})
    assert s['sample_rate'] == 16000 and s['wav'].shape == (1, 200)
    # tar-shard bytes path with flac format tag
    s = decode_wav({'wav_bytes': raw, 'wav_format': 'flac'})
    assert s['wav'].shape == (1, 200)
    # magic sniffing
    wav, rate = read_audio(raw)
    assert rate == 16000
    # STREAMINFO probe
    rate, frames, ch = flac_info(str(p))
    assert (rate, frames, ch) == (16000, 200, 1)
