#!/usr/bin/env python3
"""Websocket server load/latency benchmark.

Analog of ref tools/websocket/performance-ws.py: spawns N concurrent
websocket clients streaming a wav in real-time-paced chunks against a
running `wenet_tpu.bin.websocket_server_main` and reports
PARTIAL-RESULT latency percentiles (p50/p90/p99), final-result latency
and aggregate RTF, one JSON line per run.

Partial-result latency = wall time from the moment chunk k's pcm frame
is written to the socket until a partial/final result referencing it
comes back.  Pairing is EXACT against wenet_tpu's server: every
partial/final message echoes the 0-based `chunk_idx` of the data chunk
whose decode produced it (websocket/server.py on_speech_data), so
latency = now - send_time[chunk_idx] even when silent chunks emit no
message or results lag many sends in the saturated regime.  Against
servers without the echo (e.g. the reference C++ runtime) the harness
falls back to in-order pairing advanced ONE send per result — a lower
bound in overload (a result may answer a later chunk than the one it
is paired with), so saturated-step fallback percentiles must not be
quoted as upper bounds.

Usage:
    python tools/websocket/performance-ws.py --url ws://host:port \
        --wav_path x.wav --concurrency 32 --chunk_ms 640 --real_time
    # no wav on disk:
    python tools/websocket/performance-ws.py --synthetic_sec 10 ...
"""

import argparse
import asyncio
import json
import statistics
import time

import numpy as np


class ClientStats:

    def __init__(self):
        self.partial_lat = []
        self.final_lat = None
        self.wall = None
        self.errors = 0


async def one_client(url, wav, chunk_ms, real_time, stats, nbest=1):
    from wenet_tpu.runtime.websocket.client import transcribe_streaming
    st = ClientStats()
    send_times = []
    answered = 0

    def on_send(_n):
        send_times.append(time.perf_counter())

    def on_message(msg):
        nonlocal answered
        t = msg.get('type')
        if t not in ('partial_result', 'final_result'):
            return
        now = time.perf_counter()
        idx = msg.get('chunk_idx')
        if idx is not None:
            # exact pairing: the server names the chunk it answered
            if 0 <= idx < len(send_times):
                lat = now - send_times[idx]
                if t == 'partial_result':
                    st.partial_lat.append(lat)
                else:
                    st.final_lat = lat
            elif t == 'final_result':
                st.final_lat = now - (send_times[-1] if send_times
                                      else now)
            return
        # fallback (no echo): in-order pairing, ONE send per result —
        # never jump answered to len(send_times): when results lag
        # several sends that drain pairs a LATE result with a much
        # NEWER send and under-reports overload latency
        if answered < len(send_times):
            lat = now - send_times[answered]
            answered += 1
            if t == 'partial_result':
                st.partial_lat.append(lat)
            else:
                st.final_lat = lat
        elif t == 'final_result':
            # end-signal final: measured from the last chunk send
            st.final_lat = now - (send_times[-1] if send_times else now)

    t0 = time.perf_counter()
    try:
        await transcribe_streaming(url, wav, chunk_ms=chunk_ms,
                                   nbest=nbest, real_time=real_time,
                                   on_message=on_message,
                                   on_send=on_send)
    except Exception:  # noqa: BLE001 - count, keep the fleet running
        st.errors = 1
    st.wall = time.perf_counter() - t0
    stats.append(st)


def percentile(sorted_vals, q):
    if not sorted_vals:
        return None
    return sorted_vals[min(int(q * len(sorted_vals)),
                           len(sorted_vals) - 1)]


async def run(args):
    if args.synthetic_sec:
        rng = np.random.RandomState(0)
        wav = (0.2 * rng.randn(int(16000 * args.synthetic_sec))
               ).astype(np.float32)
        rate = 16000
    else:
        from wenet_tpu.dataset.audio import read_wav
        wav, rate = read_wav(args.wav_path)
        wav = wav[0]
    stats = []
    tasks = [one_client(args.url, wav, args.chunk_ms, args.real_time,
                        stats) for _ in range(args.concurrency)]
    t0 = time.perf_counter()
    await asyncio.gather(*tasks)
    wall = time.perf_counter() - t0
    dur = len(wav) / rate

    partials = sorted(x for s in stats for x in s.partial_lat)
    finals = sorted(s.final_lat for s in stats
                    if s.final_lat is not None)
    walls = [s.wall for s in stats]
    errors = sum(s.errors for s in stats)
    out = {
        'clients': args.concurrency,
        'chunk_ms': args.chunk_ms,
        'real_time': bool(args.real_time),
        'audio_sec_each': round(dur, 2),
        'wall_sec': round(wall, 3),
        'errors': errors,
        'n_partials': len(partials),
        'partial_p50': (round(percentile(partials, 0.5), 3)
                        if partials else None),
        'partial_p90': (round(percentile(partials, 0.9), 3)
                        if partials else None),
        'partial_p99': (round(percentile(partials, 0.99), 3)
                        if partials else None),
        'final_p50': (round(percentile(finals, 0.5), 3)
                      if finals else None),
        'final_p99': (round(percentile(finals, 0.99), 3)
                      if finals else None),
        'client_wall_mean': round(statistics.mean(walls), 3),
        # real_time: a client is keeping pace if its wall stays within
        # audio duration + a final-decode tail; report the worst
        'client_wall_max': round(max(walls), 3),
        'aggregate_rtf': round(wall / (dur * args.concurrency), 4),
    }
    print(json.dumps(out))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--url', default='ws://127.0.0.1:10086')
    p.add_argument('--wav_path', default=None)
    p.add_argument('--synthetic_sec', type=float, default=None,
                   help='generate a synthetic wav of this many seconds '
                        'instead of reading --wav_path')
    p.add_argument('--concurrency', type=int, default=8)
    p.add_argument('--chunk_ms', type=int, default=640)
    p.add_argument('--real_time', action='store_true',
                   help='pace sends at audio rate (1 chunk per '
                        'chunk_ms) instead of as fast as possible')
    args = p.parse_args()
    if not args.synthetic_sec and not args.wav_path:
        p.error('one of --wav_path / --synthetic_sec is required')
    asyncio.run(run(args))


if __name__ == '__main__':
    main()
