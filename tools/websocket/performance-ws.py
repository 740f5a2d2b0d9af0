#!/usr/bin/env python3
"""Websocket server load/latency benchmark.

Analog of ref tools/websocket/performance-ws.py: spawns N concurrent
websocket clients streaming the same wav in real-time-sized chunks and
reports per-result latency percentiles + final-result RTF.
"""

import argparse
import asyncio
import json
import statistics
import time

import numpy as np


async def one_client(url, wav, chunk_ms, latencies):
    from wenet_tpu.runtime.websocket.client import transcribe_streaming
    t0 = time.perf_counter()
    msgs = await transcribe_streaming(url, wav, chunk_ms=chunk_ms)
    latencies.append(time.perf_counter() - t0)
    return msgs


async def run(args):
    from wenet_tpu.dataset.audio import read_wav
    wav, rate = read_wav(args.wav_path)
    wav = wav[0]
    latencies = []
    tasks = [one_client(args.url, wav, args.chunk_ms, latencies)
             for _ in range(args.concurrency)]
    t0 = time.perf_counter()
    await asyncio.gather(*tasks)
    wall = time.perf_counter() - t0
    dur = len(wav) / rate
    lat_sorted = sorted(latencies)
    p = lambda q: lat_sorted[min(int(q * len(lat_sorted)),
                                 len(lat_sorted) - 1)]
    print(json.dumps({
        'clients': args.concurrency,
        'audio_sec_each': round(dur, 2),
        'wall_sec': round(wall, 3),
        'latency_p50': round(p(0.5), 3),
        'latency_p90': round(p(0.9), 3),
        'latency_mean': round(statistics.mean(latencies), 3),
        'aggregate_rtf': round(wall / (dur * args.concurrency), 4),
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--url', default='ws://127.0.0.1:10086')
    p.add_argument('--wav_path', required=True)
    p.add_argument('--concurrency', type=int, default=8)
    p.add_argument('--chunk_ms', type=int, default=500)
    asyncio.run(run(p.parse_args()))


if __name__ == '__main__':
    main()
