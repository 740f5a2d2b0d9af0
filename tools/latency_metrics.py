#!/usr/bin/env python3
"""Streaming latency metrics. ref: tools/latency_metrics.py.

Feeds a wav through the streaming AsrDecoder in simulated real time and
reports first-partial / final-result latency percentiles.
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model_dir', required=True)
    parser.add_argument('--wav_scp', required=True)
    parser.add_argument('--chunk_size', type=int, default=16)
    parser.add_argument('--num_left_chunks', type=int, default=-1)
    args = parser.parse_args()

    import os
    from wenet_tpu.cli.model import _find_checkpoint
    from wenet_tpu.dataset.audio import read_wav, resample
    from wenet_tpu.runtime.asr_decoder import (AsrDecoder, DecodeOptions)
    from wenet_tpu.utils.config import load_config
    from wenet_tpu.utils.init_model import init_model, init_variables
    from wenet_tpu.utils.init_tokenizer import init_tokenizer

    configs = load_config(os.path.join(args.model_dir, 'train.yaml'))
    tokenizer = init_tokenizer(configs)
    configs.setdefault('input_dim', configs['dataset_conf'].get(
        'fbank_conf', {}).get('num_mel_bins', 80))
    configs.setdefault('output_dim', tokenizer.vocab_size())
    model, configs = init_model(None, configs)
    variables, _ = init_variables(
        model, configs, checkpoint=_find_checkpoint(args.model_dir))

    chunk_lat, final_lat = [], []
    with open(args.wav_scp, encoding='utf8') as f:
        for line in f:
            arr = line.strip().split()
            if len(arr) != 2:
                continue
            wav, sr = read_wav(arr[1])
            if sr != 16000:
                wav = resample(wav, sr, 16000)
            dec = AsrDecoder(model, variables, tokenizer,
                             DecodeOptions(
                                 chunk_size=args.chunk_size,
                                 num_left_chunks=args.num_left_chunks))
            step = 16000 // 10  # 100ms audio packets
            pcm = wav[0]
            for i in range(0, len(pcm), step):
                dec.accept_waveform(pcm[i:i + step])
                t0 = time.perf_counter()
                dec.decode()
                chunk_lat.append((time.perf_counter() - t0) * 1000)
            dec.set_input_finished()
            dec.decode()
            t0 = time.perf_counter()
            dec.rescoring()
            final_lat.append((time.perf_counter() - t0) * 1000)
            print(arr[0], dec.result[0].sentence)
    chunk_lat = np.asarray(chunk_lat)
    final_lat = np.asarray(final_lat)
    for name, x in (('chunk', chunk_lat), ('final', final_lat)):
        if len(x):
            print(f'{name} latency ms: p50={np.percentile(x, 50):.1f} '
                  f'p90={np.percentile(x, 90):.1f} '
                  f'p99={np.percentile(x, 99):.1f}')


if __name__ == '__main__':
    main()
