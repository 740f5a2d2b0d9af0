"""Offline/streaming-simulation decode binary with RTF report.

Analog of ref runtime/core/bin/decoder_main.cc:45-185: reads a single
wav or a kaldi-style wav.scp, decodes through the serving AsrDecoder
(same code path as the websocket/gRPC servers), optionally sleeps
real-time between chunks (--simulate_streaming), and reports per-utt
latency plus the aggregate RTF.
"""

import argparse
import logging
import time

import numpy as np

logger = logging.getLogger(__name__)


def build_decoder(args):
    from wenet_tpu.cli.model import _find_checkpoint
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.runtime.post_processor import (PostProcessOptions,
                                                  PostProcessor)
    from wenet_tpu.utils.config import load_config
    from wenet_tpu.utils.init_model import init_model, init_variables
    from wenet_tpu.utils.init_tokenizer import init_tokenizer
    import os
    configs = load_config(os.path.join(args.model_dir, 'train.yaml'))
    tokenizer = init_tokenizer(configs)
    configs.setdefault('input_dim', configs['dataset_conf'].get(
        'fbank_conf', {}).get('num_mel_bins', 80))
    configs.setdefault('output_dim', tokenizer.vocab_size())
    model, configs = init_model(None, configs)
    variables, _ = init_variables(
        model, configs, checkpoint=_find_checkpoint(args.model_dir))
    opts = DecodeOptions(chunk_size=args.chunk_size,
                         num_left_chunks=args.num_left_chunks,
                         beam_size=args.beam_size,
                         reverse_weight=args.reverse_weight)
    lm = tlg = words = None
    if args.lm_path:
        from wenet_tpu.lm.arpa import read_arpa
        lm = read_arpa(args.lm_path)
    if args.fst_path:
        from wenet_tpu.lm.fst import read_symbol_table
        # pass the path: the native lattice decoder (runtime/
        # native_wfst.py) parses TLG.txt itself; the python fallback
        # reads it into a TextFst
        tlg = args.fst_path
        if args.dict_path:
            words = read_symbol_table(args.dict_path)
    pp = PostProcessor(PostProcessOptions(lowercase=not args.no_lowercase))
    from wenet_tpu.runtime.feature_pipeline import FeaturePipelineConfig
    feat_cfg = FeaturePipelineConfig.from_configs(configs)
    return AsrDecoder(model, variables, tokenizer, opts, feat_cfg,
                      lm=lm, lm_weight=args.lm_weight, tlg_fst=tlg,
                      word_table=words, post_processor=pp)


def decode_utt(decoder, wav_path, simulate_streaming, interval_ms):
    from wenet_tpu.dataset.audio import read_audio
    pcm, rate = read_audio(wav_path)
    pcm = pcm[0]  # (C, S) -> first channel
    wave_dur = len(pcm) / rate
    samples_per_chunk = int(rate * interval_ms / 1000)
    decoder.reset()
    # time only the decode work, excluding the simulated real-time
    # sleeps (ref decoder_main.cc times Decode() calls only)
    dt = 0.0
    for i in range(0, len(pcm), samples_per_chunk):
        chunk = pcm[i:i + samples_per_chunk]
        if simulate_streaming:
            time.sleep(interval_ms / 1000.0)
        t0 = time.perf_counter()
        decoder.accept_waveform(chunk)
        decoder.decode()
        dt += time.perf_counter() - t0
    t0 = time.perf_counter()
    decoder.set_input_finished()
    decoder.decode()
    decoder.rescoring()
    dt += time.perf_counter() - t0
    text = decoder.result[0].sentence if decoder.result else ''
    return text, wave_dur, dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--model_dir', required=True)
    p.add_argument('--wav_path')
    p.add_argument('--wav_scp')
    p.add_argument('--result_file')
    p.add_argument('--chunk_size', type=int, default=16)
    p.add_argument('--num_left_chunks', type=int, default=-1)
    p.add_argument('--beam_size', type=int, default=10)
    p.add_argument('--reverse_weight', type=float, default=0.0)
    p.add_argument('--simulate_streaming', action='store_true')
    p.add_argument('--streaming_interval_ms', type=int, default=500)
    p.add_argument('--lm_path', default='')
    p.add_argument('--lm_weight', type=float, default=0.5)
    p.add_argument('--fst_path', default='')
    p.add_argument('--dict_path', default='')
    p.add_argument('--no_lowercase', action='store_true')
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    utts = []
    if args.wav_path:
        utts.append(('utt', args.wav_path))
    if args.wav_scp:
        with open(args.wav_scp, encoding='utf-8') as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    utts.append((parts[0], parts[1]))
    assert utts, 'need --wav_path or --wav_scp'

    decoder = build_decoder(args)
    out = open(args.result_file, 'w', encoding='utf-8') \
        if args.result_file else None
    total_audio = total_time = 0.0
    for key, path in utts:
        text, dur, dt = decode_utt(decoder, path,
                                   args.simulate_streaming,
                                   args.streaming_interval_ms)
        total_audio += dur
        total_time += dt
        logger.info('%s %s (dur %.2fs decode %.3fs)', key, text, dur, dt)
        if out:
            out.write(f'{key} {text}\n')
    if out:
        out.close()
    rtf = total_time / max(total_audio, 1e-9)
    logger.info('decoded %.2fs audio in %.3fs, RTF %.4f',
                total_audio, total_time, rtf)


if __name__ == '__main__':
    main()
