"""Websocket server entry. ref: runtime/core/bin/websocket_server_main.cc +
decoder/params.h (flag surface)."""

import argparse
import logging


def get_args():
    parser = argparse.ArgumentParser(description='websocket asr server')
    parser.add_argument('--port', type=int, default=10086)
    parser.add_argument('--host', default='0.0.0.0')
    parser.add_argument('--model_dir', required=True,
                        help='dir with train.yaml + final checkpoint')
    parser.add_argument('--chunk_size', type=int, default=16)
    parser.add_argument('--num_left_chunks', type=int, default=-1)
    parser.add_argument('--beam_size', type=int, default=10)
    parser.add_argument('--ctc_weight', type=float, default=0.5)
    parser.add_argument('--rescoring_weight', type=float, default=1.0)
    parser.add_argument('--reverse_weight', type=float, default=0.0)
    parser.add_argument('--blank_scale', type=float, default=1.0)
    parser.add_argument('--blank_threshold', type=float, default=0.8)
    parser.add_argument('--context_path', default=None)
    parser.add_argument('--context_score', type=float, default=6.0)
    parser.add_argument('--batch_serving', action='store_true',
                        help='coalesce concurrent sessions into one '
                             'batched chunk step (TPU MXU utilization)')
    parser.add_argument('--max_batch', type=int, default=8)
    parser.add_argument('--no_precompile', action='store_true',
                        help='skip compiling every batch bucket at '
                             'startup (batch serving only); live '
                             'sessions then pay first-arrival compiles')
    return parser.parse_args()


def main():
    logging.basicConfig(level=logging.INFO)
    args = get_args()
    import os
    from wenet_tpu.utils.common import enable_compile_cache
    enable_compile_cache()
    from wenet_tpu.cli.model import _find_checkpoint
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.runtime.endpoint import CtcEndpointConfig
    from wenet_tpu.runtime.feature_pipeline import FeaturePipelineConfig
    from wenet_tpu.runtime.websocket.server import WebSocketServer
    from wenet_tpu.utils.config import load_config
    from wenet_tpu.utils.init_model import init_model, init_variables
    from wenet_tpu.utils.init_tokenizer import init_tokenizer

    import time
    t0 = time.monotonic()
    configs = load_config(os.path.join(args.model_dir, 'train.yaml'))
    tokenizer = init_tokenizer(configs)
    dataset_conf = configs.get('dataset_conf', {})
    num_mel = dataset_conf.get('fbank_conf', {}).get('num_mel_bins', 80)
    configs.setdefault('input_dim', num_mel)
    configs.setdefault('output_dim', tokenizer.vocab_size())
    model, configs = init_model(None, configs)
    logging.info('server: model built (%.1fs)', time.monotonic() - t0)
    variables, _ = init_variables(
        model, configs, checkpoint=_find_checkpoint(args.model_dir))
    # upload ONCE: checkpoint restore hands back host arrays, and
    # every per-connection AsrDecoder does jax.device_put(variables) —
    # a no-op on device arrays, but a full ~185 MB re-upload per
    # CLIENT on host arrays (~5 s each through a remote-TPU link)
    import jax
    variables = jax.block_until_ready(jax.device_put(variables))
    logging.info('server: variables ready on device (%.1fs)',
                 time.monotonic() - t0)

    context_graph = None
    if args.context_path:
        from wenet_tpu.utils.context_graph import ContextGraph
        context_graph = ContextGraph(args.context_path,
                                     tokenizer.symbol_table,
                                     context_score=args.context_score)

    opts = DecodeOptions(chunk_size=args.chunk_size,
                         num_left_chunks=args.num_left_chunks,
                         ctc_weight=args.ctc_weight,
                         rescoring_weight=args.rescoring_weight,
                         reverse_weight=args.reverse_weight,
                         beam_size=args.beam_size)
    ep = CtcEndpointConfig(blank_scale=args.blank_scale,
                           blank_threshold=args.blank_threshold)
    # full feature geometry from train.yaml (frame length/shift,
    # resample rate) — hand-building from num_mel_bins alone silently
    # drops non-default settings
    feat_cfg = FeaturePipelineConfig.from_configs(configs)

    batch_runner = None
    if args.batch_serving:
        from wenet_tpu.models.transformer.streaming import (
            StreamingConfig)
        from wenet_tpu.runtime.batch_runner import BatchedChunkRunner
        cfg = StreamingConfig(
            decoding_chunk_size=args.chunk_size,
            num_decoding_left_chunks=args.num_left_chunks,
            subsampling_rate=model.encoder.subsampling_rate,
            right_context=model.encoder.right_context)
        batch_runner = BatchedChunkRunner(model, variables, cfg,
                                          max_batch=args.max_batch)
        logging.info('server: batch runner up (%.1fs)',
                     time.monotonic() - t0)
        if not args.no_precompile:
            buckets = batch_runner.precompile(idim=num_mel)
            logging.info(
                'server: chunk-step programs compiled for batch '
                'buckets %s (%.1fs)', buckets, time.monotonic() - t0)

    def decoder_factory():
        return AsrDecoder(model, variables, tokenizer, opts, feat_cfg,
                          ep, context_graph,
                          batch_runner=batch_runner)

    WebSocketServer(args.host, args.port, decoder_factory).start()


if __name__ == '__main__':
    main()
