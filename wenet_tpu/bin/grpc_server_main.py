"""gRPC server entry. ref: runtime/core/bin/grpc_server_main.cc."""

import argparse
import logging


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description='grpc asr server')
    parser.add_argument('--port', type=int, default=10087)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--model_dir', required=True)
    parser.add_argument('--chunk_size', type=int, default=16)
    parser.add_argument('--num_left_chunks', type=int, default=-1)
    parser.add_argument('--beam_size', type=int, default=10)
    parser.add_argument('--ctc_weight', type=float, default=0.5)
    parser.add_argument('--reverse_weight', type=float, default=0.0)
    args = parser.parse_args()

    import os
    from wenet_tpu.cli.model import _find_checkpoint
    from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeOptions
    from wenet_tpu.runtime.grpc.server import make_server
    from wenet_tpu.utils.common import enable_compile_cache
    enable_compile_cache()
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
    # one upload: per-connection AsrDecoder device_puts are then no-ops
    # (host-array variables would re-upload ~185 MB per client)
    import jax
    variables = jax.block_until_ready(jax.device_put(variables))
    opts = DecodeOptions(chunk_size=args.chunk_size,
                         num_left_chunks=args.num_left_chunks,
                         ctc_weight=args.ctc_weight,
                         reverse_weight=args.reverse_weight,
                         beam_size=args.beam_size)

    from wenet_tpu.runtime.feature_pipeline import FeaturePipelineConfig
    feat_cfg = FeaturePipelineConfig.from_configs(configs)

    def factory():
        return AsrDecoder(model, variables, tokenizer, opts, feat_cfg)

    server = make_server(factory, args.port, args.workers)
    server.start()
    logging.info('grpc server listening on %d', args.port)
    server.wait_for_termination()


if __name__ == '__main__':
    main()
