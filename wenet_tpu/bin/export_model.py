"""Export the deployment surface to serialized StableHLO artifacts.

TPU-native analog of the reference export stack
(ref: wenet/bin/export_jit.py, wenet/bin/export_onnx_cpu.py:
encoder-chunk / ctc / decoder split for streaming runtimes).  Instead
of torchscript/onnx we use `jax.export`: each entry point is traced,
lowered to StableHLO, and serialized; any XLA runtime (or a later jax
process, via `jax.export.deserialize(...).call`) can run it without the
python model code.

Artifacts written to --output_dir:
  encoder_chunk.stablehlo   (xs, offset, att_cache, cnn_cache, att_mask)
                            -> (ys, logp, new_att, new_cnn)
  encoder_full.stablehlo    (speech, speech_lengths) -> (out, mask, logp)
                            with symbolic batch/time dims
  decoder_rescore.stablehlo (hyps, hyps_lens, encoder_out)
                            -> (score, r_score) log-probs
  export_meta.json          shapes + streaming config for the loader
"""

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

from wenet_tpu.models.transformer.streaming import StreamingConfig
from wenet_tpu.utils.config import load_config
from wenet_tpu.utils.init_model import init_model, init_variables


def export_encoder_chunk(model, variables, cfg: StreamingConfig,
                         input_dim: int):
    """Streaming chunk step, fixed shapes (ref export_onnx_cpu.py
    encoder export with decoding_window/required_cache_size)."""

    def fn(xs, offset, att_cache, cnn_cache, att_mask):
        ys, att, cnn = model.apply(variables, xs, offset, att_cache,
                                   cnn_cache, att_mask,
                                   method=model.forward_encoder_chunk)
        logp = model.apply(variables, ys, method=model.ctc_activation)
        return ys, logp, att, cnn

    att_cache, cnn_cache = model.encoder.zero_cache(
        1, cfg.required_cache_size)
    chunk_out = (cfg.decoding_window - cfg.right_context - 1) \
        // cfg.subsampling_rate + 1
    args = (
        jnp.zeros((1, cfg.decoding_window, input_dim), jnp.float32),
        jnp.zeros((), jnp.int32),
        att_cache, cnn_cache,
        jnp.ones((1, 1, cfg.required_cache_size + chunk_out), bool),
    )
    exp = jexport.export(jax.jit(fn))(
        *jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                      args))
    return exp, args


def export_encoder_full(model, variables, input_dim: int):
    """Full-context encoder with symbolic (B, T) dims.

    The T constraint is derived from the encoder's real subsampling
    geometry (sub*k + right_context + 1 yields a whole number of
    output frames) and recorded in export_meta.json as
    'time_constraint' so loaders know what to pad to."""
    enc = model.encoder
    sub = enc.subsampling_rate
    ctx = enc.right_context + 1
    constraint = f'{sub}*t + {ctx + sub - 1}'

    def fn(speech, speech_lengths):
        out, mask = model.apply(variables, speech, speech_lengths,
                                method=model.forward_encoder)
        logp = model.apply(variables, out, method=model.ctc_activation)
        return out, mask, logp

    b, t = jexport.symbolic_shape(f'b, {constraint}')
    exp = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((b, t, input_dim), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32))
    return exp, constraint


def export_decoder(model, variables, beam: int, max_len: int,
                   d_model: int, reverse_weight: float):
    """Rescoring decoder, fixed (beam, max_len) (ref export_onnx_cpu.py
    decoder export)."""

    def fn(hyps, hyps_lens, encoder_out):
        return model.apply(variables, hyps, hyps_lens, encoder_out,
                           reverse_weight,
                           method=model.forward_attention_decoder)

    t = jexport.symbolic_shape('t')[0]
    return jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((beam, max_len), jnp.int32),
        jax.ShapeDtypeStruct((beam,), jnp.int32),
        jax.ShapeDtypeStruct((1, t, d_model), jnp.float32))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--config', required=True)
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--output_dir', required=True)
    p.add_argument('--chunk_size', type=int, default=16)
    p.add_argument('--num_left_chunks', type=int, default=-1)
    p.add_argument('--beam', type=int, default=10)
    p.add_argument('--max_hyp_len', type=int, default=64)
    p.add_argument('--reverse_weight', type=float, default=0.0)
    args = p.parse_args(argv)

    configs = load_config(args.config)
    model, configs = init_model(None, configs)
    variables, _ = init_variables(model, configs,
                                  checkpoint=args.checkpoint)
    os.makedirs(args.output_dir, exist_ok=True)
    input_dim = configs['input_dim']
    enc = model.encoder
    cfg = StreamingConfig(decoding_chunk_size=args.chunk_size,
                          num_decoding_left_chunks=args.num_left_chunks,
                          subsampling_rate=enc.subsampling_rate,
                          right_context=enc.right_context)

    meta = {
        'chunk_size': args.chunk_size,
        'num_left_chunks': args.num_left_chunks,
        'decoding_window': cfg.decoding_window,
        'stride': cfg.stride,
        'required_cache_size': cfg.required_cache_size,
        'subsampling_rate': enc.subsampling_rate,
        'right_context': enc.right_context,
        'input_dim': input_dim,
        'output_dim': configs['output_dim'],
        'beam': args.beam,
        'max_hyp_len': args.max_hyp_len,
        # from the model, not output_dim-1: special_tokens configs
        # (whisper-style) use different ids (ref asr_model.py:39-48)
        'sos': int(model.sos),
        'eos': int(model.eos),
    }

    exp, _ = export_encoder_chunk(model, variables, cfg, input_dim)
    with open(os.path.join(args.output_dir,
                           'encoder_chunk.stablehlo'), 'wb') as f:
        f.write(bytes(exp.serialize()))
    exp, time_constraint = export_encoder_full(model, variables,
                                               input_dim)
    meta['time_constraint'] = time_constraint
    with open(os.path.join(args.output_dir,
                           'encoder_full.stablehlo'), 'wb') as f:
        f.write(bytes(exp.serialize()))
    if model.decoder is not None:
        exp = export_decoder(model, variables, args.beam,
                             args.max_hyp_len, enc.output_size,
                             args.reverse_weight)
        with open(os.path.join(args.output_dir,
                               'decoder_rescore.stablehlo'), 'wb') as f:
            f.write(bytes(exp.serialize()))
    with open(os.path.join(args.output_dir, 'export_meta.json'),
              'w') as f:
        json.dump(meta, f, indent=2)
    print(f'exported to {args.output_dir}')


if __name__ == '__main__':
    main()
