"""CTC forced alignment -> Praat TextGrid. ref: wenet/bin/alignment.py:42-268."""

import argparse
import logging
import os

import jax.numpy as jnp
import numpy as np

from wenet_tpu.dataset.dataset import Dataset
from wenet_tpu.models.runner import AsrRunner
from wenet_tpu.utils.config import load_config
from wenet_tpu.utils.ctc_utils import (force_align, gen_ctc_peak_time,
                                       get_blank_id)
from wenet_tpu.utils.init_model import init_model, init_variables
from wenet_tpu.utils.init_tokenizer import init_tokenizer


def get_args():
    parser = argparse.ArgumentParser(
        description='use ctc to generate alignment')
    parser.add_argument('--config', required=True)
    parser.add_argument('--input_file', required=True)
    parser.add_argument('--data_type', default='raw',
                        choices=['raw', 'shard'])
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--result_file', required=True)
    parser.add_argument('--gen_praat', action='store_true')
    parser.add_argument('--batch_size', type=int, default=1)
    return parser.parse_args()


def generator_textgrid(maxtime, lines, output):
    """ref: alignment.py:55-85."""
    interval = len(lines)
    with open(output, 'w', encoding='utf8') as f:
        f.write('File type = "ooTextFile"\n')
        f.write('Object class = "TextGrid"\n\n')
        f.write('xmin = 0\nxmax = %.2f\n' % maxtime)
        f.write('tiers? <exists>\nsize = 1\nitem []:\n')
        f.write('    item [1]:\n')
        f.write('        class = "IntervalTier"\n')
        f.write('        name = "token"\n')
        f.write('        xmin = 0\n        xmax = %.2f\n' % maxtime)
        f.write('        intervals: size = %d\n' % interval)
        for i, line in enumerate(lines):
            s, e, t = line.split()
            f.write('        intervals [%d]:\n' % (i + 1))
            f.write('            xmin = %s\n            xmax = %s\n' %
                    (s, e))
            f.write('            text = "%s"\n' % t)


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO)
    configs = load_config(args.config)
    tokenizer = init_tokenizer(configs)
    conf = dict(configs['dataset_conf'])
    conf['shuffle'] = False
    conf['list_shuffle'] = False
    conf['sort'] = False
    conf['spec_aug'] = False
    conf['spec_sub'] = False
    conf['spec_trim'] = False
    conf['speed_perturb'] = False
    conf['cycle'] = 1
    if 'fbank_conf' in conf:
        conf['fbank_conf']['dither'] = 0.0
    conf['batch_conf'] = {'batch_type': 'static', 'batch_size': 1}
    configs.setdefault('input_dim', conf.get('fbank_conf', {}).get(
        'num_mel_bins', 80))
    configs.setdefault('output_dim', tokenizer.vocab_size())
    configs, blank_id = get_blank_id(configs, tokenizer.symbol_table)

    dataset = Dataset(args.data_type, args.input_file, tokenizer, conf,
                      partition=False)
    model, configs = init_model(args, configs)
    variables, configs = init_variables(model, configs,
                                        checkpoint=args.checkpoint)
    runner = AsrRunner(model, variables)

    frame_shift_s = 0.01 * (
        runner.model.encoder.subsampling_rate)
    with open(args.result_file, 'w', encoding='utf8') as fout:
        for batch in dataset:
            key = batch['keys'][0]
            feats = jnp.asarray(batch['feats'])
            lengths = jnp.asarray(batch['feats_lengths'])
            enc, mask = runner.forward_encoder(feats, lengths)
            ctc_probs = runner.ctc_logprobs(enc, blank_id=blank_id)
            n = int(jnp.sum(mask[0, 0]))
            label = batch['target'][0][:batch['target_lengths'][0]]
            alignment = force_align(np.asarray(ctc_probs[0, :n]),
                                    np.asarray(label), blank_id)
            fout.write('{} {}\n'.format(
                key, ' '.join(str(x) for x in alignment)))
            if args.gen_praat:
                peaks = gen_ctc_peak_time(alignment, blank_id)
                tokens = tokenizer.detokenize(
                    [int(x) for x in label])[1]
                lines = []
                prev = 0.0
                for tok, peak in zip(tokens, peaks):
                    start = prev
                    end = (peak + 1) * frame_shift_s
                    lines.append(f'{start:.2f} {end:.2f} {tok}')
                    prev = end
                textgrid_path = os.path.splitext(
                    args.result_file)[0] + f'.{key}.TextGrid'
                generator_textgrid(n * frame_shift_s, lines,
                                   textgrid_path)


if __name__ == '__main__':
    main()
