"""Batch offline decoding. ref: wenet/bin/recognize.py:41-311."""

import argparse
import logging
import os

import jax

from wenet_tpu.dataset.dataset import Dataset
from wenet_tpu.models.runner import AsrRunner
from wenet_tpu.utils.config import load_config
from wenet_tpu.utils.ctc_utils import get_blank_id
from wenet_tpu.utils.init_model import init_model, init_variables
from wenet_tpu.utils.init_tokenizer import init_tokenizer


def get_args():
    parser = argparse.ArgumentParser(description='recognize with model')
    parser.add_argument('--config', required=True)
    parser.add_argument('--test_data', required=True)
    parser.add_argument('--data_type', default='raw',
                        choices=['raw', 'shard'])
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--beam_size', type=int, default=10)
    parser.add_argument('--length_penalty', type=float, default=0.0)
    parser.add_argument('--blank_penalty', type=float, default=0.0)
    parser.add_argument('--result_dir', required=True)
    parser.add_argument('--batch_size', type=int, default=16)
    parser.add_argument('--modes', dest='modes', nargs='+',
                        default=['attention_rescoring'],
                        help='decoding modes')
    parser.add_argument('--ctc_weight', type=float, default=0.0)
    parser.add_argument('--reverse_weight', type=float, default=0.0)
    parser.add_argument('--decoding_chunk_size', type=int, default=-1)
    parser.add_argument('--num_decoding_left_chunks', type=int,
                        default=-1)
    parser.add_argument('--simulate_streaming', action='store_true')
    parser.add_argument('--timestamps', action='store_true',
                        help='whisper-family attention decode with '
                        'timestamp tokens (the prompt ends with '
                        '<|0.00|> and the beam applies the timestamp '
                        'grammar); segments are written to a sibling '
                        '"segments" file. The reference leaves this '
                        'NotImplemented (common.py:217).')
    parser.add_argument('--override_config', action='append', default=[])
    parser.add_argument('--context_list_path', default=None)
    parser.add_argument('--context_graph_score', type=float, default=6.0)
    parser.add_argument('--lm_path', default=None,
                        help='ARPA n-gram for nbest rescoring '
                             '(shallow-fusion analog of the reference '
                             'TLG LM path, docs/lm.md)')
    parser.add_argument('--lm_weight', type=float, default=0.5)
    # hlg decode (ref recognize.py:144-167): modes hlg_onebest /
    # hlg_rescore over an HLG.txt built by tools/k2/make_hlg.sh
    parser.add_argument('--hlg', default='',
                        help='HLG.txt, only used for hlg decode')
    parser.add_argument('--word', default='',
                        help='words.txt, only used for hlg decode')
    parser.add_argument('--lm_scale', type=float, default=0.0)
    parser.add_argument('--decoder_scale', type=float, default=0.0)
    parser.add_argument('--r_decoder_scale', type=float, default=0.0)
    return parser.parse_args()


def _lm_rescore(result, lm, lm_weight, id2sym):
    """Re-rank an nbest list with ARPA LM scores (offline fusion)."""
    import dataclasses
    best, best_score, best_idx = None, -float('inf'), 0
    for idx, (toks, ac) in enumerate(zip(result.nbest,
                                         result.nbest_scores)):
        words = [id2sym.get(int(t), str(int(t))) for t in toks]
        score = ac + lm_weight * lm.score_sequence(words)
        if score > best_score:
            best, best_score, best_idx = toks, score, idx
    times = (result.nbest_times[best_idx]
             if result.nbest_times else result.times)
    return dataclasses.replace(result, tokens=list(best),
                               score=best_score, times=times)


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    configs = load_config(args.config, args.override_config)

    # test-mode dataset surgery (ref recognize.py:209-230)
    test_conf = dict(configs['dataset_conf'])
    test_conf['filter_conf'] = {
        'max_length': 102400, 'min_length': 0,
        'token_max_length': 102400, 'token_min_length': 0,
        'max_output_input_ratio': 102400,
        'min_output_input_ratio': 0,
    }
    test_conf['speed_perturb'] = False
    test_conf['spec_aug'] = False
    test_conf['spec_sub'] = False
    test_conf['spec_trim'] = False
    test_conf['shuffle'] = False
    test_conf['list_shuffle'] = False
    test_conf['sort'] = False
    test_conf['cycle'] = 1
    if 'fbank_conf' in test_conf:
        test_conf['fbank_conf']['dither'] = 0.0
    test_conf['batch_conf'] = {'batch_type': 'static',
                               'batch_size': args.batch_size}

    tokenizer = init_tokenizer(configs)
    configs['input_dim'] = test_conf.get(
        'fbank_conf', test_conf.get('mfcc_conf', test_conf.get(
            'log_mel_spectrogram_conf', {}))).get('num_mel_bins', 80)
    if 'lfr_conf' in configs:
        # paraformer convention: input_dim is the post-LFR dim
        configs['input_dim'] *= configs['lfr_conf'].get('lfr_m', 7)
    configs['output_dim'] = tokenizer.vocab_size()
    configs, blank_id = get_blank_id(configs, tokenizer.symbol_table)

    test_dataset = Dataset(args.data_type, args.test_data, tokenizer,
                           test_conf, partition=False)

    model, configs = init_model(args, configs)
    variables, configs = init_variables(model, configs,
                                        checkpoint=args.checkpoint)
    runner = AsrRunner(model, variables)

    lm = None
    if args.lm_path:
        from wenet_tpu.lm.arpa import read_arpa
        lm = read_arpa(args.lm_path)
        id2sym = {v: k for k, v in tokenizer.symbol_table.items()}

    context_graph = None
    if args.context_list_path:
        from wenet_tpu.utils.context_graph import ContextGraph
        context_graph = ContextGraph(args.context_list_path,
                                     tokenizer.symbol_table,
                                     context_score=args.
                                     context_graph_score)

    files = {}
    seg_files = {}
    ts_begin = None
    if args.timestamps:
        st = dict(getattr(model, 'special_tokens', None) or {})
        if 'timestamp_begin' not in st:
            raise SystemExit('--timestamps needs a whisper-family '
                             'model (special_tokens.timestamp_begin)')
        ts_begin = int(st['timestamp_begin'])
    for mode in args.modes:
        d = os.path.join(args.result_dir, mode)
        os.makedirs(d, exist_ok=True)
        files[mode] = open(os.path.join(d, 'text'), 'w',
                           encoding='utf8')
        if ts_begin is not None:
            seg_files[mode] = open(os.path.join(d, 'segments'), 'w',
                                   encoding='utf8')

    hlg_modes = [m for m in args.modes
                 if m in ('hlg_onebest', 'hlg_rescore')]
    runner_modes = [m for m in args.modes if m not in hlg_modes]

    def write_results(keys, mode, hyps):
        for i, key in enumerate(keys):
            if lm is not None and hyps[i].nbest:
                hyps[i] = _lm_rescore(hyps[i], lm, args.lm_weight,
                                      id2sym)
            tokens = [int(t) for t in hyps[i].tokens]
            if ts_begin is not None:
                from wenet_tpu.models.whisper.tokens import (
                    whisper_tokens_to_segments)
                tokens, segments = whisper_tokens_to_segments(
                    tokens, ts_begin)
                for start, end, seg in segments:
                    seg_files[mode].write(
                        '{} {:.2f} {} {}\n'.format(
                            key, start,
                            '{:.2f}'.format(end) if end is not None
                            else '-', tokenizer.detokenize(seg)[0]))
            line = '{} {}'.format(key, tokenizer.detokenize(tokens)[0])
            logging.info('%s %s', mode, line)
            files[mode].write(line + '\n')

    # single-mode batch decode rides a software pipeline (device
    # program for batch i+1 || overlapped result fetch for batch i ||
    # host finalize for batch i-1 — AsrRunner.decode_*_batches, see
    # docs/runtime.md); multi-mode / streaming / LM / HLG runs take the
    # generic sequential loop below.  Hypotheses are identical either
    # way (tested in test_e2e.py / test_paraformer.py).
    pipelined = None
    if (len(runner_modes) == 1 and not hlg_modes and lm is None
            and not args.simulate_streaming
            and args.decoding_chunk_size < 0):
        mode = runner_modes[0]
        cls = type(model).__name__
        if mode == 'attention_rescoring' and cls == 'ASRModel':
            # context biasing rides the C++ beam inside the pipeline
            pipelined = lambda feed: runner.decode_rescoring_batches(
                feed, beam_size=args.beam_size,
                ctc_weight=args.ctc_weight,
                reverse_weight=args.reverse_weight, blank_id=blank_id,
                blank_penalty=args.blank_penalty,
                context_graph=context_graph)
        elif (mode == 'ctc_greedy_search'
              and cls in ('ASRModel', 'SenseVoiceSmall')):
            # SenseVoiceSmall decodes via the same encoder+CTC program
            # (its forward_encoder embeds the lid/itn prompt frames)
            pipelined = lambda feed: runner.decode_ctc_greedy_batches(
                feed, blank_id=blank_id,
                blank_penalty=args.blank_penalty)
        elif mode == 'ctc_prefix_beam_search' and cls == 'ASRModel':
            pipelined = lambda feed: runner.decode_prefix_beam_batches(
                feed, beam_size=args.beam_size, blank_id=blank_id,
                blank_penalty=args.blank_penalty,
                context_graph=context_graph)
        elif mode == 'attention' and cls in ('ASRModel', 'Whisper'):
            pipelined = lambda feed: runner.decode_attention_batches(
                feed, beam_size=args.beam_size,
                length_penalty=args.length_penalty)
        elif (mode in ('paraformer_greedy_search',
                       'paraformer_beam_search')
              and context_graph is None
              and hasattr(model, 'forward_paraformer')):
            pipelined = lambda feed: runner.decode_paraformer_batches(
                feed, mode=mode)
        elif mode == 'rnnt_greedy_search' and cls == 'Transducer':
            pipelined = lambda feed: \
                runner.decode_rnnt_greedy_batches(feed)

    if pipelined is not None:
        batch_meta = []

        def feed():
            for batch in test_dataset:
                batch_meta.append(batch['keys'])
                yield (batch['feats'], batch['feats_lengths'],
                       {'tasks': batch['tasks'],
                        'langs': batch['langs'],
                        'no_timestamp': not args.timestamps})

        # only the attention pipeline consumes the whisper-style
        # task/lang infos; the others take (feats, lengths) pairs
        two_arg = mode != 'attention'
        src = ((f, l) for f, l, _ in feed()) if two_arg else feed()
        for hyps in pipelined(src):
            write_results(batch_meta.pop(0), mode, hyps)
        for f in list(files.values()) + list(seg_files.values()):
            f.close()
        return

    for batch_idx, batch in enumerate(test_dataset):
        keys = batch['keys']
        results = {}
        for mode in hlg_modes:
            from wenet_tpu.models.k2.model import (hlg_onebest,
                                                   hlg_rescore)
            from wenet_tpu.models.transformer.search import DecodeResult
            if mode == 'hlg_onebest':
                hyps = hlg_onebest(model, runner.variables,
                                   batch['feats'],
                                   batch['feats_lengths'],
                                   hlg=args.hlg, word=args.word,
                                   symbol_table=tokenizer.symbol_table)
            else:
                hyps = hlg_rescore(model, runner.variables,
                                   batch['feats'],
                                   batch['feats_lengths'],
                                   lm_scale=args.lm_scale,
                                   decoder_scale=args.decoder_scale,
                                   r_decoder_scale=args.r_decoder_scale,
                                   hlg=args.hlg, word=args.word,
                                   symbol_table=tokenizer.symbol_table)
            results[mode] = [DecodeResult(h) for h in hyps]
        if runner_modes:
            results.update(runner.decode(
                runner_modes, batch['feats'], batch['feats_lengths'],
                beam_size=args.beam_size,
                decoding_chunk_size=args.decoding_chunk_size,
                num_decoding_left_chunks=args.num_decoding_left_chunks,
                ctc_weight=args.ctc_weight,
                simulate_streaming=args.simulate_streaming,
                reverse_weight=args.reverse_weight,
                context_graph=context_graph, blank_id=blank_id,
                blank_penalty=args.blank_penalty,
                length_penalty=args.length_penalty,
                infos={'tasks': batch['tasks'],
                       'langs': batch['langs'],
                       'no_timestamp': not args.timestamps}))
        for mode, hyps in results.items():
            write_results(keys, mode, hyps)
    for f in list(files.values()) + list(seg_files.values()):
        f.close()


if __name__ == '__main__':
    main()
