#!/usr/bin/env python3
"""Decode the same checkpoint through the reference stack AND
wenet_tpu, diff hypotheses, and report the WER delta.

The north-star acceptance check (SURVEY.md §7 stage 10): the day a
real trained torch checkpoint is available, this is the one command
that proves decode parity end-to-end —

    python tools/parity_decode.py \
        --config   exp/train.yaml \
        --checkpoint exp/final.pt \
        --wav_list wav.scp \
        [--dict data/dict/lang_char.txt] \
        [--text data/test/text] \
        [--modes ctc_greedy_search,ctc_prefix_beam_search,attention,attention_rescoring]

For every shared decode mode it decodes each wav through
  * the ACTUAL reference python stack (/root/reference, imported via
    tests/refwenet.py — ref analog: wenet/bin/recognize.py +
    tools/decode.sh), and
  * wenet_tpu's AsrRunner,
feeding BOTH stacks the identical fbank features (wenet_tpu's
kaldi-compatible frontend, validated against the reference's real
wavs in tests/test_reference_fixtures.py) so the comparison isolates
model + search math.

Reports, per mode: #utts, #identical hypotheses, and the token-level
WER of wenet_tpu's hypotheses scored against the reference's (the
"WER delta" — 0.0 means the stacks are interchangeable).  With
--text (ground-truth transcripts) it additionally scores both stacks
against the truth (tools/compute_wer.py semantics) and reports
WER(tpu) - WER(ref).  Hypotheses are written under --result_dir.
"""

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:  # runnable from any cwd
    sys.path.insert(0, REPO_ROOT)

SHARED_MODES = ('ctc_greedy_search', 'ctc_prefix_beam_search',
                'attention', 'attention_rescoring')
# per-family product decode paths (VERDICT r4 item #7): paraformer
# greedy rides both stacks' decode() dispatch (ref
# wenet/models/paraformer/paraformer.py:387-392); rnnt greedy maps to
# the ref Transducer.greedy_search entry (transducer.py:398 — the ref
# decode() dispatch no longer carries the rnnt modes, recognize.py's
# help list notwithstanding); whisper parity = mode 'attention' on a
# whisper config with --whisper_task/--whisper_lang prompt infos.
FAMILY_MODES = ('paraformer_greedy_search', 'rnnt_greedy_search')


def _import_reference():
    sys.path.insert(0, os.path.join(REPO_ROOT, 'tests'))
    import refwenet
    refwenet.load()
    from wenet.utils.init_model import init_model as ref_init_model
    return ref_init_model


def _edit_distance(ref, hyp):
    """Token-level Levenshtein distance (the compute_wer.py metric)."""
    m, n = len(ref), len(hyp)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ref[i - 1] != hyp[j - 1]))
        prev = cur
    return prev[n]


def _read_wav_list(path):
    """wav.scp ('utt path' per line) or a bare list of wav paths."""
    utts = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if len(parts) >= 2:
                utts.append((parts[0], parts[1]))
            else:
                utts.append((os.path.splitext(
                    os.path.basename(parts[0]))[0], parts[0]))
    return utts


def _read_symbol_table(path):
    table = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:
                table[int(parts[1])] = parts[0]
    return table


def _read_text(path):
    truth = {}
    with open(path) as f:
        for line in f:
            parts = line.split(maxsplit=1)
            if len(parts) == 2:
                truth[parts[0]] = parts[1].split()
    return truth


def compute_features(wav_path, configs):
    """Shared fbank front end (runtime/feature_pipeline.py,
    kaldi-compatible — the same features recognize.py feeds)."""
    import numpy as np

    from wenet_tpu.dataset.audio import read_wav
    from wenet_tpu.runtime.feature_pipeline import (FeaturePipeline,
                                                    FeaturePipelineConfig)
    wav, sr = read_wav(wav_path)
    wav = np.asarray(wav)[0]  # mono channel, float32 in [-1, 1]
    cfg = FeaturePipelineConfig.from_configs(configs)
    if sr != cfg.sample_rate:
        raise ValueError(f'{wav_path}: sample rate {sr} != config '
                         f'{cfg.sample_rate}')
    pipe = FeaturePipeline(cfg)
    feats = pipe.accept_waveform(wav)
    return np.asarray(feats, np.float32)


def build_models(configs, checkpoint=None, seed=1234):
    """(ref torch model, tpu runner) with IDENTICAL weights: the torch
    checkpoint (or a seeded random init when no checkpoint is given —
    the CI mode) is imported into the flax tree via
    convert_torch_state_dict(strict=True)."""
    import copy

    import torch

    from wenet_tpu.models.runner import AsrRunner
    from wenet_tpu.utils.checkpoint import convert_torch_state_dict
    from wenet_tpu.utils.init_model import (init_model as our_init_model,
                                            init_variables)

    ref_init_model = _import_reference()
    from types import SimpleNamespace
    torch.manual_seed(seed)
    tmodel, _ = ref_init_model(SimpleNamespace(),
                               copy.deepcopy(configs))
    if checkpoint:
        sd = torch.load(checkpoint, map_location='cpu')
        if 'state_dict' in sd:
            sd = sd['state_dict']
        tmodel.load_state_dict(sd, strict=True)
    tmodel.eval()

    jmodel, our_configs = our_init_model(None, copy.deepcopy(configs))
    variables, _ = init_variables(jmodel, our_configs)
    variables = convert_torch_state_dict(tmodel.state_dict(), variables,
                                         strict=True)
    return tmodel, AsrRunner(jmodel, variables)


def decode_both(tmodel, runner, feats, modes, beam_size, ctc_weight,
                reverse_weight, infos=None):
    """One utterance through both stacks; returns
    {mode: (ref_tokens, tpu_tokens)}."""
    import jax.numpy as jnp
    import numpy as np
    import torch

    speech = torch.tensor(feats[None, ...])
    lens = torch.tensor([feats.shape[0]], dtype=torch.long)
    dispatch = [m for m in modes if m != 'rnnt_greedy_search']
    ref_out = {}
    with torch.no_grad():
        if dispatch:
            ref_out = tmodel.decode(dispatch, speech, lens,
                                    beam_size=beam_size,
                                    ctc_weight=ctc_weight,
                                    reverse_weight=reverse_weight,
                                    infos=infos)
        if 'rnnt_greedy_search' in modes:
            # ref Transducer exposes greedy via its own entry, not
            # decode() (transducer.py:398 basic_greedy_search).
            # n_steps=1 on BOTH sides: the ref budget is per-frame
            # while the TPU scan's is total (2*T); they are only
            # equivalent at n_steps=1, and under random CI weights the
            # ref would otherwise emit 64 junk tokens per frame.  With
            # a trained checkpoint both bounds are far from binding.
            hyps = tmodel.greedy_search(speech, lens, n_steps=1)
            ref_out['rnnt_greedy_search'] = [
                type('R', (), {'tokens': hyps[0]})()]
    our_out = runner.decode(list(modes), jnp.asarray(feats[None, ...]),
                            jnp.asarray([feats.shape[0]]),
                            beam_size=beam_size, ctc_weight=ctc_weight,
                            reverse_weight=reverse_weight, infos=infos,
                            rnnt_n_steps=1)
    pairs = {}
    for mode in modes:
        ref_tokens = [int(t) for t in ref_out[mode][0].tokens]
        our_tokens = [int(t) for t in np.asarray(our_out[mode][0].tokens)]
        pairs[mode] = (ref_tokens, our_tokens)
    return pairs


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--config', required=True,
                        help='train.yaml of the checkpoint')
    parser.add_argument('--checkpoint', default=None,
                        help='torch .pt; omitted -> seeded random '
                             'weights (CI parity mode)')
    parser.add_argument('--wav_list', required=True,
                        help='wav.scp or plain list of wav paths')
    parser.add_argument('--modes', default=','.join(SHARED_MODES))
    parser.add_argument('--dict', dest='dict_path', default=None,
                        help='units.txt (symbol id) for readable hyps')
    parser.add_argument('--text', default=None,
                        help='ground-truth transcripts (utt words...)')
    parser.add_argument('--beam_size', type=int, default=10)
    parser.add_argument('--ctc_weight', type=float, default=0.3)
    parser.add_argument('--reverse_weight', type=float, default=0.3)
    parser.add_argument('--seed', type=int, default=1234)
    parser.add_argument('--result_dir', default=None)
    parser.add_argument('--whisper_task', default=None,
                        help="whisper prompt task (e.g. 'transcribe') "
                             'for attention-mode parity on whisper '
                             'configs')
    parser.add_argument('--whisper_lang', default=None,
                        help="whisper prompt language (e.g. 'zh')")
    args = parser.parse_args()

    import yaml
    with open(args.config) as f:
        configs = yaml.safe_load(f)
    modes = [m.strip() for m in args.modes.split(',') if m.strip()]
    unknown = set(modes) - set(SHARED_MODES) - set(FAMILY_MODES)
    if unknown:
        parser.error(f'unsupported shared modes: {sorted(unknown)}; '
                     f'choose from {SHARED_MODES + FAMILY_MODES}')
    infos = None
    if args.whisper_task or args.whisper_lang:
        infos = {'tasks': [args.whisper_task or 'transcribe'],
                 'langs': [args.whisper_lang or 'zh']}

    utts = _read_wav_list(args.wav_list)
    symbols = (_read_symbol_table(args.dict_path)
               if args.dict_path else None)
    truth = _read_text(args.text) if args.text else None

    tmodel, runner = build_models(configs, args.checkpoint, args.seed)

    stats = {m: {'utts': 0, 'identical': 0, 'delta_edits': 0,
                 'ref_tokens': 0, 'ref_err': 0, 'tpu_err': 0,
                 'truth_tokens': 0} for m in modes}
    hyps = {m: {'ref': {}, 'tpu': {}} for m in modes}
    for utt, wav_path in utts:
        feats = compute_features(wav_path, configs)
        pairs = decode_both(tmodel, runner, feats, modes,
                            args.beam_size, args.ctc_weight,
                            args.reverse_weight, infos=infos)
        for mode, (ref_tokens, our_tokens) in pairs.items():
            s = stats[mode]
            s['utts'] += 1
            s['identical'] += int(ref_tokens == our_tokens)
            s['delta_edits'] += _edit_distance(ref_tokens, our_tokens)
            s['ref_tokens'] += len(ref_tokens)
            to_sym = ((lambda ts: [symbols.get(t, f'<{t}>')
                                   for t in ts]) if symbols
                      else (lambda ts: [str(t) for t in ts]))
            hyps[mode]['ref'][utt] = to_sym(ref_tokens)
            hyps[mode]['tpu'][utt] = to_sym(our_tokens)
            if truth and utt in truth:
                s['truth_tokens'] += len(truth[utt])
                s['ref_err'] += _edit_distance(truth[utt],
                                               hyps[mode]['ref'][utt])
                s['tpu_err'] += _edit_distance(truth[utt],
                                               hyps[mode]['tpu'][utt])

    report = {}
    for mode in modes:
        s = stats[mode]
        row = {
            'utts': s['utts'],
            'identical': s['identical'],
            'wer_delta': (s['delta_edits'] / max(s['ref_tokens'], 1)),
        }
        if truth and s['truth_tokens']:
            row['wer_ref'] = s['ref_err'] / s['truth_tokens']
            row['wer_tpu'] = s['tpu_err'] / s['truth_tokens']
            row['wer_diff'] = row['wer_tpu'] - row['wer_ref']
        report[mode] = row
        flag = ('OK' if s['identical'] == s['utts'] else 'DIFF')
        extra = (f"  wer_ref={row.get('wer_ref', float('nan')):.4f}"
                 f"  wer_tpu={row.get('wer_tpu', float('nan')):.4f}"
                 if 'wer_ref' in row else '')
        print(f"[{flag}] {mode}: {s['identical']}/{s['utts']} identical"
              f"  wer_delta={row['wer_delta']:.4f}{extra}")

    if args.result_dir:
        os.makedirs(args.result_dir, exist_ok=True)
        for mode in modes:
            for side in ('ref', 'tpu'):
                path = os.path.join(args.result_dir,
                                    f'{mode}.{side}.text')
                with open(path, 'w') as f:
                    for utt, toks in sorted(hyps[mode][side].items()):
                        f.write(f"{utt} {' '.join(toks)}\n")
        with open(os.path.join(args.result_dir, 'report.json'),
                  'w') as f:
            json.dump(report, f, indent=2)

    print(json.dumps({'parity_decode': report}))
    return 0 if all(r['identical'] == r['utts']
                    for r in report.values()) else 1


if __name__ == '__main__':
    sys.exit(main())
