"""Label quality checker via CTC forced alignment.

Analog of ref runtime/core/bin/label_checker_main.cc: for each
utterance, force-align the transcript against the CTC posteriors and
report a per-utterance alignment score; low scores flag suspicious
(mis-labeled / mis-segmented) data.  Additionally decodes greedily and
prints the hyp for side-by-side inspection.
"""

import argparse
import logging

import numpy as np

import jax.numpy as jnp

logger = logging.getLogger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--model_dir', required=True)
    p.add_argument('--wav_scp', required=True)
    p.add_argument('--text', required=True)
    p.add_argument('--result_file', default='')
    p.add_argument('--is_penalty', type=float, default=3.0,
                   help='flag threshold: -score/len above this is '
                        'suspicious')
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import types
    from wenet_tpu.bin.decoder_main import build_decoder
    from wenet_tpu.dataset.audio import read_wav
    from wenet_tpu.ops.fbank import compute_fbank_np
    from wenet_tpu.utils.ctc_utils import force_align, insert_blank
    dargs = types.SimpleNamespace(
        model_dir=args.model_dir, chunk_size=-1, num_left_chunks=-1,
        beam_size=3, reverse_weight=0.0, lm_path='', lm_weight=0.5,
        fst_path='', dict_path='', no_lowercase=False)
    dec = build_decoder(dargs)
    model, variables, tokenizer = dec.model, dec.variables, dec.tokenizer
    num_mel = dec.feature_pipeline.config.num_mel_bins

    texts = {}
    with open(args.text, encoding='utf-8') as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                texts[parts[0]] = parts[1]

    out = open(args.result_file, 'w', encoding='utf-8') \
        if args.result_file else None
    with open(args.wav_scp, encoding='utf-8') as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2 or parts[0] not in texts:
                continue
            key, path = parts[0], parts[1]
            wav, rate = read_wav(path)
            feats = compute_fbank_np(wav[0] * (1 << 15),
                                     num_mel_bins=num_mel,
                                     sample_rate=rate)
            feats_j = jnp.asarray(feats)[None]
            lens = jnp.asarray([feats.shape[0]])
            enc, _ = model.apply(variables, feats_j, lens,
                                 method=model.forward_encoder)
            logp = np.asarray(model.apply(variables, enc,
                                          method=model.ctc_activation))[0]
            _, label = tokenizer.tokenize(texts[key])
            label = np.asarray(label, np.int32)
            if len(label) == 0 or len(label) * 2 + 1 > logp.shape[0]:
                status = 'TOO_SHORT'
                score = float('inf')
            else:
                ali = force_align(jnp.asarray(logp), jnp.asarray(label))
                score = -float(np.mean(
                    [logp[t, u] for t, u in
                     enumerate(np.asarray(ali))]))
                status = 'SUSPICIOUS' if score > args.is_penalty else 'OK'
            greedy = np.argmax(logp, -1)
            # dedup BEFORE dropping blanks: [a, blank, a] is a genuine
            # repeat 'a a', not one 'a' (utils/ctc_utils semantics)
            from wenet_tpu.utils.ctc_utils import (
                remove_duplicates_and_blank)
            dedup = remove_duplicates_and_blank(
                [int(t) for t in greedy], blank_id=0)
            hyp_text, _ = tokenizer.detokenize(dedup)
            msg = f'{key} {status} score={score:.3f} ref={texts[key]} ' \
                  f'hyp={hyp_text}'
            logger.info(msg)
            if out:
                out.write(msg + '\n')
    if out:
        out.close()


if __name__ == '__main__':
    main()
