"""K2-parity model: LF-MMI training + HLG decoding, TPU-native.

ref: wenet/models/k2/model.py:27-304.  The reference delegates to
k2/icefall (GPU lattice library); here the same semantics are built on
this repo's own machinery:

* LF-MMI loss = -(numerator - denominator) where the numerator is the
  CTC forward score of the supervision (all alignments of the target
  token sequence — what icefall's MmiTrainingGraphCompiler numerator
  graph accepts for a token-level lexicon, up to a per-utterance LM
  constant that does not affect gradients) and the denominator is the
  dense forward score over a token-LM x CTC-topology graph
  (wenet_tpu/ops/fsa.py `fsa_forward_score`, a lax.scan — no k2, fully
  jittable on TPU).  The den graph comes from `lfmmi_dir/den.txt`,
  built by tools/k2/prepare_mmi.py (ref tools/k2/prepare_mmi.sh).

* hlg_onebest / hlg_rescore decode over an HLG text FST with the
  token-passing searcher (wenet_tpu/runtime/wfst_beam_search.py),
  mirroring ref k2/model.py:142-304: onebest returns the best word
  path expanded to unit ids; rescore fuses
  am + lm_scale*lm + decoder_scale*att + r_decoder_scale*r_att over
  the lattice n-best.
"""

import functools
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from wenet_tpu.models.transformer.asr_model import ASRModel
from wenet_tpu.ops.fsa import DenseFsa, fsa_forward_score, \
    fst_to_dense_arcs
from wenet_tpu.utils.mask import make_pad_mask


@functools.lru_cache(maxsize=4)
def _load_den_fsa(lfmmi_dir: str) -> DenseFsa:
    from wenet_tpu.lm.fst import TextFst
    path = os.path.join(lfmmi_dir, 'den.txt')
    return fst_to_dense_arcs(TextFst.read(path))


# jitted encoder+ctc program per model instance (HLG decode path)
_ENC_CTC_CACHE: Dict[int, Any] = {}


@functools.lru_cache(maxsize=4)
def _load_hlg(path: str):
    from wenet_tpu.lm.fst import TextFst
    return TextFst.read(path)


@functools.lru_cache(maxsize=4)
def _load_word_table(path: str) -> Dict[int, str]:
    from wenet_tpu.lm.fst import read_symbol_table
    return read_symbol_table(path)


class K2Model(ASRModel):
    """ref: k2/model.py:27-304 (LF-MMI replaces the CTC branch)."""
    lfmmi_dir: str = ''
    den_scale: float = 1.0

    def _calc_lfmmi_loss(self, encoder_out, encoder_out_lens, target,
                         target_lengths, row_valid=None):
        """ref: k2/model.py:100-140 (k2.DenseFsaVec + LFMMILoss)."""
        fsa = _load_den_fsa(self.lfmmi_dir)
        logits = self.ctc.logits(encoder_out)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        T = encoder_out.shape[1]
        logit_paddings = make_pad_mask(encoder_out_lens, T).astype(
            jnp.float32)
        label_paddings = make_pad_mask(target_lengths,
                                       target.shape[1]).astype(jnp.float32)
        labels = jnp.where(label_paddings > 0, 0, target).astype(jnp.int32)
        # numerator: CTC forward score of the supervision
        from wenet_tpu.ops.ctc_loss import ctc_loss
        num = -ctc_loss(logits.astype(jnp.float32), logit_paddings,
                        labels, label_paddings, blank_id=0)
        num = jnp.where(jnp.isfinite(num), num, 0.0)
        # denominator: dense forward over the den graph
        den = jax.vmap(fsa_forward_score, in_axes=(0, 0, None))(
            log_probs.astype(jnp.float32), encoder_out_lens, fsa)
        per_utt = -(num - self.den_scale * den)
        if row_valid is not None:
            per_utt = jnp.where(row_valid, per_utt, 0.0)
            denom = jnp.maximum(jnp.sum(row_valid), 1)
        else:
            denom = encoder_out.shape[0]
        loss = jnp.sum(per_utt) / denom
        return loss, log_probs

    def __call__(self, feats, feats_lengths, target, target_lengths,
                 train: bool = False,
                 chunk_rng=None) -> Dict[str, Any]:
        """Base joint loss with the CTC branch swapped for LF-MMI when
        lfmmi_dir is configured (ref k2/model.py:62-66 _forward_ctc)."""
        if not self.lfmmi_dir:
            # no den graph configured: behave exactly like ASRModel
            # (the reference requires lfmmi_dir for training too,
            # k2/model.py:56-58)
            return super().__call__(feats, feats_lengths, target,
                                    target_lengths, train=train,
                                    chunk_rng=chunk_rng)
        encoder_out, encoder_mask = self.encoder(feats, feats_lengths,
                                                 train=train,
                                                 chunk_rng=chunk_rng)
        encoder_out_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1)
        row_valid = feats_lengths > 0

        loss_ctc, ctc_probs = None, None
        if self.ctc_weight != 0.0 and self.ctc is not None:
            loss_ctc, ctc_probs = self._calc_lfmmi_loss(
                encoder_out, encoder_out_lens, target, target_lengths,
                row_valid=row_valid)

        loss_att, acc_att = None, None
        if self.apply_non_blank_embedding:
            encoder_out, encoder_mask = self.filter_blank_embedding(
                ctc_probs, encoder_out)
        if self.ctc_weight != 1.0:
            loss_att, acc_att = self._calc_att_loss(
                encoder_out, encoder_mask, target, target_lengths,
                train=train, row_valid=row_valid)

        if loss_ctc is None:
            loss = loss_att
        elif loss_att is None:
            loss = loss_ctc
        else:
            loss = (self.ctc_weight * loss_ctc +
                    (1 - self.ctc_weight) * loss_att)
        return {'loss': loss, 'loss_att': loss_att, 'loss_ctc': loss_ctc,
                'th_accuracy': acc_att}


# ---------------------------------------------------------------------------
# HLG decoding (host orchestration over the token-passing searcher)
# ---------------------------------------------------------------------------
def _hlg_search(model, variables, speech, speech_lengths, hlg: str,
                word: str, beam_size: int = 10, nbest_width: int = 4):
    """Shared encoder + ctc + WFST search. Returns per-utterance
    searcher n-best details [(cost, _Token)], plus word table."""
    from wenet_tpu.runtime.wfst_beam_search import CtcWfstBeamSearch
    fst = _load_hlg(hlg)
    word_table = _load_word_table(word)
    key = id(model)
    if key not in _ENC_CTC_CACHE:
        def _enc_ctc(variables, speech, speech_lengths):
            eo, em = model.apply(variables, speech, speech_lengths,
                                 method=model.forward_encoder)
            logp = model.apply(variables, eo,
                               method=model.ctc_activation)
            return eo, em, logp
        _ENC_CTC_CACHE[key] = jax.jit(_enc_ctc)
    encoder_out, encoder_mask, logp = _ENC_CTC_CACHE[key](
        variables, jnp.asarray(speech), jnp.asarray(speech_lengths))
    enc_lens_d = jnp.sum(encoder_mask[:, 0, :], axis=-1)
    ctc_probs, enc_lens = jax.device_get((logp, enc_lens_d))
    per_utt = []
    for b in range(ctc_probs.shape[0]):
        dec = CtcWfstBeamSearch(fst, word_table=word_table,
                                beam_size=beam_size,
                                nbest_width=nbest_width)
        dec.search(ctc_probs[b, :int(enc_lens[b])])
        dec.finalize_search()
        per_utt.append(dec._nbest())
    return per_utt, word_table, encoder_out, enc_lens


def _words_to_units(words: List[int], word_table: Dict[int, str],
                    symbol_table: Dict[str, int]) -> List[int]:
    """ref k2/model.py:181-183: word ids -> word strings -> unit ids."""
    return [symbol_table[ch] for w in words for ch in word_table[w]
            if ch in symbol_table]


def hlg_onebest(model, variables, speech, speech_lengths, hlg: str = '',
                word: str = '', symbol_table: Optional[Dict[str, int]]
                = None) -> List[List[int]]:
    """ref: k2/model.py:142-184."""
    per_utt, word_table, _, _ = _hlg_search(model, variables, speech,
                                            speech_lengths, hlg, word)
    return [_words_to_units(list(nbest[0][1].words), word_table,
                            symbol_table) if nbest else []
            for nbest in per_utt]


def hlg_rescore(model, variables, speech, speech_lengths,
                lm_scale: float = 0.0, decoder_scale: float = 0.0,
                r_decoder_scale: float = 0.0, hlg: str = '',
                word: str = '',
                symbol_table: Optional[Dict[str, int]] = None
                ) -> List[List[int]]:
    """ref: k2/model.py:186-304 — lattice n-best + attention-decoder
    fusion: tot = am + lm_scale*lm + decoder_scale*att +
    r_decoder_scale*r_att; argmax per utterance."""
    per_utt, word_table, encoder_out, enc_lens = _hlg_search(
        model, variables, speech, speech_lengths, hlg, word)
    sos, eos = model.sos, model.eos
    results = []
    for b, nbest in enumerate(per_utt):
        if not nbest:
            results.append([])
            continue
        hyps = [_words_to_units(list(tok.words), word_table,
                                symbol_table) for _, tok in nbest]
        n = len(hyps)
        max_len = max((len(h) for h in hyps), default=0)
        hyps_pad = np.full((n, max_len + 1), eos, np.int32)
        hyps_pad[:, 0] = sos
        for i, h in enumerate(hyps):
            hyps_pad[i, 1:1 + len(h)] = h
        hyps_lens = np.asarray([len(h) + 1 for h in hyps], np.int32)
        enc = encoder_out[b:b + 1, :int(enc_lens[b])]
        # reverse_weight fixed at 0.5 for the r-decoder pass
        # (ref k2/model.py:272)
        decoder_out, r_decoder_out = model.apply(
            variables, jnp.asarray(hyps_pad), jnp.asarray(hyps_lens),
            enc, 0.5, method=model.forward_attention_decoder)
        decoder_out = np.asarray(decoder_out)
        has_r = getattr(r_decoder_out, 'ndim', 0) > 0
        if has_r:
            r_decoder_out = np.asarray(r_decoder_out)
        best_i, best_score = 0, -float('inf')
        for i, h in enumerate(hyps):
            dec = sum(decoder_out[i, j, h[j]] for j in range(len(h)))
            r_dec = 0.0
            if has_r:
                r_dec = sum(r_decoder_out[i, len(h) - j - 1, h[j]]
                            for j in range(len(h)))
                r_dec += r_decoder_out[i, len(h), eos]
            am = -nbest[i][1].ac
            lm = -nbest[i][1].gc
            tot = (am + lm_scale * lm + decoder_scale * dec +
                   r_decoder_scale * r_dec)
            if tot > best_score:
                best_score, best_i = tot, i
        results.append(hyps[best_i])
    return results
