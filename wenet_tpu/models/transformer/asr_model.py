"""Hybrid CTC/attention ASR model (U2/U2++). ref: wenet/models/transformer/asr_model.py:36-547.

The linen module exposes the same contract as the reference's
TorchScript export surface (forward_encoder_chunk / ctc_activation /
forward_attention_decoder, ref asr_model.py:360-547) as `apply`-able
methods; decode orchestration lives in wenet_tpu/models/transformer/search.py.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.transformer.label_smoothing_loss import (
    label_smoothing_loss)
from wenet_tpu.utils.common import (IGNORE_ID, add_sos_eos,
                                    reverse_pad_list, th_accuracy)
from wenet_tpu.utils.mask import make_pad_mask


class ASRModel(nn.Module):
    vocab_size: int
    encoder: nn.Module
    decoder: nn.Module
    ctc: Optional[nn.Module] = None
    ctc_weight: float = 0.5
    ignore_id: int = IGNORE_ID
    reverse_weight: float = 0.0
    lsm_weight: float = 0.0
    length_normalized_loss: bool = False
    special_tokens: Optional[dict] = None
    apply_non_blank_embedding: bool = False

    # default decoding method for the cli (ref asr_model.py:40)
    default_decode_method: str = 'attention_rescoring'

    @property
    def sos(self) -> int:
        if self.special_tokens is None:
            return self.vocab_size - 1
        return self.special_tokens.get('<sos>', self.vocab_size - 1)

    @property
    def eos(self) -> int:
        if self.special_tokens is None:
            return self.vocab_size - 1
        return self.special_tokens.get('<eos>', self.vocab_size - 1)

    # ------------------------------------------------------------------
    def __call__(self,
                 feats: jax.Array,
                 feats_lengths: jax.Array,
                 target: jax.Array,
                 target_lengths: jax.Array,
                 train: bool = False,
                 chunk_rng: Optional[jax.Array] = None
                 ) -> Dict[str, Any]:
        """Frontend + encoder + dual loss. ref: asr_model.py:82-138."""
        encoder_out, encoder_mask = self.encoder(feats, feats_lengths,
                                                 train=train,
                                                 chunk_rng=chunk_rng)
        encoder_out_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1)
        # ragged-tail dummy rows (executor.py pads the batch so it shards
        # evenly) have feats_lengths == 0; exclude them from every loss
        row_valid = feats_lengths > 0

        loss_ctc = None
        ctc_probs = None
        if self.ctc is not None and self.is_initializing() and \
                self.ctc_weight == 0.0:
            # touch ctc params so AR-only models (whisper/firered) can
            # still serve ctc_activation after init
            _ = self.ctc.log_softmax(encoder_out[:, :1])
        if self.ctc_weight != 0.0 and self.ctc is not None:
            loss_ctc, ctc_probs = self.ctc(encoder_out, encoder_out_lens,
                                           target, target_lengths,
                                           train=train,
                                           row_valid=row_valid)

        loss_att, acc_att = None, None
        if self.apply_non_blank_embedding:
            # ref asr_model.py:120-122 asserts ctc_weight != 0 here —
            # without CTC there are no ctc_probs to filter on
            assert ctc_probs is not None, (
                'apply_non_blank_embedding requires ctc_weight > 0')
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
        return {
            'loss': loss,
            'loss_att': loss_att,
            'loss_ctc': loss_ctc,
            'th_accuracy': acc_att,
        }

    def _calc_att_loss(self, encoder_out, encoder_mask, ys_pad,
                       ys_pad_lens, train: bool = False,
                       infos=None, row_valid=None
                       ) -> Tuple[jax.Array, jax.Array]:
        """ref: asr_model.py:181-214."""
        ys_in_pad, ys_out_pad = add_sos_eos(ys_pad, self.sos, self.eos,
                                            self.ignore_id)
        ys_in_lens = ys_pad_lens + 1
        r_ys_pad = reverse_pad_list(ys_pad, ys_pad_lens, self.ignore_id)
        r_ys_in_pad, r_ys_out_pad = add_sos_eos(r_ys_pad, self.sos,
                                                self.eos, self.ignore_id)
        num_valid = None
        if row_valid is not None:
            # dummy rows would still predict one <eos> token each —
            # ignore them outright and keep the batch denominator honest
            ys_out_pad = jnp.where(row_valid[:, None], ys_out_pad,
                                   self.ignore_id)
            r_ys_out_pad = jnp.where(row_valid[:, None], r_ys_out_pad,
                                     self.ignore_id)
            num_valid = jnp.sum(row_valid)
        decoder_out, r_decoder_out, _ = self.decoder(
            encoder_out, encoder_mask, ys_in_pad, ys_in_lens, r_ys_in_pad,
            self.reverse_weight, train=train)
        loss_att = label_smoothing_loss(decoder_out, ys_out_pad,
                                        self.vocab_size, self.ignore_id,
                                        self.lsm_weight,
                                        self.length_normalized_loss,
                                        num_valid=num_valid)
        if self.reverse_weight > 0.0:
            r_loss_att = label_smoothing_loss(r_decoder_out, r_ys_out_pad,
                                              self.vocab_size,
                                              self.ignore_id,
                                              self.lsm_weight,
                                              self.length_normalized_loss,
                                              num_valid=num_valid)
            loss_att = (loss_att * (1 - self.reverse_weight) +
                        r_loss_att * self.reverse_weight)
        acc_att = th_accuracy(decoder_out, ys_out_pad, self.ignore_id)
        return loss_att, acc_att

    # ------------------------------------------------------------------
    def filter_blank_embedding(self, ctc_probs, encoder_out):
        """Drop blank-argmax frames, keeping order (U2++ lite).

        ref: asr_model.py:153-179 (per-utterance python gather); here a
        fixed-shape stable partition: non-blank frames move to the front.
        """
        top1 = jnp.argmax(ctc_probs, axis=2)  # (B, T)
        nonblank = top1 != 0
        T = encoder_out.shape[1]
        # stable order: key = (blank? 1 : 0) * T + position
        key = jnp.where(nonblank, 0, T) + jnp.arange(T)[None, :]
        order = jnp.argsort(key, axis=1)
        gathered = jnp.take_along_axis(encoder_out, order[:, :, None],
                                       axis=1)
        lens = jnp.sum(nonblank, axis=1)
        mask = (~make_pad_mask(lens, T))[:, None, :]
        gathered = jnp.where(mask[:, 0, :, None], gathered, 0.0)
        return gathered, mask

    # -- decode-facing methods (one apply each) -------------------------
    def forward_encoder(self, speech, speech_lengths,
                        decoding_chunk_size: int = -1,
                        num_decoding_left_chunks: int = -1):
        """ref: asr_model.py:216-239 (full-context path)."""
        return self.encoder(speech, speech_lengths, decoding_chunk_size,
                            num_decoding_left_chunks)

    def forward_encoder_chunk(self, xs, offset, att_cache, cnn_cache,
                              att_mask=None):
        """Streaming chunk step. ref: asr_model.py:386-426."""
        return self.encoder.forward_chunk(xs, offset, att_cache, cnn_cache,
                                          att_mask)

    def ctc_activation(self, xs):
        """ref: asr_model.py:429-439."""
        return self.ctc.log_softmax(xs)

    def ctc_logprobs(self, encoder_out, blank_penalty: float = 0.0,
                     blank_id: int = 0):
        """ref: asr_model.py:253-265."""
        if blank_penalty > 0.0:
            logits = self.ctc.logits(encoder_out)
            logits = logits.at[:, :, blank_id].add(-blank_penalty)
            return jax.nn.log_softmax(logits, axis=-1)
        return self.ctc.log_softmax(encoder_out)

    def ctc_argmax(self, encoder_out, blank_penalty: float = 0.0,
                   blank_id: int = 0, chunk: int = None):
        """Greedy CTC ids == argmax of ctc_logprobs (ref
        asr_model.py:253-265 + argmax).  chunk=None (default)
        size-gates the head: dense while the (B, T, V) posterior is
        HBM-comfortable, computed in T-chunks past the spill point
        (ctc.py argmax).  An explicit chunk forces the chunked
        formulation (tests pin its id-equality)."""
        if chunk is None:
            return self.ctc.argmax(encoder_out, blank_penalty, blank_id)
        return self.ctc.argmax_chunked(encoder_out, blank_penalty,
                                       blank_id, chunk)

    def ctc_topk(self, encoder_out, k: int, blank_penalty: float = 0.0,
                 blank_id: int = 0, chunk: int = None):
        """Per-frame top-k (values, ids) of ctc_logprobs; size-gated
        dense/chunked like ctc_argmax (ctc.py topk)."""
        if chunk is None:
            return self.ctc.topk(encoder_out, k, blank_penalty, blank_id)
        return self.ctc.topk_chunked(encoder_out, k, blank_penalty,
                                     blank_id, chunk)

    def forward_attention_decoder(self, hyps, hyps_lens, encoder_out,
                                  reverse_weight: float = 0.0,
                                  encoder_mask=None):
        """Batched nbest rescoring decoder. ref: asr_model.py:452-547.

        hyps: (n, L) with leading <sos>; encoder_out: (1, T, D), or
        already expanded to (n, T, D) with a matching encoder_mask
        (the whole-batch rescoring program passes per-utterance masks)."""
        num_hyps = hyps.shape[0]
        if encoder_out.shape[0] != num_hyps:
            encoder_out = jnp.repeat(encoder_out, num_hyps, axis=0)
        if encoder_mask is None:
            encoder_mask = jnp.ones((num_hyps, 1, encoder_out.shape[1]),
                                    bool)
        r_hyps_lens = hyps_lens - 1
        r_hyps = hyps[:, 1:]
        r_hyps = reverse_pad_list(r_hyps, r_hyps_lens, self.ignore_id)
        r_hyps = jnp.where(r_hyps == self.ignore_id, self.eos, r_hyps)
        r_hyps = jnp.concatenate([hyps[:, 0:1], r_hyps], axis=1)
        decoder_out, r_decoder_out, _ = self.decoder(
            encoder_out, encoder_mask, hyps, hyps_lens, r_hyps,
            reverse_weight)
        decoder_out = jax.nn.log_softmax(decoder_out, axis=-1)
        if not jnp.isscalar(r_decoder_out) and getattr(
                r_decoder_out, 'ndim', 0) > 0:
            r_decoder_out = jax.nn.log_softmax(r_decoder_out, axis=-1)
        return decoder_out, r_decoder_out

    # -- beam-search step interface -------------------------------------
    def decoder_init_state(self, encoder_out, max_len: int):
        return self.decoder.init_state(encoder_out, max_len)

    def decoder_forward_step(self, tokens, step, state, memory_mask):
        return self.decoder.forward_step(tokens, step, state, memory_mask)
