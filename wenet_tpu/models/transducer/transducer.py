"""Transducer model (RNN-T + optional CTC/attention aux losses).

ref: wenet/models/transducer/transducer.py:20-572.  The greedy search
runs as a fixed-shape lax.scan with an inner no-blank budget (the
reference is a python while loop over frames, search/greedy_search.py),
batched over utterances.
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.transformer.asr_model import ASRModel
from wenet_tpu.ops.rnnt_loss import rnnt_loss_logits
from wenet_tpu.utils.common import IGNORE_ID, add_blank


class Transducer(ASRModel):
    """Fields beyond ASRModel: predictor / joint / weights."""
    predictor: Optional[nn.Module] = None
    joint: Optional[nn.Module] = None
    blank: int = 0
    transducer_weight: float = 1.0
    attention_weight: float = 0.0

    default_decode_method: str = 'rnnt_greedy_search'

    @property
    def attention_decoder_weight(self) -> float:
        return 1 - self.transducer_weight - self.ctc_weight

    def __call__(self,
                 feats: jax.Array,
                 feats_lengths: jax.Array,
                 target: jax.Array,
                 target_lengths: jax.Array,
                 train: bool = False,
                 chunk_rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        """ref: transducer.py:96-183."""
        encoder_out, encoder_mask = self.encoder(feats, feats_lengths,
                                                 train=train,
                                                 chunk_rng=chunk_rng)
        encoder_out_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1)

        loss_rnnt = self._compute_rnnt_loss(encoder_out,
                                            encoder_out_lens, target,
                                            target_lengths, train)
        loss = self.transducer_weight * loss_rnnt
        loss_att = None
        if self.attention_decoder_weight != 0.0 and \
                self.decoder is not None:
            loss_att, acc_att = self._calc_att_loss(
                encoder_out, encoder_mask, target, target_lengths,
                train=train)
            loss = loss + self.attention_decoder_weight * loss_att
        else:
            acc_att = None
        loss_ctc = None
        if self.ctc_weight != 0.0 and self.ctc is not None:
            loss_ctc, _ = self.ctc(encoder_out, encoder_out_lens, target,
                                   target_lengths, train=train)
            loss = loss + self.ctc_weight * loss_ctc
        return {'loss': loss, 'loss_att': loss_att, 'loss_ctc': loss_ctc,
                'loss_rnnt': loss_rnnt, 'th_accuracy': acc_att}

    def _compute_rnnt_loss(self, encoder_out, encoder_out_lens, target,
                           target_lengths, train: bool):
        """ref: transducer.py:139-162."""
        # labels padded with blank for the predictor input
        ys_in = add_blank(target, self.blank, self.ignore_id)  # (B, U+1)
        pred_out = self.predictor(ys_in, train=train)  # (B, U+1, P)
        logits = self.joint(encoder_out, pred_out, train=train)
        labels = jnp.where(target == self.ignore_id, self.blank,
                           target).astype(jnp.int32)
        return rnnt_loss_logits(logits, labels,
                                encoder_out_lens.astype(jnp.int32),
                                target_lengths.astype(jnp.int32),
                                blank=self.blank, reduction='mean')

    # ------------------------------------------------------------------
    def greedy_search(self, encoder_out: jax.Array,
                      encoder_out_lens: jax.Array,
                      n_steps: int = 64) -> jax.Array:
        """Batched scan greedy decode -> (B, T*?) token matrix padded
        with blank.  ref: search/greedy_search.py:6-54.

        Each scan step consumes either one encoder frame (blank emitted
        or budget exhausted) or emits one token; total steps bounded by
        T * 2 for budget sanity (budget counts per-frame non-blanks)."""
        B, T, _ = encoder_out.shape
        max_steps = T * 2

        pred_state = self.predictor.init_state(B, encoder_out.dtype)
        padding = jnp.zeros((B, 1), encoder_out.dtype)
        first_in = jnp.full((B, 1), self.blank, jnp.int32)
        pred_out, pred_state = self.predictor.forward_step(
            first_in, padding, pred_state)

        tokens0 = jnp.full((B, max_steps), self.blank, jnp.int32)

        def step(carry, _):
            t, noblk, n_emit, pred_out, state, tokens = carry
            frame = jnp.take_along_axis(
                encoder_out, jnp.minimum(t, T - 1)[:, None, None],
                axis=1)  # (B, 1, E)
            joint = self.joint(frame, pred_out)  # (B, 1, 1, V)
            best = jnp.argmax(joint[:, 0, 0, :], axis=-1).astype(
                jnp.int32)  # (B,)
            active = t < encoder_out_lens
            emit = (best != self.blank) & (noblk < n_steps) & active
            # write emitted tokens
            tokens = tokens.at[jnp.arange(B), n_emit].set(
                jnp.where(emit, best, self.blank))
            n_emit = n_emit + emit.astype(jnp.int32)
            # update predictor for emitting rows
            new_pred_out, new_state = self.predictor.forward_step(
                best[:, None], padding, state)
            sel = emit[:, None, None]
            pred_out = jnp.where(sel, new_pred_out, pred_out)
            state = self.predictor.select_state(new_state, state, emit)
            # advance frame when not emitting
            adv = (~emit) & active
            t = t + adv.astype(jnp.int32)
            noblk = jnp.where(emit, noblk + 1, 0)
            return (t, noblk, n_emit, pred_out, state, tokens), None

        init = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                jnp.zeros((B,), jnp.int32), pred_out, pred_state,
                tokens0)
        (t, _, n_emit, _, _, tokens), _ = jax.lax.scan(
            step, init, None, length=max_steps)
        return tokens, n_emit
