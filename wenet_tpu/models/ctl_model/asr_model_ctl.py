"""CTL: contrastive streaming/non-streaming dual-mode training.

ref: wenet/models/ctl_model/asr_model_ctl.py:30-260, encoder.py:27-173.
The Dual*Encoder classes of the reference exist only to add a
full-context forward; here the same encoder module is called with
decoding_chunk_size=-1 (full) and 0 (dynamic chunk).
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from wenet_tpu.models.transformer.asr_model import ASRModel


class CTLModel(ASRModel):
    logit_temp: float = 0.1
    n_negatives: int = 0
    ctl_weight: float = 1.0

    def _joint_loss(self, encoder_out, encoder_mask, text, text_lengths,
                    train):
        encoder_out_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1)
        loss_att = None
        if self.ctc_weight != 1.0:
            loss_att, _ = self._calc_att_loss(encoder_out, encoder_mask,
                                              text, text_lengths,
                                              train=train)
        loss_ctc = None
        if self.ctc_weight != 0.0 and self.ctc is not None:
            loss_ctc, _ = self.ctc(encoder_out, encoder_out_lens, text,
                                   text_lengths, train=train)
        if loss_ctc is None:
            return loss_att
        if loss_att is None:
            return loss_ctc
        return self.ctc_weight * loss_ctc + \
            (1 - self.ctc_weight) * loss_att

    def __call__(self,
                 feats: jax.Array,
                 feats_lengths: jax.Array,
                 target: jax.Array,
                 target_lengths: jax.Array,
                 train: bool = False,
                 chunk_rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        rng = (chunk_rng if chunk_rng is not None else
               jax.random.PRNGKey(0))
        r_chunk, r_neg = jax.random.split(rng)
        # full-context pass (ref Dual*Encoder.forward_full,
        # ctl_model/encoder.py:77-108 — bypasses static/dynamic chunking)
        enc_full, mask_full = self.encoder(feats, feats_lengths,
                                           train=train,
                                           full_context=True)
        loss_full = self._joint_loss(enc_full, mask_full, target,
                                     target_lengths, train)
        # chunk-masked pass
        enc_chunk, mask_chunk = self.encoder(feats, feats_lengths,
                                             train=train,
                                             chunk_rng=r_chunk)
        loss_chunk = self._joint_loss(enc_chunk, mask_chunk, target,
                                      target_lengths, train)

        ctl_loss = jnp.asarray(0.0)
        if self.ctl_weight > 0 and self.n_negatives > 0:
            # only INDEX SAMPLING is no-grad in the reference
            # (torch.no_grad around randint, asr_model_ctl.py:212);
            # targets/negatives keep their gradient path into the
            # full-context encoder, and negatives are drawn within
            # each utterance's VALID length
            lens = jnp.sum(mask_chunk[:, 0, :], axis=-1)
            negs = self._sample_negatives(enc_full, r_neg, lens)
            ctl_loss = self._ctl_loss(enc_chunk, enc_full, negs,
                                      mask_chunk)
        loss = loss_full + loss_chunk + self.ctl_weight * ctl_loss
        return {'loss': loss, 'loss_full': loss_full,
                'loss_chunk': loss_chunk, 'loss_ctl': ctl_loss}

    def _sample_negatives(self, y, rng, lengths=None):
        """ref: asr_model_ctl.py:205-240 — negatives drawn uniformly
        within each utterance's valid length (speech_lengths), never
        from padding frames."""
        B, T, F = y.shape
        r = jax.random.uniform(rng, (B, T * self.n_negatives))
        if lengths is None:
            high = jnp.full((B, 1), T - 1, jnp.float32)
        else:
            high = jnp.maximum(lengths - 1, 1).astype(
                jnp.float32)[:, None]
        idx = (r * high).astype(jnp.int32)
        pos = jnp.repeat(jnp.arange(T), self.n_negatives)[None, :]
        idx = jnp.where(idx >= pos, idx + 1, idx)
        idx = jnp.clip(idx, 0, T - 1)
        idx = jax.lax.stop_gradient(idx)
        flat = y.reshape(-1, F)
        idx = idx + (jnp.arange(B) * T)[:, None]
        negs = flat[idx.reshape(-1)].reshape(B, T, self.n_negatives, F)
        return jnp.transpose(negs, (2, 0, 1, 3))  # (N, B, T, F)

    def _ctl_loss(self, x, y, negatives, mask):
        """ref: asr_model_ctl.py:242-260 (compute_preds + CE to class 0)."""
        neg_is_pos = jnp.all(y[None] == negatives, -1)  # (N, B, T)
        targets = jnp.concatenate([y[None], negatives], 0)

        def cos(a, b):
            num = jnp.sum(a * b, -1)
            return num / (jnp.linalg.norm(a, axis=-1) *
                          jnp.linalg.norm(b, axis=-1) + 1e-8)

        logits = cos(x[None].astype(jnp.float32),
                     targets.astype(jnp.float32)) / self.logit_temp
        pad = jnp.zeros((1,) + neg_is_pos.shape[1:], bool)
        logits = jnp.where(jnp.concatenate([pad, neg_is_pos], 0), -1e9,
                           logits)
        logp = jax.nn.log_softmax(logits, axis=0)
        per = -logp[0]  # (B, T)
        m = mask[:, 0, :].astype(per.dtype)
        return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1)
