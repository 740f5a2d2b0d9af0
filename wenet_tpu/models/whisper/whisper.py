"""Whisper as an ASRModel. ref: wenet/models/whisper/whisper.py:28-97.

AR-only decoding with the special-token prompt [sot, lang, task,
notimestamps]; the prompt is built *inside* the traced loss from integer
lang/task ids so the whole train step stays one XLA program (the
reference assembles ragged python lists per batch,
ref wenet/utils/common.py:159-239).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.transformer.asr_model import ASRModel
from wenet_tpu.models.transformer.label_smoothing_loss import (
    label_smoothing_loss)
from wenet_tpu.models.whisper.tokens import WHISPER_LANGS
from wenet_tpu.utils.common import th_accuracy

TASK_IDS = {'transcribe': 0, 'translate': 1, 'vad': 2}


def lang_id_array(langs, default='en'):
    """host helper: ['zh', 'en', ...] -> (B,) indices into WHISPER_LANGS."""
    import numpy as np
    idx = []
    for l in langs:
        idx.append(WHISPER_LANGS.index(l)
                   if l in WHISPER_LANGS else WHISPER_LANGS.index(default))
    return np.asarray(idx, np.int32)


def task_id_array(tasks):
    import numpy as np
    return np.asarray([TASK_IDS.get(t, 0) for t in tasks], np.int32)


class Whisper(ASRModel):
    # Whisper only supports autoregressive decoding (ref whisper.py:31)
    default_decode_method: str = 'attention'

    @property
    def sos(self) -> int:
        return self.special_tokens['sot']

    @property
    def eos(self) -> int:
        return self.special_tokens['eot']

    @property
    def is_multilingual(self) -> bool:
        return self.vocab_size >= 51865

    @property
    def num_languages(self) -> int:
        return self.vocab_size - 51765 - int(self.is_multilingual)

    def _build_prefix(self, B: int, lang_ids: Optional[jax.Array],
                      task_ids: Optional[jax.Array]) -> jax.Array:
        """(B, 4): [sot, lang, task, notimestamps]."""
        st = self.special_tokens
        if lang_ids is None:
            lang_ids = jnp.full((B,), WHISPER_LANGS.index('zh'),
                                jnp.int32)
        if task_ids is None:
            task_ids = jnp.zeros((B,), jnp.int32)
        sot = jnp.full((B,), st['sot'], jnp.int32)
        lang_tok = st['sot'] + 1 + lang_ids
        task_tok = jnp.select(
            [task_ids == 0, task_ids == 1, task_ids == 2],
            [jnp.full((B,), st['transcribe'], jnp.int32),
             jnp.full((B,), st['translate'], jnp.int32),
             jnp.full((B,), st['no_speech'], jnp.int32)])
        last = jnp.where(task_ids == 2, st['no_speech'],
                         st['no_timestamps']).astype(jnp.int32)
        return jnp.stack([sot, lang_tok, task_tok, last], axis=1)

    def _add_whisper_tokens(self, ys_pad, prefix):
        """Vectorized add_whisper_tokens (ref common.py:159-239).

        ys_in  = [prefix..., y..., eot-pad]
        ys_out = [prefix[1:]..., y..., eot, ignore-pad]
        """
        B, L = ys_pad.shape
        P = prefix.shape[1]
        eot = self.eos
        lens = jnp.sum(ys_pad != self.ignore_id, axis=1)
        ys_clean = jnp.where(ys_pad == self.ignore_id, eot, ys_pad)
        ys_in = jnp.concatenate([prefix, ys_clean], axis=1)
        j = jnp.arange(L + 1)[None, :]
        ys_ext = jnp.concatenate(
            [ys_pad, jnp.full((B, 1), self.ignore_id, ys_pad.dtype)],
            axis=1)
        tail = jnp.where(
            j < lens[:, None], ys_ext,
            jnp.where(j == lens[:, None], eot, self.ignore_id))
        ys_out = jnp.concatenate([prefix[:, 1:], tail], axis=1).astype(
            ys_pad.dtype)
        return ys_in, ys_out, lens + P

    def _calc_att_loss(self, encoder_out, encoder_mask, ys_pad,
                       ys_pad_lens, train: bool = False, infos=None,
                       lang_ids=None, task_ids=None):
        """ref: whisper.py:66-97."""
        B = ys_pad.shape[0]
        prefix = self._build_prefix(B, lang_ids, task_ids)
        ys_in_pad, ys_out_pad, ys_in_lens = self._add_whisper_tokens(
            ys_pad, prefix)
        decoder_out, _, _ = self.decoder(encoder_out, encoder_mask,
                                         ys_in_pad, ys_in_lens,
                                         train=train)
        loss_att = label_smoothing_loss(decoder_out, ys_out_pad,
                                        self.vocab_size, self.ignore_id,
                                        self.lsm_weight,
                                        self.length_normalized_loss)
        acc_att = th_accuracy(decoder_out, ys_out_pad, self.ignore_id)
        return loss_att, acc_att

    def __call__(self,
                 feats: jax.Array,
                 feats_lengths: jax.Array,
                 target: jax.Array,
                 target_lengths: jax.Array,
                 lang_ids: Optional[jax.Array] = None,
                 task_ids: Optional[jax.Array] = None,
                 train: bool = False,
                 chunk_rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        encoder_out, encoder_mask = self.encoder(feats, feats_lengths,
                                                 train=train,
                                                 chunk_rng=chunk_rng)
        encoder_out_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1)
        loss_ctc = None
        if self.ctc is not None and self.is_initializing() and \
                self.ctc_weight == 0.0:
            # touch ctc params so AR-only whisper still serves
            # ctc_activation (and consumes ctc.* checkpoint keys)
            _ = self.ctc.log_softmax(encoder_out[:, :1])
        if self.ctc_weight != 0.0 and self.ctc is not None:
            loss_ctc, _ = self.ctc(encoder_out, encoder_out_lens, target,
                                   target_lengths, train=train)
        loss_att, acc_att = None, None
        if self.ctc_weight != 1.0:
            loss_att, acc_att = self._calc_att_loss(
                encoder_out, encoder_mask, target, target_lengths,
                train=train, lang_ids=lang_ids, task_ids=task_ids)
        if loss_ctc is None:
            loss = loss_att
        elif loss_att is None:
            loss = loss_ctc
        else:
            loss = (self.ctc_weight * loss_ctc +
                    (1 - self.ctc_weight) * loss_att)
        return {'loss': loss, 'loss_att': loss_att, 'loss_ctc': loss_ctc,
                'th_accuracy': acc_att}
