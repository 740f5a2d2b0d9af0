"""SenseVoice-small (Alibaba): SANM encoder + tp blocks + context tokens.

ref: wenet/models/sensevoice/sensevoice_small_model.py:21-330."""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.paraformer.layers import (_AliParaformerEncoderLayer,
                                                SanmEncoder, lfr)
from wenet_tpu.models.transformer.asr_model import ASRModel
from wenet_tpu.models.transformer.cmvn import GlobalCMVN
from wenet_tpu.models.transformer.label_smoothing_loss import (
    label_smoothing_loss)
from wenet_tpu.utils.mask import make_pad_mask

LID_DICT = {'auto': 0, 'zh': 3, 'en': 4, 'yue': 7, 'ja': 11, 'ko': 12,
            'nospeech': 13}
TEXTNORM_DICT = {'withitn': 14, 'woitn': 15}
EMO_DICT = {'unk': 25009, 'happy': 25001, 'sad': 25002, 'angry': 25003,
            'neutral': 25004}


class SanmEncoderWithTp(SanmEncoder):
    """SANM + timestamp-prediction blocks. ref: :21-141."""
    tp_blocks: int = 5

    def setup(self):
        super().setup()
        self.tp_encoders = [
            _AliParaformerEncoderLayer(
                size=self.output_size, in_size=self.output_size,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                kernel_size=self.kernel_size,
                sanm_shfit=self.sanm_shfit,
                normalize_before=self.normalize_before)
            for _ in range(self.tp_blocks)
        ]
        self.tp_norm = nn.LayerNorm(epsilon=1e-5, name='tp_norm')

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, train: bool = False,
                 chunk_rng=None):
        xs, masks = super().__call__(xs, xs_lens, decoding_chunk_size,
                                     num_decoding_left_chunks, train,
                                     chunk_rng)
        for layer in self.tp_encoders:
            xs = layer(xs, masks, masks, train=train)
        xs = self.tp_norm(xs)
        return xs, masks


class SenseVoiceSmall(ASRModel):
    """ref: :143-330."""
    default_decode_method: str = 'ctc_greedy_search'

    @property
    def sos(self) -> int:
        return self.special_tokens['<s>']

    @property
    def eos(self) -> int:
        return self.special_tokens['</s>']

    def setup(self):
        self.embed = nn.Embed(
            7 + len(LID_DICT) + len(TEXTNORM_DICT),
            self.encoder.input_size, name='embed')
        self.global_cmvn = GlobalCMVN(self.encoder.input_size,
                                      name='global_cmvn')

    def _prepend_context(self, speech, speech_lengths, lid_ids, itn_ids):
        """[lid, event, emo, itn] query embeds. ref: :196-230."""
        B = speech.shape[0]
        event_emo = jnp.tile(jnp.asarray([[1, 2]], jnp.int32), (B, 1))
        context = jnp.concatenate(
            [lid_ids[:, None], event_emo, itn_ids[:, None]], axis=1)
        context_embed = self.embed(context)  # (B, 4, D)
        speech = jnp.concatenate([context_embed, speech], axis=1)
        return speech, speech_lengths + 4

    def _frontend(self, feats, feats_lengths, lid_ids=None, itn_ids=None):
        speech, speech_lengths = lfr(feats, feats_lengths)
        speech = self.global_cmvn(speech)
        B = speech.shape[0]
        if lid_ids is None:
            lid_ids = jnp.zeros((B,), jnp.int32)
        if itn_ids is None:
            itn_ids = jnp.full((B,), TEXTNORM_DICT['woitn'], jnp.int32)
        return self._prepend_context(speech, speech_lengths, lid_ids,
                                     itn_ids)

    def __call__(self,
                 feats: jax.Array,
                 feats_lengths: jax.Array,
                 target: jax.Array,
                 target_lengths: jax.Array,
                 lid_ids: Optional[jax.Array] = None,
                 itn_ids: Optional[jax.Array] = None,
                 train: bool = False,
                 chunk_rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        """target layout: [lid, event, emo, itn, text...] (ref :196-248)."""
        speech, speech_lengths = self._frontend(feats, feats_lengths,
                                                lid_ids, itn_ids)
        encoder_out, encoder_mask = self.encoder(speech, speech_lengths,
                                                 train=train,
                                                 chunk_rng=chunk_rng)
        encoder_out_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1)
        # ctc over speech frames (context positions excluded)
        loss_ctc_speech, _ = self.ctc(encoder_out[:, 4:, :],
                                      encoder_out_lens - 4,
                                      target[:, 4:], target_lengths - 4,
                                      train=train)
        context_logits = self.ctc.logits(encoder_out[:, :4, :])
        loss_context = label_smoothing_loss(
            context_logits, target[:, :4], self.vocab_size,
            self.ignore_id, self.lsm_weight, self.length_normalized_loss)
        loss_ctc = loss_ctc_speech + loss_context
        loss_att, acc_att = None, None
        if self.ctc_weight != 1.0 and self.decoder is not None:
            loss_att, acc_att = self._calc_att_loss(
                encoder_out, encoder_mask, target, target_lengths,
                train=train)
        loss = loss_ctc
        if loss_att is not None:
            loss = (self.ctc_weight * loss_ctc +
                    (1 - self.ctc_weight) * loss_att)
        return {'loss': loss, 'loss_att': loss_att, 'loss_ctc': loss_ctc,
                'loss_ctc_speech': loss_ctc_speech,
                'loss_context': loss_context, 'th_accuracy': acc_att}

    def forward_encoder(self, speech, speech_lengths,
                        decoding_chunk_size: int = -1,
                        num_decoding_left_chunks: int = -1,
                        lid: str = 'auto', itn: str = 'woitn'):
        """Decode-time frontend + encoder. ref: :249-330."""
        B = speech.shape[0]
        lid_ids = jnp.full((B,), LID_DICT.get(lid, 0), jnp.int32)
        itn_ids = jnp.full((B,), TEXTNORM_DICT.get(itn, 15), jnp.int32)
        speech, speech_lengths = self._frontend(speech, speech_lengths,
                                                lid_ids, itn_ids)
        return self.encoder(speech, speech_lengths)
