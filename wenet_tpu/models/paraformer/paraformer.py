"""Paraformer: parallel NAR CN model with CIF predictor.

ref: wenet/models/paraformer/paraformer.py:36-420."""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.paraformer.cif import Cif, cif_without_hidden
from wenet_tpu.models.paraformer.layers import lfr
from wenet_tpu.models.transducer.predictor import TorchLSTM
from wenet_tpu.models.transformer.asr_model import ASRModel
from wenet_tpu.models.transformer.label_smoothing_loss import (
    label_smoothing_loss)
from wenet_tpu.utils.common import add_sos_eos, th_accuracy
from wenet_tpu.utils.mask import make_pad_mask


class Predictor(nn.Module):
    """Cif + accurate-timestamp branch. ref: paraformer.py:36-103."""
    idim: int
    l_order: int
    r_order: int
    threshold: float = 1.0
    dropout: float = 0.1
    smooth_factor: float = 1.0
    noise_threshold: float = 0.0
    tail_threshold: float = 0.45
    residual: bool = True
    cnn_groups: int = 0
    smooth_factor2: float = 0.25
    noise_threshold2: float = 0.01
    upsample_times: int = 3

    def setup(self):
        self.predictor = Cif(idim=self.idim, l_order=self.l_order,
                             r_order=self.r_order,
                             threshold=self.threshold,
                             dropout=self.dropout,
                             smooth_factor=self.smooth_factor,
                             noise_threshold=self.noise_threshold,
                             tail_threshold=self.tail_threshold,
                             residual=self.residual,
                             cnn_groups=self.cnn_groups,
                             name='predictor')
        self.tp_upsample_cnn = nn.ConvTranspose(
            self.idim, (self.upsample_times,),
            strides=(self.upsample_times,), name='tp_upsample_cnn')
        self.tp_blstm = TorchLSTM(input_size=self.idim,
                                  hidden_size=self.idim, num_layers=1,
                                  bidirectional=True, name='tp_blstm')
        self.tp_output = nn.Dense(1, name='tp_output')

    def __call__(self,
                 hidden: jax.Array,
                 target_label_length: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None,
                 max_out_len: Optional[int] = None,
                 train: bool = False):
        acoustic_embeds, token_num, alphas, cif_peak = self.predictor(
            hidden, target_label_length, mask, max_out_len, train)
        # timestamp branch (ref paraformer.py:86-103)
        up = self.tp_upsample_cnn(hidden)
        B = up.shape[0]
        state = (jnp.zeros((2, B, self.idim), up.dtype),
                 jnp.zeros((2, B, self.idim), up.dtype))
        out, _ = self.tp_blstm(up, state)
        tp_alphas = jax.nn.sigmoid(self.tp_output(out))
        tp_alphas = jax.nn.relu(tp_alphas * self.smooth_factor2 -
                                self.noise_threshold2)
        tp_mask = jnp.repeat(mask[:, 0, :], self.upsample_times,
                             axis=-1)[:, :tp_alphas.shape[1]]
        tp_alphas = tp_alphas[:, :, 0] * tp_mask
        tp_token_num = jnp.sum(tp_alphas, axis=-1)
        return (acoustic_embeds, token_num, alphas, cif_peak, tp_alphas,
                tp_token_num, tp_mask)


class Paraformer(ASRModel):
    """ref: paraformer.py:105-420."""
    predictor: Optional[nn.Module] = None
    sampler: bool = True
    sampling_ratio: float = 0.75
    add_eos: bool = True

    default_decode_method: str = 'paraformer_greedy_search'

    @property
    def sos(self) -> int:
        return self.special_tokens['<sos>']

    @property
    def eos(self) -> int:
        return self.special_tokens['<eos>']

    def setup(self):
        if self.sampler:
            self.embed = nn.Embed(self.vocab_size,
                                  self.encoder.output_size, name='embed')

    def _forward_encoder_lfr(self, speech, speech_lengths, train=False,
                             chunk_rng=None):
        features, features_lens = lfr(speech, speech_lengths)
        return self.encoder(features, features_lens, train=train,
                            chunk_rng=chunk_rng)

    def forward_encoder(self, speech, speech_lengths,
                        decoding_chunk_size: int = -1,
                        num_decoding_left_chunks: int = -1):
        return self._forward_encoder_lfr(speech, speech_lengths)

    def __call__(self,
                 feats: jax.Array,
                 feats_lengths: jax.Array,
                 target: jax.Array,
                 target_lengths: jax.Array,
                 train: bool = False,
                 chunk_rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        """ref: paraformer.py:154-219."""
        encoder_out, encoder_out_mask = self._forward_encoder_lfr(
            feats, feats_lengths, train, chunk_rng)

        ys_pad, ys_pad_lens = target, target_lengths
        if self.add_eos:
            _, ys_pad = add_sos_eos(target, self.sos, self.eos,
                                    self.ignore_id)
            ys_pad_lens = target_lengths + 1
        U = ys_pad.shape[1]
        (acoustic_embd, token_num, _, _, _, tp_token_num,
         _) = self.predictor(encoder_out, ys_pad_lens, encoder_out_mask,
                             max_out_len=U, train=train)

        if self.sampler and self.is_initializing():
            # touch the sampler embedding so init creates its params
            _ = self.embed(jnp.zeros((1, 1), jnp.int32))
        if self.sampler and train:
            sampler_rng = (chunk_rng if chunk_rng is not None else
                           self.make_rng('dropout'))
            acoustic_embd = self._sampler(encoder_out, encoder_out_mask,
                                          ys_pad, ys_pad_lens,
                                          acoustic_embd, sampler_rng)

        loss_ctc = None
        if self.ctc_weight != 0.0 and self.ctc is not None:
            enc_lens = jnp.sum(encoder_out_mask[:, 0, :], axis=-1)
            loss_ctc, _ = self.ctc(encoder_out, enc_lens, target,
                                   target_lengths, train=train)
        fl = ys_pad_lens.astype(jnp.float32)
        loss_quantity = jnp.sum(jnp.abs(token_num - fl)) / jnp.sum(fl)
        loss_quantity_tp = jnp.sum(jnp.abs(tp_token_num - fl)) / \
            jnp.sum(fl)

        decoder_out, _, _ = self.decoder(encoder_out, encoder_out_mask,
                                         acoustic_embd, ys_pad_lens,
                                         train=train)
        loss_decoder = label_smoothing_loss(
            decoder_out, ys_pad, self.vocab_size, self.ignore_id,
            self.lsm_weight, self.length_normalized_loss)
        acc_att = th_accuracy(decoder_out, ys_pad, self.ignore_id)
        loss = loss_decoder + loss_quantity + loss_quantity_tp
        if loss_ctc is not None:
            loss = loss + self.ctc_weight * loss_ctc
        return {'loss': loss, 'loss_ctc': loss_ctc,
                'loss_decoder': loss_decoder,
                'loss_quantity': loss_quantity,
                'loss_quantity_tp': loss_quantity_tp,
                'th_accuracy': acc_att}

    def _sampler(self, encoder_out, encoder_out_mask, ys_pad,
                 ys_pad_lens, pre_acoustic_embeds, rng):
        """Glancing sampler. ref: paraformer.py:238-276."""
        B, U = ys_pad.shape
        tgt_mask = ~make_pad_mask(ys_pad_lens, U)
        ys = jnp.where(tgt_mask, ys_pad, 0)
        ys_embed = self.embed(ys)
        decoder_out, _, _ = self.decoder(
            jax.lax.stop_gradient(encoder_out), encoder_out_mask,
            jax.lax.stop_gradient(pre_acoustic_embeds), ys_pad_lens)
        decoder_out = jax.lax.stop_gradient(decoder_out)
        pred = jnp.argmax(decoder_out, axis=-1)
        same_num = jnp.sum((pred == ys_pad) & tgt_mask, axis=1)
        target_num = ((ys_pad_lens - same_num).astype(jnp.float32) *
                      self.sampling_ratio).astype(jnp.int32)
        # choose target_num random valid positions per row to replace
        # with the label embedding
        scores = jax.random.uniform(rng, (B, U))
        scores = jnp.where(tgt_mask, scores, 2.0)
        rank = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
        replace = (rank < target_num[:, None]) & tgt_mask
        sematic = jnp.where(replace[:, :, None], ys_embed,
                            pre_acoustic_embeds)
        return jnp.where(tgt_mask[:, :, None], sematic, 0.0)

    # -- decode helpers -------------------------------------------------
    def forward_paraformer(self, speech, speech_lengths,
                           max_out_len: Optional[int] = None):
        """ref: paraformer.py:329-360.  Returns dict incl. log-softmaxed
        decoder_out over a static U cap."""
        encoder_out, encoder_out_mask = self._forward_encoder_lfr(
            speech, speech_lengths)
        cap = max_out_len or encoder_out.shape[1]
        (acoustic_embed, token_num, alphas, cif_peak, tp_alphas, _,
         tp_mask) = self.predictor(encoder_out, None, encoder_out_mask,
                                   max_out_len=cap)
        token_num = jnp.floor(token_num).astype(jnp.int32)
        decoder_out, _, _ = self.decoder(encoder_out, encoder_out_mask,
                                         acoustic_embed, token_num)
        decoder_out = jax.nn.log_softmax(decoder_out, axis=-1)
        return {
            'encoder_out': encoder_out,
            'encoder_out_mask': encoder_out_mask,
            'decoder_out': decoder_out,
            'tp_alphas': tp_alphas,
            'decoder_out_lens': token_num,
            'tp_mask': tp_mask,
        }

    def forward_cif_peaks(self, alphas, token_nums):
        """ref: paraformer.py:320-327."""
        cif2 = jnp.sum(alphas, axis=-1)
        scale = alphas / (cif2 / jnp.maximum(
            token_nums.astype(alphas.dtype), 1e-6))[:, None]
        return cif_without_hidden(
            scale, self.predictor.predictor.threshold - 1e-4)
