"""W2V-BERT: contrastive (first blocks) + MLM (remaining blocks).

ref: wenet/models/ssl/w2vbert/w2vbert_model.py:17-260."""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.ssl.mask import (compute_mask_indices,
                                       sample_negative_indices)
from wenet_tpu.models.ssl.wav2vec2_model import (
    Wav2vecGumbelVectorQuantizer, compute_contrastive_loss)
from wenet_tpu.utils.mask import make_pad_mask


class W2VBERTModel(nn.Module):
    encoder: nn.Module
    embedding_dim: int = 256
    num_embeddings: int = 320
    num_codebooks: int = 1
    mask_prob: float = 0.065
    mask_length: int = 10
    min_masks: int = 2
    num_negatives: int = 100
    features_regularization_weight: float = 0.01
    max_gumbel_temperature: float = 2.0
    min_gumbel_temperature: float = 0.1
    gumbel_temperature_decay: float = 0.999995
    contrastive_logits_temperature: float = 0.1
    diversity_weight: float = 0.0
    bias: bool = True
    contrastive_blocks: int = 6
    masked_blocks: int = 6
    contrastive_weight: float = 1.0
    mlm_weight: float = 1.0
    warmup_steps: int = 25000

    def setup(self):
        assert (self.contrastive_blocks > 0 and self.masked_blocks > 0
                and self.contrastive_blocks + self.masked_blocks ==
                self.encoder.num_blocks)
        odim = self.encoder.output_size
        self.quantizer = Wav2vecGumbelVectorQuantizer(
            features_dim=odim, num_codebooks=self.num_codebooks,
            num_embeddings=self.num_embeddings,
            embedding_dim=self.embedding_dim, hard=False,
            name='quantizer')
        # mlm head: predict code ids from final output
        self.encoder_top_n_out = self.param(
            'encoder_top_n_out', nn.initializers.truncated_normal(0.02),
            (self.num_codebooks, odim, self.num_embeddings))
        if self.bias:
            self.encoder_top_n_out_bias = self.param(
                'encoder_top_n_out_bias', nn.initializers.zeros,
                (self.num_codebooks, self.num_embeddings))

    def __call__(self,
                 feats: jax.Array,
                 feats_lengths: jax.Array,
                 target: Optional[jax.Array] = None,
                 target_lengths: Optional[jax.Array] = None,
                 steps: int = 0,
                 train: bool = False,
                 chunk_rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        del target, target_lengths
        rng = (chunk_rng if chunk_rng is not None else
               jax.random.PRNGKey(0))
        r_mask, r_gumbel, r_neg, r_emb = jax.random.split(rng, 4)

        T = feats.shape[1]
        masks = ~make_pad_mask(feats_lengths, T)[:, None, :]
        xs = feats
        if self.encoder.use_cmvn:
            xs = self.encoder.global_cmvn(xs)
        xs, pos_emb, masks = self.encoder.embed(xs, masks,
                                                deterministic=not train)
        unmasked_xs = xs
        B, Tn, _ = xs.shape
        span_mask = compute_mask_indices(r_mask, ~masks[:, 0, :],
                                         self.mask_prob,
                                         self.mask_length,
                                         self.min_masks)
        # W2V-BERT replaces masked frames by random noise (ref :101-104)
        noise = jax.random.normal(r_emb, xs.shape, xs.dtype) * 0.1
        masked_xs = jnp.where(span_mask[:, :, None], noise, xs)

        x = masked_xs
        for layer in self.encoder.encoders[:self.contrastive_blocks]:
            x, _, _, _ = layer(x, masks, pos_emb, masks, train=train)
        contrastive_out = x
        for layer in self.encoder.encoders[self.contrastive_blocks:]:
            x, _, _, _ = layer(x, masks, pos_emb, masks, train=train)
        mlm_out = x

        gumbel_temp = jnp.maximum(
            self.max_gumbel_temperature *
            self.gumbel_temperature_decay**steps,
            self.min_gumbel_temperature)
        quantized, perplexity, target_ids = self.quantizer(
            unmasked_xs, masks[:, 0, :], gumbel_temp, rng=r_gumbel)

        neg_idx = sample_negative_indices(r_neg, B, Tn,
                                          self.num_negatives, span_mask)
        loss_contrastive = compute_contrastive_loss(
            quantized, contrastive_out, neg_idx, span_mask,
            self.contrastive_logits_temperature, self.num_negatives)
        sample_size = jnp.maximum(jnp.sum(span_mask), 1)
        loss_contrastive = loss_contrastive / sample_size

        # MLM loss on masked positions
        logits = jnp.einsum('btd,gdv->bgtv', mlm_out,
                            self.encoder_top_n_out)
        if self.bias:
            logits = logits + self.encoder_top_n_out_bias[None, :,
                                                          None, :]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = jnp.swapaxes(target_ids, 1, 2)  # (B, G, T)
        true_lp = jnp.take_along_axis(logp, tgt[..., None],
                                      axis=-1)[..., 0]
        m = span_mask[:, None, :] * masks[:, 0, None, :]
        # ref w2vbert_model.py:284: normalized by mask.sum() *
        # num_codebooks (m already spans the G axis, so divide by G)
        loss_mlm = -jnp.sum(true_lp * m) / jnp.maximum(
            jnp.sum(m) * 1.0, 1.0) / self.num_codebooks

        # mlm weight warms from 0.1 to mlm_weight over warmup_steps
        # (ref :241-242)
        s = jnp.asarray(steps, jnp.float32)
        mlm_w = jnp.where(
            s >= self.warmup_steps, self.mlm_weight,
            0.1 + 0.9 * s / max(self.warmup_steps, 1))
        loss = (self.contrastive_weight * loss_contrastive +
                mlm_w * loss_mlm)
        loss_diversity = None
        if self.diversity_weight != 0.0:
            loss_diversity = (
                self.num_codebooks * self.num_embeddings - perplexity) / \
                (self.num_embeddings * self.num_codebooks)
            loss = loss + self.diversity_weight * loss_diversity
        features_pen = jnp.mean(xs**2)
        if self.features_regularization_weight != 0.0:
            loss = loss + self.features_regularization_weight * \
                features_pen
        ids_corr = jnp.argmax(logits, axis=-1) == tgt
        # ref :229: num_codes = masked.sum() * num_codebooks
        acc = jnp.sum(ids_corr * m) / jnp.maximum(
            jnp.sum(m) * self.num_codebooks, 1)
        return {'loss': loss, 'loss_contrastive': loss_contrastive,
                'loss_mlm': loss_mlm, 'loss_diversity': loss_diversity,
                'code_ppl': perplexity, 'features_l2': features_pen,
                'th_accuracy': acc}


SSL_MODEL_CLASSES = {}


def _register():
    from wenet_tpu.models.ssl.bestrq_model import BestRQModel
    from wenet_tpu.models.ssl.wav2vec2_model import Wav2vec2Model
    SSL_MODEL_CLASSES.update({
        'bestrq_model': BestRQModel,
        'wav2vec_model': Wav2vec2Model,
        'w2vbert_model': W2VBERTModel,
    })


_register()
