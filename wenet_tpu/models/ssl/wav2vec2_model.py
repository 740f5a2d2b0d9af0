"""wav2vec 2.0 contrastive pretraining + gumbel quantizer.

ref: wenet/models/ssl/wav2vec2/{wav2vec2_model.py:20-330, quantizer.py:26-130}."""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.ssl.mask import (compute_mask_indices,
                                       sample_negative_indices)
from wenet_tpu.utils.mask import make_pad_mask


class Wav2vecGumbelVectorQuantizer(nn.Module):
    """ref: quantizer.py:26-130."""
    features_dim: int = 256
    num_codebooks: int = 2
    num_embeddings: int = 8192
    embedding_dim: int = 16
    hard: bool = False

    def setup(self):
        assert self.embedding_dim % self.num_codebooks == 0
        self.embeddings = self.param(
            'embeddings', nn.initializers.uniform(1.0),
            (1, self.num_codebooks * self.num_embeddings,
             self.embedding_dim // self.num_codebooks))
        self.weight_proj = nn.Dense(
            self.num_codebooks * self.num_embeddings, name='weight_proj')

    @staticmethod
    def _perplexity(probs, mask=None):
        if mask is not None:
            m = jnp.broadcast_to(mask.reshape(-1)[:, None, None],
                                 probs.shape)
            probs = jnp.where(m, probs, 0.0)
            marginal = jnp.sum(probs, 0) / jnp.maximum(jnp.sum(mask), 1)
        else:
            marginal = jnp.mean(probs, 0)
        return jnp.sum(
            jnp.exp(-jnp.sum(marginal * jnp.log(marginal + 1e-7), -1)))

    def __call__(self, input, input_mask, temperature: float = 1.0,
                 rng: Optional[jax.Array] = None):
        b, t, _ = input.shape
        hidden = self.weight_proj(input)
        hidden = hidden.reshape(b * t * self.num_codebooks, -1)
        if not self.hard:
            assert rng is not None
            g = -jnp.log(-jnp.log(
                jax.random.uniform(rng, hidden.shape,
                                   minval=1e-20, maxval=1.0)))
            codevector_probs = jax.nn.softmax(
                (hidden + g) / temperature, axis=-1)
            soft_dist = jax.nn.softmax(
                hidden.reshape(b * t, self.num_codebooks, -1), axis=-1)
            perplexity = self._perplexity(soft_dist, input_mask)
        else:
            idx = jnp.argmax(hidden, -1)
            codevector_probs = jax.nn.one_hot(idx, hidden.shape[-1])
            perplexity = self._perplexity(
                codevector_probs.reshape(b * t, self.num_codebooks, -1),
                input_mask)
        targets_idx = jnp.argmax(
            codevector_probs.reshape(b * t, self.num_codebooks, -1),
            -1).reshape(b, t, -1)
        codevector_probs = codevector_probs.reshape(b * t, -1)
        vecs = codevector_probs[:, :, None] * self.embeddings
        vecs = vecs.reshape(b * t, self.num_codebooks,
                            self.num_embeddings, -1)
        codevectors = jnp.sum(vecs, -2).reshape(b, t, -1)
        return codevectors, perplexity, targets_idx


def compute_contrastive_loss(quantized, features, negative_indices,
                             mask_time_indices, logits_temp,
                             num_negatives):
    """ref: wav2vec2_model.py:59-104."""
    B, T, H = quantized.shape
    flat = quantized.reshape(-1, H)
    negs = flat[negative_indices.reshape(-1)].reshape(
        B, T, num_negatives, H).transpose(2, 0, 1, 3)
    targets = jnp.concatenate([quantized[None], negs], 0)  # (1+N, B, T, H)

    def cos(a, b):
        num = jnp.sum(a * b, -1)
        return num / (jnp.linalg.norm(a, axis=-1) *
                      jnp.linalg.norm(b, axis=-1) + 1e-8)

    logits = cos(features[None], targets) / logits_temp  # (1+N, B, T)
    neg_is_pos = jnp.all(quantized[None] == negs, -1)  # (N, B, T)
    neg_is_pos = jnp.concatenate(
        [jnp.zeros((1, B, T), bool), neg_is_pos], 0)
    logits = jnp.where(neg_is_pos, -1e9, logits)
    # positive is class 0
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=0)
    per = -logp[0]  # (B, T)
    return jnp.sum(per * mask_time_indices)


class Wav2vec2Model(nn.Module):
    """ref: wav2vec2_model.py:106-330."""
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

    def setup(self):
        self.quantizer = Wav2vecGumbelVectorQuantizer(
            features_dim=self.encoder.output_size,
            num_codebooks=self.num_codebooks,
            num_embeddings=self.num_embeddings,
            embedding_dim=self.embedding_dim, hard=False,
            name='quantizer')
        self.mask_emb = self.param('mask_emb',
                                   nn.initializers.uniform(1.0),
                                   (self.encoder.output_size,))

    def _forward_subsampling(self, xs, xs_lens, train):
        T = xs.shape[1]
        masks = ~make_pad_mask(xs_lens, T)[:, None, :]
        if self.encoder.use_cmvn:
            xs = self.encoder.global_cmvn(xs)
        xs, pos_emb, masks = self.encoder.embed(xs, masks,
                                                deterministic=not train)
        return xs, pos_emb, masks

    def _forward_blocks(self, xs, att_mask, pos_emb, mask_pad, train,
                        num_blocks=None):
        layers = self.encoder.encoders
        if num_blocks is not None:
            layers = layers[:num_blocks]
        for layer in layers:
            xs, _, _, _ = layer(xs, att_mask, pos_emb, mask_pad,
                                train=train)
        return xs

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
        r_mask, r_gumbel, r_neg = jax.random.split(rng, 3)

        xs, pos_emb, masks = self._forward_subsampling(
            feats, feats_lengths, train)
        unmasked_xs = xs
        B, T, _ = xs.shape
        span_mask = compute_mask_indices(r_mask, ~masks[:, 0, :],
                                         self.mask_prob,
                                         self.mask_length,
                                         self.min_masks)
        masked_xs = jnp.where(span_mask[:, :, None],
                              self.mask_emb[None, None, :], xs)
        out = self._forward_blocks(masked_xs, masks, pos_emb, masks,
                                   train)

        gumbel_temp = jnp.maximum(
            self.max_gumbel_temperature *
            self.gumbel_temperature_decay**steps,
            self.min_gumbel_temperature)
        quantized, perplexity, _ = self.quantizer(
            unmasked_xs, masks[:, 0, :], gumbel_temp, rng=r_gumbel)

        neg_idx = sample_negative_indices(r_neg, B, T,
                                          self.num_negatives, span_mask)
        loss_contrastive = compute_contrastive_loss(
            quantized, out, neg_idx, span_mask,
            self.contrastive_logits_temperature, self.num_negatives)
        loss = loss_contrastive
        sample_size = jnp.maximum(jnp.sum(span_mask), 1)
        loss_diversity = None
        if self.diversity_weight != 0.0:
            loss_diversity = (
                self.num_codebooks * self.num_embeddings - perplexity) / \
                (self.num_embeddings * self.num_codebooks)
            loss = loss + self.diversity_weight * loss_diversity * \
                sample_size
        loss = loss / sample_size
        features_pen = jnp.mean(xs**2)
        if self.features_regularization_weight != 0.0:
            loss = loss + self.features_regularization_weight * \
                features_pen
        return {'loss': loss,
                'loss_contrastive': loss_contrastive / sample_size,
                'loss_diversity': loss_diversity,
                'code_ppl': perplexity, 'features_l2': features_pen}
