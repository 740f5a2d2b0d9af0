"""BEST-RQ: BERT-style pretraining with a random-projection quantizer.

ref: wenet/models/ssl/bestrq/bestrq_model.py:12-330."""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.ssl.mask import compute_mask_indices
from wenet_tpu.utils.mask import make_pad_mask


def quantize_codes(latent: jax.Array, codebook: jax.Array) -> jax.Array:
    """latent: (N, D); codebook: (C, G, D/G) -> codes (N, G).

    ref: bestrq_model.py:12-55."""
    N, D = latent.shape
    C, G, _ = codebook.shape
    lat = latent.reshape(N, G, D // G)
    distance = (
        jnp.sum(lat**2, -1, keepdims=True) -
        2 * jnp.einsum('ngd,cgd->ngc', lat, codebook) +
        jnp.sum(jnp.transpose(codebook, (2, 1, 0))**2, 0,
                keepdims=True))
    return jnp.argmin(distance, axis=-1)


class BestRQModel(nn.Module):
    """ref: bestrq_model.py:58-330."""
    encoder: nn.Module
    num_mel_bins: int = 80
    embedding_dim: int = 16
    num_embeddings: int = 8192
    num_codebooks: int = 1
    mask_prob: float = 0.01
    mask_length: int = 10
    min_masks: int = 2
    out_bias: bool = False
    features_regularization_weight: float = 0.01

    @property
    def stack_frames(self) -> int:
        return self.encoder.right_context + 1

    @property
    def stride(self) -> int:
        return self.encoder.subsampling_rate

    def setup(self):
        odim = self.encoder.output_size
        self.encoder_top_n_out = self.param(
            'encoder_top_n_out',
            nn.initializers.truncated_normal(0.02),
            (self.num_codebooks, odim, self.num_embeddings))
        if self.out_bias:
            self.encoder_top_n_out_bias = self.param(
                'encoder_top_n_out_bias', nn.initializers.zeros,
                (self.num_codebooks, self.num_embeddings))
        input_dim = self.num_mel_bins * self.stride
        # frozen random projection + codebooks live in 'bestrq' collection
        self.projection = self.variable(
            'bestrq', 'projection',
            lambda: jax.nn.initializers.glorot_uniform()(
                jax.random.PRNGKey(0),
                (input_dim, self.embedding_dim * self.num_codebooks)))
        def _init_codebook():
            e = jax.random.normal(
                jax.random.PRNGKey(1),
                (self.num_embeddings, self.num_codebooks,
                 self.embedding_dim))
            return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)
        self.embeddings = self.variable('bestrq', 'embeddings',
                                        _init_codebook)

    def __call__(self,
                 feats: jax.Array,
                 feats_lengths: jax.Array,
                 target: Optional[jax.Array] = None,
                 target_lengths: Optional[jax.Array] = None,
                 train: bool = False,
                 chunk_rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        del target, target_lengths
        xs = feats
        rng = (chunk_rng if chunk_rng is not None else
               jax.random.PRNGKey(0))
        features_pen = jnp.mean(xs**2)

        masked_xs, code_ids_mask = self._apply_mask_signal(
            xs, feats_lengths, rng)
        unmasked_stacked = self._stack_features(xs, feats_lengths)
        target_ids = self._nearest_embedding_idx(unmasked_stacked)

        out, out_mask = self.encoder(masked_xs, feats_lengths,
                                     train=train, chunk_rng=None)
        Tn = min(out.shape[1], code_ids_mask.shape[1],
                 target_ids.shape[1])
        out = out[:, :Tn]
        code_ids_mask = code_ids_mask[:, :Tn]
        target_ids = target_ids[:, :Tn]

        logits = jnp.einsum('btd,gdv->bgtv', out,
                            self.encoder_top_n_out)
        if self.out_bias:
            logits = logits + self.encoder_top_n_out_bias[None, :,
                                                          None, :]
        masks = out_mask[:, 0, :Tn] * code_ids_mask

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # (B, G, T) true-class log prob
        tgt = jnp.swapaxes(target_ids, 1, 2)  # (B, G, T)
        true_lp = jnp.take_along_axis(logp, tgt[..., None],
                                      axis=-1)[..., 0]
        per = -true_lp * masks[:, None, :]
        loss = jnp.sum(per) / jnp.maximum(
            jnp.sum(masks) * self.num_codebooks, 1)
        if self.features_regularization_weight != 0.0:
            loss = loss + self.features_regularization_weight * \
                features_pen

        ids_corr = jnp.argmax(logits, axis=-1) == tgt
        num_codes = jnp.sum(masks) * self.num_codebooks
        codes_acc = jnp.sum(ids_corr * masks[:, None, :]) / jnp.maximum(
            num_codes, 1)
        return {'loss': loss, 'codes_acc': codes_acc,
                'features_l2': features_pen, 'num_codes': num_codes,
                'th_accuracy': codes_acc}

    def _apply_mask_signal(self, input, input_lens, rng):
        """ref: bestrq_model.py:217-256."""
        B, T, D = input.shape
        padding = make_pad_mask(input_lens, T)
        # subsampled-frame pad mask via strided window max
        n_win = max(0, (T - self.stack_frames) // self.stride + 1)
        idx = (jnp.arange(n_win)[:, None] * self.stride +
               jnp.arange(self.stack_frames)[None, :])
        pad_stride = jnp.max(padding[:, idx], axis=-1)  # (B, n_win)
        r_mask, r_emb = jax.random.split(rng)
        masks = compute_mask_indices(r_mask, pad_stride, self.mask_prob,
                                     self.mask_length, self.min_masks)
        # expand each subsampled mask to its first `stride` raw frames
        raw = jnp.repeat(masks, self.stride, axis=1)  # (B, n_win*stride)
        full = jnp.zeros((B, T), bool)
        full = full.at[:, :raw.shape[1]].set(raw[:, :T])
        mask_emb = 0.1 * jax.random.normal(r_emb, (1, 1, D), input.dtype)
        xs = jnp.where(full[:, :, None], mask_emb, input)
        return xs, masks

    def _stack_features(self, input, input_lens):
        """ref: bestrq_model.py:258-279 (stack + masked utterance MVN)."""
        B, T, D = input.shape
        n = T // self.stride
        stack = input[:, :n * self.stride].reshape(B, n,
                                                   self.stride * D)
        valid = ~make_pad_mask(input_lens, T)
        vw = valid[:, :n * self.stride].reshape(B, n, self.stride)
        smask = jnp.min(vw, axis=-1).astype(input.dtype)  # (B, n)
        stack = stack * smask[:, :, None]
        denom = jnp.maximum(jnp.sum(smask, 1, keepdims=True), 1)[..., None]
        mean = jnp.sum(stack, 1, keepdims=True) / denom
        std = jnp.sqrt(
            jnp.sum((stack - mean)**2, axis=1, keepdims=True) / denom)
        return (stack - mean) / (std + 1e-5)

    def _nearest_embedding_idx(self, xs):
        """ref: bestrq_model.py:291-299."""
        proj = self.projection.value.astype(xs.dtype)
        z = xs @ proj
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        B, T, C = z.shape
        codes = quantize_codes(z.reshape(B * T, C),
                               self.embeddings.value)
        return codes.reshape(B, T, -1)
