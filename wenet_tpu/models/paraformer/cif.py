"""Continuous integrate-and-fire predictor.

ref: wenet/models/paraformer/cif.py:24-296.  The integrate-and-fire
recurrence is a lax.scan over time; fired frames are compacted to the
front with a stable-partition gather (fixed shapes, no per-utterance
python loops like ref cif.py:250-296).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


from wenet_tpu.ops.dropout import Dropout
def cif(hidden: jax.Array, alphas: jax.Array, threshold: float,
        max_out_len: int) -> Tuple[jax.Array, jax.Array]:
    """hidden: (B, T, D); alphas: (B, T) -> (frames (B, max_out_len, D),
    fires (B, T)).  ref: cif.py:250-296.

    Kept as a scan on purpose: a parallel cumsum+segment-matmul
    formulation (fires at floor(cumsum) increments) measures equal
    end-to-end at production shapes (the paraformer batch program is
    encoder/decoder-bound, see BENCH_NOTES.md) but loses exactness at
    long T — frac(cumsum) precision decays with the integrated total,
    flipping borderline fire positions vs the reference's sequential
    semantics, which this scan reproduces step for step."""
    B, T, D = hidden.shape

    def step(carry, xs):
        integrate, frame = carry
        alpha, h = xs  # (B,), (B, D)
        distribution_completion = 1.0 - integrate
        integrate = integrate + alpha
        fire_place = integrate >= threshold
        new_integrate = jnp.where(fire_place, integrate - 1.0, integrate)
        cur = jnp.where(fire_place, distribution_completion, alpha)
        remainds = alpha - cur
        frame_out = frame + cur[:, None] * h
        new_frame = jnp.where(fire_place[:, None], remainds[:, None] * h,
                              frame_out)
        return (new_integrate, new_frame), (integrate, frame_out,
                                            fire_place)

    init = (jnp.zeros((B,), hidden.dtype), jnp.zeros((B, D),
                                                     hidden.dtype))
    _, (fires, frames, fired) = jax.lax.scan(
        step, init,
        (jnp.swapaxes(alphas, 0, 1), jnp.swapaxes(hidden, 0, 1)))
    fires = jnp.swapaxes(fires, 0, 1)  # (B, T)
    frames = jnp.swapaxes(frames, 0, 1)  # (B, T, D)
    fired = jnp.swapaxes(fired, 0, 1)  # (B, T) bool

    # stable-partition fired frames to the front
    key = jnp.where(fired, 0, T) + jnp.arange(T)[None, :]
    take = min(max_out_len, T)
    order = jnp.argsort(key, axis=1)[:, :take]
    gathered = jnp.take_along_axis(frames, order[:, :, None], axis=1)
    if take < max_out_len:
        gathered = jnp.pad(gathered,
                           ((0, 0), (0, max_out_len - take), (0, 0)))
    n_fired = jnp.sum(fired, axis=1)
    valid = jnp.arange(max_out_len)[None, :] < n_fired[:, None]
    gathered = jnp.where(valid[:, :, None], gathered, 0.0)
    return gathered, fires


def cif_without_hidden(alphas: jax.Array, threshold: float) -> jax.Array:
    """Integrated-alpha trace for timestamping. ref: cif.py:225-247."""

    def step(integrate, alpha):
        integrate = integrate + alpha
        fire_place = integrate >= threshold
        new_integrate = jnp.where(fire_place, integrate - threshold,
                                  integrate)
        return new_integrate, integrate

    _, fires = jax.lax.scan(step,
                            jnp.zeros(alphas.shape[0], alphas.dtype),
                            jnp.swapaxes(alphas, 0, 1))
    return jnp.swapaxes(fires, 0, 1)


class Cif(nn.Module):
    """ref: cif.py:24-206."""
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

    def setup(self):
        groups = self.idim if self.cnn_groups == 0 else self.cnn_groups
        self.cif_conv1d = nn.Conv(self.idim,
                                  (self.l_order + self.r_order + 1,),
                                  padding='VALID',
                                  feature_group_count=groups,
                                  name='cif_conv1d')
        self.cif_output = nn.Dense(1, name='cif_output')
        self.dropout_layer = Dropout(self.dropout)

    def compute_alphas(self, hidden: jax.Array, mask: jax.Array,
                       train: bool = False) -> jax.Array:
        """hidden (B, T, D), mask (B, 1, T) -> alphas (B, T)."""
        x = jnp.pad(hidden, ((0, 0), (self.l_order, self.r_order),
                             (0, 0)))
        memory = self.cif_conv1d(x)
        output = memory + hidden if self.residual else memory
        output = self.dropout_layer(output, deterministic=not train)
        output = jax.nn.relu(output)
        alphas = jax.nn.sigmoid(self.cif_output(output))
        alphas = jax.nn.relu(alphas * self.smooth_factor -
                             self.noise_threshold)
        alphas = alphas[:, :, 0] * mask[:, 0, :]
        return alphas

    def __call__(self,
                 hidden: jax.Array,
                 target_label_length: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None,
                 max_out_len: Optional[int] = None,
                 train: bool = False):
        """Returns (acoustic_embeds (B, U, D), token_num (B,), alphas,
        cif_peak).  `max_out_len` must be static (label width for
        training, a decode cap otherwise)."""
        alphas = self.compute_alphas(hidden, mask, train)
        token_num = jnp.sum(alphas, axis=-1)
        if target_label_length is not None:
            # scale alphas so they integrate to exactly the target count
            scale = target_label_length.astype(alphas.dtype) / \
                jnp.maximum(token_num, 1e-6)
            alphas = alphas * scale[:, None]
            out_len = max_out_len
        else:
            if self.tail_threshold > 0.0:
                hidden, alphas, token_num = self.tail_process_fn(
                    hidden, alphas, mask)
            out_len = max_out_len if max_out_len is not None else \
                hidden.shape[1]
        acoustic_embeds, cif_peak = cif(hidden, alphas, self.threshold,
                                        out_len)
        return acoustic_embeds, token_num, alphas, cif_peak

    def tail_process_fn(self, hidden, alphas, mask):
        """Append a tail-threshold slot after the last valid frame.

        ref: cif.py:110-143."""
        B, T, D = hidden.shape
        m = mask[:, 0, :].astype(alphas.dtype)  # (B, T)
        zeros = jnp.zeros((B, 1), alphas.dtype)
        ones = jnp.ones((B, 1), alphas.dtype)
        mask_1 = jnp.concatenate([m, zeros], axis=1)
        mask_2 = jnp.concatenate([ones, m], axis=1)
        tail = (mask_2 - mask_1) * self.tail_threshold  # (B, T+1)
        alphas = jnp.concatenate([alphas, zeros], axis=1) + tail
        hidden = jnp.concatenate([hidden, jnp.zeros((B, 1, D),
                                                    hidden.dtype)],
                                 axis=1)
        token_num = jnp.maximum(jnp.floor(jnp.sum(alphas, axis=-1)), 1.0)
        return hidden, alphas, token_num


def mae_loss(token_length, pre_token_length,
             normalize_length: bool = False):
    """ref: cif.py:209-223."""
    denom = (jnp.sum(token_length) if normalize_length else
             token_length.shape[0])
    return jnp.sum(
        jnp.abs(token_length.astype(jnp.float32) -
                pre_token_length.astype(jnp.float32))) / denom
