"""Multi-head attention zoo (MHA / GQA / rel-pos / cross / Shaw / RoPE).

TPU-native rebuild of ref wenet/models/transformer/attention.py:29-686.
Key departures from the reference design:

* Pure-functional caches: a cache is always an explicit (k, v) pytree of
  *static* shape.  The streaming encoder passes a fixed
  (B, h_kv, cache_t, d_k) window (invalid leading slots are masked), the
  AR decoder passes a fixed (B, h_kv, max_len, d_k) ring buffer written
  with `lax.dynamic_update_slice` at the current step — so every decode
  loop compiles once (the reference grows tensors with torch.cat,
  attention.py:180-215, which would retrace under jit).
* Softmax always in fp32 (matches ref attention.py:163), matmuls hit the
  MXU via einsum with `preferred_element_type`.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from wenet_tpu.ops.dropout import Dropout
T_CACHE = Tuple[jax.Array, jax.Array]  # (k, v): (B, h_kv, T, d_k)


def repeat_kv(x: jax.Array, n_repeat: int) -> jax.Array:
    """(B, h_kv, T, d) -> (B, h_kv*n, T, d) for GQA. ref: attention.py:217-243."""
    if n_repeat == 1:
        return x
    return jnp.repeat(x, n_repeat, axis=1)


# Pallas flash-attention dispatch: enabled for long sequences on TPU
# (whisper 1500-frame encoder, long-form audio); the blockwise kernel
# avoids materializing (T1, T2) scores in HBM.  Toggle with
# `enable_flash_attention`.
_FLASH = {'enabled': False, 'min_len': 512,
          'score_elems': 24 * 1024 * 1024, 'train_dropout': False}


def enable_flash_attention(enabled: bool = True, min_len: int = 512,
                           score_elems: int = 24 * 1024 * 1024,
                           train_dropout: bool = False):
    """min_len: sequence-length gate — flash wins at long T (1.6x at
    T=1500) while XLA's fused attention wins at conformer T'~400 for
    small batches.  score_elems: BATCH-AREA gate — once the per-layer
    (B, h, Tq, Tk) score tensor passes this many elements the XLA
    path's fp32 scores spill past VMEM-friendly tiling and flash wins
    on memory, not math (measured on v5e, B=64xT'=375 offline decode:
    XLA 19.3k -> flash 27.6k audio-sec/s; B<=32 at the same T' stays
    XLA, BENCH_NOTES.md batch sweep).  24M sits between the measured
    B=32 (18.4M, XLA better) and B=64 (36.9M, flash better) points.
    train_dropout: route TRAINING rel-pos self-attention (attention
    dropout active) through the flash kernels with in-kernel
    counter-hash dropout — the XLA train path's (B, h, T, T) fp32
    score/softmax/mask HBM traffic (~17 GB/step at flagship B=32) was
    the measured train-MFU bound (BENCH_NOTES trace analysis).  The
    dropout mask STREAM differs from flax nn.Dropout (same rate,
    deterministic per seed), so it is opt-in; bin/train.py enables it
    by default (--no_flash_train to disable)."""
    _FLASH['enabled'] = enabled
    _FLASH['min_len'] = min_len
    _FLASH['score_elems'] = score_elems
    _FLASH['train_dropout'] = train_dropout


def _flash_eligible(q, k) -> bool:
    if not _FLASH['enabled'] or q.ndim != 4:
        return False
    if q.shape[1] != k.shape[1]:  # GQA repeat happens before the core
        return False
    if jax.default_backend() != 'tpu':  # mosaic kernel; XLA elsewhere
        return False
    if q.shape[2] >= _FLASH['min_len'] and k.shape[2] >= _FLASH['min_len']:
        return True
    # batch-area gate (needs a full kernel block of query rows)
    score_elems = q.shape[0] * q.shape[1] * q.shape[2] * k.shape[2]
    return (q.shape[2] >= 128 and k.shape[2] >= 128
            and score_elems >= _FLASH['score_elems'])


def _flash_train_eligible(q, k) -> bool:
    """Flash dispatch for the TRAINING path (attention dropout active,
    in-kernel counter-hash dropout).  Gated separately from inference:
    the flash win here is eliminating the (B, h, T, T) residual HBM
    traffic of fwd+bwd, which pays at any T the kernel tiles (>=128)."""
    if not (_FLASH['enabled'] and _FLASH['train_dropout']):
        return False
    if q.ndim != 4 or q.shape[1] != k.shape[1]:
        return False
    if jax.default_backend() != 'tpu':
        return False
    return q.shape[2] >= 128 and k.shape[2] >= 128


def attention_core(q: jax.Array,
                   k: jax.Array,
                   v: jax.Array,
                   mask: Optional[jax.Array],
                   scale: float,
                   bias: Optional[jax.Array] = None,
                   dropout_fn=None) -> jax.Array:
    """scores = (q·kᵀ + bias) * scale, masked fp32 softmax, weighted sum.

    q: (..., h, T1, d), k/v: (..., h, T2, d)
    mask: bool broadcastable to (..., 1|h, T1|1, T2); True == attend.
    bias: additive pre-scale score bias (rel-pos matrix_bd etc.).
    dropout_fn: applied to the softmaxed weights (training attention
    dropout, ref attention.py:173); forces the XLA path.
    Returns (..., h, T1, d).
    """
    if dropout_fn is None and _flash_eligible(q, k):
        from wenet_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, mask, bias, scale=scale)
    scores = jnp.einsum('...qd,...kd->...qk', q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    scores = scores * scale
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.asarray(-1.0e30, scores.dtype))
    # 'attn_scores' tags the (T1, T2) intermediates for selective
    # remat (encoder gradient_checkpointing='selective'): the policy
    # recomputes exactly these in backward instead of saving them to
    # HBM.  checkpoint_name is identity outside a remat context.
    scores = checkpoint_name(scores, 'attn_scores')
    attn = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        attn = jnp.where(mask, attn, 0.0)
    if dropout_fn is not None:
        attn = dropout_fn(attn)
    attn = checkpoint_name(attn, 'attn_scores')
    attn = attn.astype(v.dtype)
    return jnp.einsum('...qk,...kd->...qd', attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(..., h, T, d) -> (..., T, h*d)."""
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


def _expand_mask(mask: Optional[jax.Array]) -> Optional[jax.Array]:
    """(B, T1|1, T2) bool -> (B, 1, T1|1, T2) for head broadcast."""
    if mask is None:
        return None
    return mask[..., None, :, :]


class MultiHeadedAttention(nn.Module):
    """MHA with optional MQA/GQA. ref: attention.py:29-304."""
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    query_bias: bool = True
    key_bias: bool = True
    value_bias: bool = True
    n_kv_head: Optional[int] = None
    head_dim: Optional[int] = None
    # hashable ('lora_rank', r), ... tuple; None disables LoRA
    lora_conf: Optional[Tuple] = None

    @property
    def d_k(self) -> int:
        inner = (self.n_feat
                 if self.head_dim is None else self.head_dim * self.n_head)
        return inner // self.n_head

    @property
    def h_kv(self) -> int:
        return self.n_head if self.n_kv_head is None else self.n_kv_head

    def setup(self):
        inner_dim = (self.n_feat if self.head_dim is None else
                     self.head_dim * self.n_head)
        inner_kv_dim = (inner_dim if self.n_kv_head is None else
                        self.d_k * self.n_kv_head)
        from wenet_tpu.models.finetune.lora import make_attention_dense
        conf = dict(self.lora_conf) if self.lora_conf else None
        self.linear_q = make_attention_dense(inner_dim, self.query_bias,
                                             'linear_q', 'q', conf)
        self.linear_k = make_attention_dense(inner_kv_dim, self.key_bias,
                                             'linear_k', 'k', conf)
        self.linear_v = make_attention_dense(inner_kv_dim,
                                             self.value_bias,
                                             'linear_v', 'v', conf)
        self.linear_out = make_attention_dense(self.n_feat,
                                               self.query_bias,
                                               'linear_out', 'o', conf)
        self.attn_dropout = Dropout(self.dropout_rate)

    def _attn_dropout_fn(self, deterministic: bool):
        """Attention-weight dropout (ref attention.py:173). None when
        inactive so the flash path stays eligible at inference."""
        if deterministic or self.dropout_rate == 0.0:
            return None
        return lambda a: self.attn_dropout(a, deterministic=False)

    # -- projections ------------------------------------------------------
    def project_q(self, x: jax.Array) -> jax.Array:
        """(..., T, F) -> (..., h, T, d_k)."""
        q = self.linear_q(x)
        q = q.reshape(q.shape[:-1] + (self.n_head, self.d_k))
        return jnp.swapaxes(q, -3, -2)

    def project_kv(self, key: jax.Array,
                   value: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """-> each (..., h_kv, T, d_k)."""
        k = self.linear_k(key)
        v = self.linear_v(value)
        k = jnp.swapaxes(
            k.reshape(k.shape[:-1] + (self.h_kv, self.d_k)), -3, -2)
        v = jnp.swapaxes(
            v.reshape(v.shape[:-1] + (self.h_kv, self.d_k)), -3, -2)
        return k, v

    def _finish(self, ctx: jax.Array) -> jax.Array:
        return self.linear_out(_merge_heads(ctx))

    # -- full / streaming-window forward ---------------------------------
    def __call__(self,
                 query: jax.Array,
                 key: jax.Array,
                 value: jax.Array,
                 mask: Optional[jax.Array] = None,
                 pos_emb: Optional[jax.Array] = None,
                 cache: Optional[T_CACHE] = None,
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, Optional[T_CACHE]]:
        """mask: (B, T1|1, T2_total) bool.  If `cache` is given, its (k, v)
        window is prepended to the freshly projected kv (static shapes:
        T2_total = cache_t + T2)."""
        q = self.project_q(query)
        k, v = self.project_kv(key, value)
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=-2)
            v = jnp.concatenate([cache[1], v], axis=-2)
        new_cache = (k, v)
        n_rep = self.n_head // self.h_kv
        ctx = attention_core(q, repeat_kv(k, n_rep), repeat_kv(v, n_rep),
                             _expand_mask(mask), 1.0 / math.sqrt(self.d_k),
                             dropout_fn=self._attn_dropout_fn(deterministic))
        return self._finish(ctx), new_cache

    # -- single-step AR decode (fixed-size ring cache) --------------------
    def decode_step(self, x_q: jax.Array, cache: T_CACHE,
                    step: jax.Array) -> Tuple[jax.Array, T_CACHE]:
        """x_q: (B, 1, F); cache k/v: (B, h_kv, L_max, d_k); step: scalar.

        Writes this step's kv at `step` and attends over positions <= step.
        Replaces the reference's growing-cat decode cache
        (ref decoder.py:226-281) with an O(1)-shape update so the whole
        beam loop is one lax.scan."""
        q = self.project_q(x_q)  # (B, h, 1, d)
        k_new, v_new = self.project_kv(x_q, x_q)  # (B, h_kv, 1, d)
        k_buf, v_buf = cache
        # cache buffers take their dtype from the encoder output
        # (decoder.init_state); under a mixed-precision runner (e.g.
        # int8 dequant to bf16 with fp32 features) the step kv can
        # land in a different dtype — conform to the buffer
        k_new = k_new.astype(k_buf.dtype)
        v_new = v_new.astype(v_buf.dtype)
        k_buf = jax.lax.dynamic_update_slice(k_buf, k_new, (0, 0, step, 0))
        v_buf = jax.lax.dynamic_update_slice(v_buf, v_new, (0, 0, step, 0))
        L = k_buf.shape[-2]
        mask = (jnp.arange(L) <= step)[None, None, None, :]
        n_rep = self.n_head // self.h_kv
        ctx = attention_core(q, repeat_kv(k_buf, n_rep),
                             repeat_kv(v_buf, n_rep), mask,
                             1.0 / math.sqrt(self.d_k))
        return self._finish(ctx), (k_buf, v_buf)


class MultiHeadedCrossAttention(MultiHeadedAttention):
    """Cross attention with precomputable kv. ref: attention.py:441-520."""

    def __call__(self,
                 query: jax.Array,
                 key: jax.Array,
                 value: jax.Array,
                 mask: Optional[jax.Array] = None,
                 pos_emb: Optional[jax.Array] = None,
                 cache: Optional[T_CACHE] = None,
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, Optional[T_CACHE]]:
        """If `cache` holds the projected encoder kv, key/value are ignored
        (ref attention.py:466-474)."""
        q = self.project_q(query)
        if cache is not None:
            k, v = cache
        else:
            k, v = self.project_kv(key, value)
        new_cache = (k, v)
        n_rep = self.n_head // self.h_kv
        k = repeat_kv(k, n_rep)
        v = repeat_kv(v, n_rep)
        # beam expansion: queries (B*N, ...) vs keys (B, ...)
        Bq, Bk = q.shape[0], k.shape[0]
        if Bq != Bk:
            beams = Bq // Bk
            q = q.reshape((Bk, beams) + q.shape[1:])
            ctx = attention_core(q, k[:, None], v[:, None],
                                 _expand_mask(mask)[:, None]
                                 if mask is not None else None,
                                 1.0 / math.sqrt(self.d_k),
                                 dropout_fn=self._attn_dropout_fn(
                                     deterministic))
            ctx = ctx.reshape((Bq,) + ctx.shape[2:])
        else:
            ctx = attention_core(q, k, v, _expand_mask(mask),
                                 1.0 / math.sqrt(self.d_k),
                                 dropout_fn=self._attn_dropout_fn(
                                     deterministic))
        return self._finish(ctx), new_cache


class RelPositionMultiHeadedAttention(MultiHeadedAttention):
    """Transformer-XL relative position MHA (rel_shift removed, matching
    ref attention.py:307-438)."""

    def setup(self):
        super().setup()
        self.linear_pos = nn.Dense(self.n_feat, use_bias=False,
                                   name='linear_pos')
        self.pos_bias_u = self.param(
            'pos_bias_u', nn.initializers.xavier_uniform(),
            (self.n_head, self.d_k))
        self.pos_bias_v = self.param(
            'pos_bias_v', nn.initializers.xavier_uniform(),
            (self.n_head, self.d_k))

    def __call__(self,
                 query: jax.Array,
                 key: jax.Array,
                 value: jax.Array,
                 mask: Optional[jax.Array] = None,
                 pos_emb: Optional[jax.Array] = None,
                 cache: Optional[T_CACHE] = None,
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, Optional[T_CACHE]]:
        assert pos_emb is not None
        q = self.project_q(query)  # (B, h, T1, d)
        k, v = self.project_kv(key, value)
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=-2)
            v = jnp.concatenate([cache[1], v], axis=-2)
        new_cache = (k, v)
        n_rep = self.n_head // self.h_kv
        k = repeat_kv(k, n_rep)
        v = repeat_kv(v, n_rep)

        p = self.linear_pos(pos_emb)  # (1|B, T2, n_feat)
        p = jnp.swapaxes(
            p.reshape(p.shape[:-1] + (self.n_head, self.d_k)), -3, -2)

        u = self.pos_bias_u.astype(q.dtype)[None, :, None, :]
        w = self.pos_bias_v.astype(q.dtype)[None, :, None, :]
        dropout_fn = self._attn_dropout_fn(deterministic)
        if dropout_fn is None and _flash_eligible(q, k):
            # fused rel-pos flash: never materializes (T1, T2) scores
            # or the matrix_bd bias in HBM
            from wenet_tpu.ops.flash_attention import (
                flash_attention_relpos)
            p_b = jnp.broadcast_to(p, (q.shape[0],) + p.shape[1:])
            ctx = flash_attention_relpos(
                q + u, q + w, k, p_b, v, mask,
                scale=1.0 / math.sqrt(self.d_k))
            return self._finish(ctx), new_cache
        if dropout_fn is not None and _flash_train_eligible(q, k):
            # TRAINING flash with in-kernel dropout: fwd+bwd never
            # touch (T1, T2) tensors in HBM (the measured train-MFU
            # bound, BENCH_NOTES trace analysis); the dropout mask is
            # a counter hash seeded per call from the module's
            # 'dropout' rng stream — same rate, different stream than
            # flax nn.Dropout (enable_flash_attention train_dropout)
            from wenet_tpu.ops.flash_attention import (
                flash_attention_relpos)
            seed = jax.random.bits(self.make_rng('dropout'), (),
                                   jnp.uint32)
            p_b = jnp.broadcast_to(p, (q.shape[0],) + p.shape[1:])
            # single tile over T (up to 512): at conformer train T'~300
            # the per-program work is microseconds, so grid-step count,
            # not VMEM reuse, dominates — measured 128x128 blocks run
            # 1.5x slower than one T-sized tile at (32,4,299,64)
            blk = min(512, max(q.shape[2], k.shape[2]))
            ctx = flash_attention_relpos(
                q + u, q + w, k, p_b, v, mask,
                scale=1.0 / math.sqrt(self.d_k),
                block_q=blk, block_k=blk,
                dropout_seed=seed, dropout_rate=float(self.dropout_rate))
            return self._finish(ctx), new_cache
        matrix_ac = jnp.einsum('bhqd,bhkd->bhqk', q + u, k,
                               preferred_element_type=jnp.float32)
        matrix_bd = jnp.einsum('bhqd,bhkd->bhqk', q + w, p,
                               preferred_element_type=jnp.float32)
        scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k)
        if mask is not None:
            m = _expand_mask(mask)
            scores = jnp.where(m, scores,
                               jnp.asarray(-1.0e30, scores.dtype))
        # see attention_core: selective-remat tag for the (T1, T2)
        # intermediates — in 'selective' mode the fp32 scores/attn are
        # recomputed in backward (2 cheap einsums) instead of living
        # in HBM as residuals
        scores = checkpoint_name(scores, 'attn_scores')
        attn = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = jnp.where(m, attn, 0.0)
        if dropout_fn is not None:
            attn = dropout_fn(attn)
        attn = checkpoint_name(attn, 'attn_scores')
        ctx = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return self._finish(ctx), new_cache


class ShawRelPositionMultiHeadedAttention(MultiHeadedAttention):
    """Learned clipped relative-key embeddings. ref: attention.py:523-596."""
    max_right_rel_pos: int = 8
    max_left_rel_pos: int = 64

    def setup(self):
        super().setup()
        self.rel_k_embed = nn.Embed(
            self.max_left_rel_pos + self.max_right_rel_pos + 1, self.d_k,
            name='rel_k_embed')

    def __call__(self,
                 query: jax.Array,
                 key: jax.Array,
                 value: jax.Array,
                 mask: Optional[jax.Array] = None,
                 pos_emb: Optional[jax.Array] = None,
                 cache: Optional[T_CACHE] = None,
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, Optional[T_CACHE]]:
        q = self.project_q(query)
        k, v = self.project_kv(key, value)
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=-2)
            v = jnp.concatenate([cache[1], v], axis=-2)
        new_cache = (k, v)
        n_rep = self.n_head // self.h_kv
        k = repeat_kv(k, n_rep)
        v = repeat_kv(v, n_rep)

        T2 = k.shape[-2]
        idx = jnp.arange(T2)
        rel = jnp.clip(idx[None, :] - idx[:, None], -self.max_left_rel_pos,
                       self.max_right_rel_pos) + self.max_left_rel_pos
        rel_k = self.rel_k_embed(rel)  # (T2, T2, d_k)
        rel_k = rel_k[-q.shape[-2]:]  # (T1, T2, d_k)
        rel_bias = jnp.einsum('bhld,lrd->bhlr', q,
                              rel_k.astype(q.dtype),
                              preferred_element_type=jnp.float32)
        ctx = attention_core(q, k, v, _expand_mask(mask),
                             1.0 / math.sqrt(self.d_k), bias=rel_bias,
                             dropout_fn=self._attn_dropout_fn(deterministic))
        return self._finish(ctx), new_cache


def apply_rotary_emb(x: jax.Array, ang: jax.Array,
                     style: str = 'google') -> jax.Array:
    """x: (B, T, h, d); ang: (B, T, d/2) rope angles. ref: rope_utils.py."""
    cos = jnp.cos(ang)[..., None, :].astype(jnp.float32)  # (B,T,1,d/2)
    sin = jnp.sin(ang)[..., None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    if style == 'google':
        a, b = jnp.split(xf, 2, axis=-1)
        out = jnp.concatenate([a * cos - b * sin, a * sin + b * cos],
                              axis=-1)
    else:  # llama: interleaved pairs
        a = xf[..., 0::2]
        b = xf[..., 1::2]
        out = jnp.stack([a * cos - b * sin, a * sin + b * cos],
                        axis=-1).reshape(xf.shape)
    return out.astype(x.dtype)


class RopeMultiHeadedAttention(MultiHeadedAttention):
    """MHA with rotary embeddings. ref: attention.py:599-686."""
    style: str = 'google'

    def __call__(self,
                 query: jax.Array,
                 key: jax.Array,
                 value: jax.Array,
                 mask: Optional[jax.Array] = None,
                 pos_emb: Optional[jax.Array] = None,
                 cache: Optional[T_CACHE] = None,
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, Optional[T_CACHE]]:
        assert pos_emb is not None  # rope angles (B, T, d_k/2)
        # project in (B, T, h, d) layout, rotate, then go head-first
        q = self.linear_q(query)
        q = q.reshape(q.shape[:-1] + (self.n_head, self.d_k))
        k = self.linear_k(key)
        k = k.reshape(k.shape[:-1] + (self.h_kv, self.d_k))
        v = self.linear_v(value)
        v = v.reshape(v.shape[:-1] + (self.h_kv, self.d_k))
        # rope positions cover the *new* tokens; cached kv were rotated when
        # they were fresh (absolute rotation), matching ref attention.py:655-666
        T_new = q.shape[1]
        ang = pos_emb[:, -T_new:]
        q = apply_rotary_emb(q, ang, self.style)
        k = apply_rotary_emb(k, ang, self.style)
        q = jnp.swapaxes(q, -3, -2)
        k = jnp.swapaxes(k, -3, -2)
        v = jnp.swapaxes(v, -3, -2)
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=-2)
            v = jnp.concatenate([cache[1], v], axis=-2)
        new_cache = (k, v)
        n_rep = self.n_head // self.h_kv
        ctx = attention_core(q, repeat_kv(k, n_rep), repeat_kv(v, n_rep),
                             _expand_mask(mask), 1.0 / math.sqrt(self.d_k),
                             dropout_fn=self._attn_dropout_fn(deterministic))
        return self._finish(ctx), new_cache


ATTENTION_CLASSES = {
    'selfattn': MultiHeadedAttention,
    'rel_selfattn': RelPositionMultiHeadedAttention,
    'crossattn': MultiHeadedCrossAttention,
    'shaw_rel_selfattn': ShawRelPositionMultiHeadedAttention,
    'rope_abs_selfattn': RopeMultiHeadedAttention,
}


def _register_extra_attention():
    # lazy: firered attention lives in its model package
    from wenet_tpu.models.firered.model import FireRedRelPosAttention
    ATTENTION_CLASSES['firered_rel_selfattn'] = FireRedRelPosAttention
