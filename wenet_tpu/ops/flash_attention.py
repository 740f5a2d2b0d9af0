"""Pallas TPU flash attention for the encoder hot path.

Blockwise online-softmax attention (never materializes the (T1, T2)
score matrix in HBM): for each query tile the kernel streams key/value
tiles through VMEM, keeping running max / normalizer / weighted-sum
accumulators.  Replaces the XLA einsum-softmax-einsum chain of
`attention_core` for long sequences (whisper's 1500-frame encoder,
long-form conformer), where the score matrix dominates HBM traffic.

Supports the full `attention_core` contract: boolean mask
(True == attend) and an additive pre-scale bias (rel-pos matrix_bd) —
both are read tile-by-tile, so only q/k/v/bias tiles ever sit in VMEM.

ref behavior: wenet/models/transformer/attention.py:105-172 (the
masked-softmax semantics this kernel must reproduce, incl. fully-masked
rows producing zeros).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1.0e30


def _flash_kernel(*refs, scale: float, block_k: int, kv_len: int,
                  has_mask: bool, has_bias: bool):
    q_ref, k_ref, v_ref = refs[:3]
    idx = 3
    mask_ref = bias_ref = None
    if has_mask:
        mask_ref = refs[idx]
        idx += 1
    if has_bias:
        bias_ref = refs[idx]
        idx += 1
    o_ref = refs[idx]
    q = q_ref[0].astype(jnp.float32)  # (block_q, d)
    block_q = q.shape[0]
    d = v_ref.shape[-1]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.dslice(i * block_k, block_k)].astype(jnp.float32)
        v = v_ref[0, pl.dslice(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (block_q, block_k)
        if has_bias:
            s = s + bias_ref[0, :, pl.dslice(i * block_k, block_k)].astype(
                jnp.float32)
        s = s * scale
        if has_mask:
            m = mask_ref[0, :, pl.dslice(i * block_k, block_k)] != 0
            s = jnp.where(m, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        # finite NEG_INF sentinel: exp(s - m) == 1 on fully-masked rows,
        # so explicitly zero masked positions to keep l an exact count
        p = jnp.where(s <= NEG_INF * 0.5, 0.0, p)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=-1)
        acc = acc * correction[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, kv_len // block_k, body,
                                  (acc0, m0, l0))
    # fully-masked rows: l == 0 -> emit zeros (matches attention_core's
    # post-softmax re-mask, ref attention.py:168)
    safe_l = jnp.where(l > 0.0, l, 1.0)
    out = acc / safe_l[:, None]
    out = jnp.where((l > 0.0)[:, None], out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('scale', 'block_q',
                                             'block_k'))
def flash_attention(q: jax.Array,
                    k: jax.Array,
                    v: jax.Array,
                    mask: Optional[jax.Array] = None,
                    bias: Optional[jax.Array] = None,
                    scale: float = 1.0,
                    block_q: int = 128,
                    block_k: int = 128) -> jax.Array:
    """Same contract as `attention_core`.

    q: (B, h, T1, d); k/v: (B, h, T2, d)
    mask: bool broadcastable to (B, h|1, T1|1, T2), True == attend
    bias: additive pre-scale bias broadcastable to (B, h|1|, T1, T2)
    """
    B, h, T1, d = q.shape
    T2 = k.shape[2]
    block_q = min(block_q, max(T1, 1))
    block_k = min(block_k, max(T2, 1))
    pq = (-T1) % block_q
    pk = (-T2) % block_k
    q_p = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
    k_p = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
    v_p = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    T1p, T2p = T1 + pq, T2 + pk

    has_mask = mask is not None or pk > 0
    if has_mask:
        if mask is None:
            m = jnp.ones((B, 1, 1, T2), bool)
        else:
            m = mask
            if m.ndim == 3:
                m = m[:, None]
        m = jnp.broadcast_to(m, (B, m.shape[1], m.shape[2], T2))
        m = jnp.pad(m, ((0, 0), (0, 0), (0, 0), (0, pk)))
        if m.shape[2] == 1:
            m = jnp.broadcast_to(m, (B, m.shape[1], T1, T2p))
        m = jnp.pad(m, ((0, 0), (0, 0), (0, pq), (0, 0)),
                    constant_values=False)
        m = m.astype(jnp.int8)  # 1-byte loads; bool lowering varies
        hm = m.shape[1]
    has_bias = bias is not None
    if has_bias:
        b_ = jnp.broadcast_to(bias, (B,) + bias.shape[1:])
        if b_.ndim == 3:
            b_ = b_[:, None]
        b_ = jnp.broadcast_to(b_, (B, b_.shape[1], T1, T2))
        b_ = jnp.pad(b_, ((0, 0), (0, 0), (0, pq), (0, pk)))
        hb = b_.shape[1]

    grid = (B, h, T1p // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b * h + i, j, 0)),
        pl.BlockSpec((1, T2p, d), lambda b, i, j: (b * h + i, 0, 0)),
        pl.BlockSpec((1, T2p, d), lambda b, i, j: (b * h + i, 0, 0)),
    ]
    args = [q_p.reshape(B * h, T1p, d), k_p.reshape(B * h, T2p, d),
            v_p.reshape(B * h, T2p, d)]
    if has_mask:
        in_specs.append(pl.BlockSpec(
            (1, block_q, T2p),
            lambda b, i, j, hm=hm: (b * hm + (i if hm > 1 else 0), j, 0)))
        args.append(m.reshape(B * hm, T1p, T2p))
    else:
        in_specs.append(None)
        args.append(None)
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (1, block_q, T2p),
            lambda b, i, j, hb=hb: (b * hb + (i if hb > 1 else 0), j, 0)))
        args.append(b_.reshape(B * hb, T1p, T2p))
    else:
        in_specs.append(None)
        args.append(None)

    kernel = functools.partial(_flash_kernel, scale=scale,
                               block_k=block_k, kv_len=T2p,
                               has_mask=has_mask, has_bias=has_bias)
    in_specs = [s for s, a in zip(in_specs, args) if a is not None]
    args = [a for a in args if a is not None]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda b, i, j: (b * h + i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B * h, T1p, d), v.dtype),
    )(*args)
    return out.reshape(B, h, T1p, d)[:, :, :T1]
