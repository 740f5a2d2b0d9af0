"""Pallas TPU flash attention (forward + backward) for the attention
hot path.

Blockwise online-softmax attention (never materializes the (T1, T2)
score matrix in HBM): for each query tile the kernel streams key/value
tiles through VMEM, keeping running max / normalizer / weighted-sum
accumulators.  Replaces the XLA einsum-softmax-einsum chain of
`attention_core` for long sequences (whisper's 1500-frame encoder,
long-form conformer), where the score matrix dominates HBM traffic.

Forward supports the full `attention_core` contract: boolean mask
(True == attend) and an additive pre-scale bias (rel-pos matrix_bd) —
both read tile-by-tile.  Custom-VJP backwards (flash-attention
backward recomputation: dq kernel streaming kv tiles, dk/dv kernel
streaming q tiles, logsumexp residuals) cover both the mask/bias path
(`flash_attention`) and the fused two-query rel-pos path
(`flash_attention_relpos`, `_relpos_bwd_*`) — long-T rel-pos TRAINING
never materializes (T1, T2) scores either direction.

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


def _dropout_mult(seed: jax.Array, bh: jax.Array, qi: jax.Array,
                  ki: jax.Array, rate: float) -> jax.Array:
    """Deterministic counter-based dropout multiplier: 0 or 1/(1-rate).

    A murmur3-style fmix32 hash over (seed, batch*head, global q index,
    global k index) — a pure function of absolute positions, so forward
    and both backward kernels regenerate the SAME mask regardless of
    their (different) grid tilings, and the (T1, T2) mask never exists
    in HBM.  Used for in-kernel attention-weight dropout in the flash
    kernels (training); the keep decision per position is i.i.d.
    Bernoulli(1-rate) to hash quality (fmix32 passes avalanche).

    qi: (n, 1) int32 global query rows; ki: (1, m) int32 key cols.
    seed: uint32 scalar; bh: traced int32 scalar (b * n_head + h).
    rate: static python float in (0, 1)."""
    u = (qi.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ ki.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
    u = u + (seed.astype(jnp.uint32)
             + bh.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F))
    # fmix32 finalizer (murmur3)
    u = u ^ (u >> jnp.uint32(16))
    u = u * jnp.uint32(0x85EBCA6B)
    u = u ^ (u >> jnp.uint32(13))
    u = u * jnp.uint32(0xC2B2AE35)
    u = u ^ (u >> jnp.uint32(16))
    thr = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return jnp.where(u >= thr, jnp.float32(1.0 / (1.0 - rate)),
                     jnp.float32(0.0))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _fwd_kernel(*refs, scale: float, block_k: int, kv_len: int,
                has_mask: bool, has_bias: bool, has_lse: bool):
    q_ref, k_ref, v_ref = refs[:3]
    idx = 3
    mask_ref = bias_ref = lse_ref = None
    if has_mask:
        mask_ref = refs[idx]
        idx += 1
    if has_bias:
        bias_ref = refs[idx]
        idx += 1
    o_ref = refs[idx]
    if has_lse:
        lse_ref = refs[idx + 1]
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
            s = s + bias_ref[0, :, pl.dslice(i * block_k,
                                             block_k)].astype(jnp.float32)
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
    if has_lse:
        lse = jnp.where(l > 0.0, m + jnp.log(safe_l), NEG_INF)
        # 128-lane minor dim (TPU blockspec needs (8,128)-divisible
        # tiles; same trick as the upstream pallas flash kernels)
        lse_ref[0] = jnp.broadcast_to(
            lse[:, None], lse_ref.shape[1:]).astype(jnp.float32)


def _seed_spec():
    """Grid-invariant scalar seed input (SMEM on TPU; plain ref in
    interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _seed_arr(dropout_seed):
    if dropout_seed is None:
        raise ValueError('dropout_rate > 0 requires dropout_seed')
    return jnp.asarray(dropout_seed, jnp.uint32).reshape(1)


def _prep_mask(mask, B, T1, T2, pq, pk):
    """Normalize mask to int8 (B*hm, T1p, T2p); kv padding masked."""
    if mask is None:
        m = jnp.ones((B, 1, 1, T2), bool)
    else:
        m = mask
        if m.ndim == 3:
            m = m[:, None]
    m = jnp.broadcast_to(m, (B, m.shape[1], m.shape[2], T2))
    m = jnp.pad(m, ((0, 0), (0, 0), (0, 0), (0, pk)))
    if m.shape[2] == 1:
        m = jnp.broadcast_to(m, (B, m.shape[1], T1, T2 + pk))
    m = jnp.pad(m, ((0, 0), (0, 0), (0, pq), (0, 0)),
                constant_values=False)
    hm = m.shape[1]
    return m.astype(jnp.int8).reshape(B * hm, T1 + pq, T2 + pk), hm


def _fwd_call(q, k, v, mask, bias, scale, block_q, block_k,
              want_lse: bool):
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
        m, hm = _prep_mask(mask, B, T1, T2, pq, pk)
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
            lambda b, i, j, hm=hm: (b * hm + (i if hm > 1 else 0), j,
                                    0)))
        args.append(m)
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (1, block_q, T2p),
            lambda b, i, j, hb=hb: (b * hb + (i if hb > 1 else 0), j,
                                    0)))
        args.append(b_.reshape(B * hb, T1p, T2p))

    kernel = functools.partial(_fwd_kernel, scale=scale,
                               block_k=block_k, kv_len=T2p,
                               has_mask=has_mask, has_bias=has_bias,
                               has_lse=want_lse)
    out_specs = [pl.BlockSpec((1, block_q, d),
                              lambda b, i, j: (b * h + i, j, 0))]
    out_shape = [jax.ShapeDtypeStruct((B * h, T1p, d), v.dtype)]
    if want_lse:
        out_specs.append(pl.BlockSpec((1, block_q, 128),
                                      lambda b, i, j: (b * h + i, j,
                                                       0)))
        out_shape.append(jax.ShapeDtypeStruct((B * h, T1p, 128),
                                              jnp.float32))
    res = pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                         out_specs=out_specs if want_lse else
                         out_specs[0],
                         out_shape=out_shape if want_lse else
                         out_shape[0])(*args)
    if want_lse:
        out, lse = res
        return (out.reshape(B, h, T1p, d)[:, :, :T1],
                lse[:, :, 0].reshape(B, h, T1p)[:, :, :T1])
    return res.reshape(B, h, T1p, d)[:, :, :T1]


# ---------------------------------------------------------------------------
# backward (mask + bias paths)
# ---------------------------------------------------------------------------
def _bwd_dq_kernel(*refs, scale: float, block_k: int, kv_len: int,
                   has_mask: bool, has_bias: bool):
    idx = 3
    q_ref, k_ref, v_ref = refs[:3]
    mask_ref = bias_ref = dbias_ref = None
    if has_mask:
        mask_ref = refs[idx]
        idx += 1
    if has_bias:
        bias_ref = refs[idx]
        idx += 1
    do_ref, lse_ref, delta_ref, dq_ref = refs[idx:idx + 4]
    if has_bias:
        dbias_ref = refs[idx + 4]
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :, 0].astype(jnp.float32)      # (block_q,)
    delta = delta_ref[0, :, 0].astype(jnp.float32)  # (block_q,)
    block_q, d = q.shape

    def body(i, dq):
        k = k_ref[0, pl.dslice(i * block_k, block_k)].astype(jnp.float32)
        v = v_ref[0, pl.dslice(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_bias:
            s = s + bias_ref[0, :, pl.dslice(i * block_k,
                                             block_k)].astype(jnp.float32)
        s = s * scale
        if has_mask:
            m = mask_ref[0, :, pl.dslice(i * block_k, block_k)] != 0
            s = jnp.where(m, s, NEG_INF)
        p = jnp.where(s <= NEG_INF * 0.5, 0.0,
                      jnp.exp(s - lse[:, None]))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bq, bk)
        ds = p * (dp - delta[:, None]) * scale
        if has_bias:
            dbias_ref[0, :, pl.dslice(i * block_k, block_k)] = \
                ds.astype(dbias_ref.dtype)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, kv_len // block_k, body,
                           jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, scale: float, block_q: int, q_len: int,
                    has_mask: bool, has_bias: bool):
    idx = 3
    q_ref, k_ref, v_ref = refs[:3]
    mask_ref = bias_ref = None
    if has_mask:
        mask_ref = refs[idx]
        idx += 1
    if has_bias:
        bias_ref = refs[idx]
        idx += 1
    do_ref, lse_ref, delta_ref, dk_ref, dv_ref = refs[idx:idx + 5]
    k = k_ref[0].astype(jnp.float32)  # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    block_k, d = k.shape

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.dslice(i * block_q, block_q)].astype(jnp.float32)
        do = do_ref[0, pl.dslice(i * block_q,
                                 block_q)].astype(jnp.float32)
        lse = lse_ref[0, pl.dslice(i * block_q, block_q),
                      0].astype(jnp.float32)
        delta = delta_ref[0, pl.dslice(i * block_q, block_q),
                          0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bq, bk)
        if has_bias:
            s = s + bias_ref[0, pl.dslice(i * block_q,
                                          block_q)].astype(jnp.float32)
        s = s * scale
        if has_mask:
            m = mask_ref[0, pl.dslice(i * block_q, block_q)] != 0
            s = jnp.where(m, s, NEG_INF)
        p = jnp.where(s <= NEG_INF * 0.5, 0.0,
                      jnp.exp(s - lse[:, None]))
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bk, d)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bq, bk)
        ds = p * (dp - delta[:, None]) * scale
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bk, d)
        return dk, dv

    z = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, q_len // block_q, body, (z, z))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_call(q, k, v, mask, bias, out, lse, dout, scale, block_q,
              block_k):
    B, h, T1, d = q.shape
    T2 = k.shape[2]
    block_q = min(block_q, max(T1, 1))
    block_k = min(block_k, max(T2, 1))
    pq = (-T1) % block_q
    pk = (-T2) % block_k
    T1p, T2p = T1 + pq, T2 + pk
    q_p = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0))).reshape(
        B * h, T1p, d)
    k_p = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0))).reshape(
        B * h, T2p, d)
    v_p = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0))).reshape(
        B * h, T2p, d)
    do_p = jnp.pad(dout, ((0, 0), (0, 0), (0, pq), (0, 0))).reshape(
        B * h, T1p, d)
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # (B,h,T1)
    delta_p = jnp.broadcast_to(
        jnp.pad(delta, ((0, 0), (0, 0), (0, pq))).reshape(
            B * h, T1p)[:, :, None], (B * h, T1p, 128))
    lse_p = jnp.broadcast_to(
        jnp.pad(lse, ((0, 0), (0, 0), (0, pq))).reshape(
            B * h, T1p)[:, :, None], (B * h, T1p, 128))

    has_mask = mask is not None or pk > 0
    if has_mask:
        m, hm = _prep_mask(mask, B, T1, T2, pq, pk)
    has_bias = bias is not None
    if has_bias:
        b_ = jnp.broadcast_to(bias, (B,) + bias.shape[1:])
        if b_.ndim == 3:
            b_ = b_[:, None]
        hb = b_.shape[1]
        b_full = jnp.broadcast_to(b_, (B, b_.shape[1], T1, T2))
        b_p = jnp.pad(b_full, ((0, 0), (0, 0), (0, pq),
                               (0, pk))).reshape(B * hb, T1p, T2p)

    # dq: grid over q tiles
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b * h + i, j, 0)),
        pl.BlockSpec((1, T2p, d), lambda b, i, j: (b * h + i, 0, 0)),
        pl.BlockSpec((1, T2p, d), lambda b, i, j: (b * h + i, 0, 0)),
    ]
    args = [q_p, k_p, v_p]
    if has_mask:
        in_specs.append(pl.BlockSpec(
            (1, block_q, T2p),
            lambda b, i, j, hm=hm: (b * hm + (i if hm > 1 else 0), j,
                                    0)))
        args.append(m)
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (1, block_q, T2p),
            lambda b, i, j, hb=hb: (b * hb + (i if hb > 1 else 0), j,
                                    0)))
        args.append(b_p)
    in_specs += [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b * h + i, j, 0)),
        pl.BlockSpec((1, block_q, 128),
                     lambda b, i, j: (b * h + i, j, 0)),
        pl.BlockSpec((1, block_q, 128),
                     lambda b, i, j: (b * h + i, j, 0)),
    ]
    args += [do_p, lse_p, delta_p]
    out_specs = [pl.BlockSpec((1, block_q, d),
                              lambda b, i, j: (b * h + i, j, 0))]
    out_shapes = [jax.ShapeDtypeStruct((B * h, T1p, d), q.dtype)]
    if has_bias:
        # per-(b,h) dbias row-blocks; broadcast dims reduced below
        out_specs.append(pl.BlockSpec(
            (1, block_q, T2p), lambda b, i, j: (b * h + i, j, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((B * h, T1p, T2p),
                                               jnp.float32))
    res = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k,
                          kv_len=T2p, has_mask=has_mask,
                          has_bias=has_bias),
        grid=(B, h, T1p // block_q),
        in_specs=in_specs,
        out_specs=out_specs if has_bias else out_specs[0],
        out_shape=out_shapes if has_bias else out_shapes[0],
    )(*args)
    if has_bias:
        dq, dbias_full = res
        dbias = dbias_full.reshape(B, h, T1p, T2p)[:, :, :T1, :T2]
        # reduce over dims the original bias broadcast over
        if bias.ndim == 3:
            target = bias[:, None].shape
        else:
            target = bias.shape
        if target[0] == 1:
            dbias = jnp.sum(dbias, axis=0, keepdims=True)
        if target[1] == 1:
            dbias = jnp.sum(dbias, axis=1, keepdims=True)
        dbias = dbias.astype(bias.dtype)
        if bias.ndim == 3:
            dbias = dbias[:, 0] if target[1] == 1 else dbias.reshape(
                bias.shape)
    else:
        dq = res
        dbias = None

    # dk/dv: grid over kv tiles
    in_specs = [
        pl.BlockSpec((1, T1p, d), lambda b, i, j: (b * h + i, 0, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b * h + i, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b * h + i, j, 0)),
    ]
    args = [q_p, k_p, v_p]
    if has_mask:
        in_specs.append(pl.BlockSpec(
            (1, T1p, block_k),
            lambda b, i, j, hm=hm: (b * hm + (i if hm > 1 else 0), 0,
                                    j)))
        args.append(m)
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (1, T1p, block_k),
            lambda b, i, j, hb=hb: (b * hb + (i if hb > 1 else 0), 0,
                                    j)))
        args.append(b_p)
    in_specs += [
        pl.BlockSpec((1, T1p, d), lambda b, i, j: (b * h + i, 0, 0)),
        pl.BlockSpec((1, T1p, 128), lambda b, i, j: (b * h + i, 0, 0)),
        pl.BlockSpec((1, T1p, 128), lambda b, i, j: (b * h + i, 0, 0)),
    ]
    args += [do_p, lse_p, delta_p]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale,
                          block_q=block_q, q_len=T1p,
                          has_mask=has_mask, has_bias=has_bias),
        grid=(B, h, T2p // block_k),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d),
                         lambda b, i, j: (b * h + i, j, 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda b, i, j: (b * h + i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * h, T2p, d), k.dtype),
            jax.ShapeDtypeStruct((B * h, T2p, d), v.dtype),
        ],
    )(*args)
    dq = dq.reshape(B, h, T1p, d)[:, :, :T1]
    dk = dk.reshape(B, h, T2p, d)[:, :, :T2]
    dv = dv.reshape(B, h, T2p, d)[:, :, :T2]
    return dq, dk, dv, dbias


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_diff(q, k, v, mask, bias, scale, block_q, block_k):
    return _fwd_call(q, k, v, mask, bias, scale, block_q, block_k,
                     want_lse=False)


def _flash_diff_fwd(q, k, v, mask, bias, scale, block_q, block_k):
    out, lse = _fwd_call(q, k, v, mask, bias, scale, block_q, block_k,
                         want_lse=True)
    return out, (q, k, v, mask, bias, out, lse)


def _flash_diff_bwd(scale, block_q, block_k, res, dout):
    q, k, v, mask, bias, out, lse = res
    dq, dk, dv, dbias = _bwd_call(q, k, v, mask, bias, out, lse, dout,
                                  scale, block_q, block_k)
    return dq, dk, dv, None, dbias


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


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
    bias: additive pre-scale bias broadcastable to (B, h|1, T1, T2)

    Fully differentiable via the flash backward kernels (dbias is
    materialized blockwise and reduced over broadcast dims, so rel-pos
    training works too).
    """
    return _flash_diff(q, k, v, mask, bias, scale, block_q, block_k)


# ---------------------------------------------------------------------------
# rel-pos flash: s = q1·k^T + q2·p^T without materializing (T1, T2)
# (conformer rel-pos attention: q1 = q + pos_bias_u, q2 = q + pos_bias_v,
#  p = projected position embeddings — ref attention.py:307-438)
# ---------------------------------------------------------------------------
def _relpos_fwd_kernel(*refs, scale: float, block_k: int, kv_len: int,
                       has_mask: bool, has_lse: bool = False,
                       dropout_rate: float = 0.0):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_rate > 0.0 else None
    lse_ref = None
    if has_mask and has_lse:
        (q1_ref, q2_ref, k_ref, p_ref, v_ref, mask_ref, o_ref,
         lse_ref) = refs
    elif has_mask:
        q1_ref, q2_ref, k_ref, p_ref, v_ref, mask_ref, o_ref = refs
    elif has_lse:
        q1_ref, q2_ref, k_ref, p_ref, v_ref, o_ref, lse_ref = refs
        mask_ref = None
    else:
        q1_ref, q2_ref, k_ref, p_ref, v_ref, o_ref = refs
        mask_ref = None
    q1 = q1_ref[0].astype(jnp.float32)
    q2 = q2_ref[0].astype(jnp.float32)
    block_q, d = q1.shape
    if dropout_rate > 0.0:
        # global coordinates for the tiling-independent dropout hash:
        # grid = (B, h, q tiles); kv position advances with the loop
        bh = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
        q0 = pl.program_id(2) * block_q
        qi = q0 + jax.lax.broadcasted_iota(jnp.int32,
                                           (block_q, block_k), 0)
        ki_base = jax.lax.broadcasted_iota(jnp.int32,
                                           (block_q, block_k), 1)
        seed = seed_ref[0]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.dslice(i * block_k, block_k)].astype(jnp.float32)
        p = p_ref[0, pl.dslice(i * block_k, block_k)].astype(jnp.float32)
        v = v_ref[0, pl.dslice(i * block_k, block_k)].astype(jnp.float32)
        s = (jax.lax.dot_general(q1, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) +
             jax.lax.dot_general(q2, p, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32))
        s = s * scale
        if has_mask:
            m = mask_ref[0, :, pl.dslice(i * block_k, block_k)] != 0
            s = jnp.where(m, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        pgt = jnp.exp(s - m_new[:, None])
        pgt = jnp.where(s <= NEG_INF * 0.5, 0.0, pgt)
        corr = jnp.exp(m_prev - m_new)
        # l accumulates the FULL softmax normalizer; dropout applies to
        # the normalized weights (out = (D . p/l) @ v), so only the
        # v-accumulator sees the mask
        l_new = l_prev * corr + jnp.sum(pgt, axis=-1)
        pv = pgt
        if dropout_rate > 0.0:
            pv = pgt * _dropout_mult(seed, bh, qi,
                                     i * block_k + ki_base,
                                     dropout_rate)
        acc = acc * corr[:, None] + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, kv_len // block_k, body,
                                  (acc0, m0, l0))
    safe_l = jnp.where(l > 0.0, l, 1.0)
    out = jnp.where((l > 0.0)[:, None], acc / safe_l[:, None], 0.0)
    o_ref[0] = out.astype(o_ref.dtype)
    if lse_ref is not None:
        lse = jnp.where(l > 0.0, m + jnp.log(safe_l), NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse[:, None],
                                      lse_ref.shape[1:]).astype(
                                          lse_ref.dtype)


def _relpos_reference(q1, q2, k, p, v, mask, scale,
                      dropout_rate: float = 0.0, dropout_seed=None):
    """Pure-jnp oracle for the fused rel-pos kernel — TEST-ONLY
    (test_flash_attention grad/forward parity); the production
    backward is the blockwise _relpos_bwd_* kernels above.  With
    dropout_rate > 0 it applies the SAME counter-hash mask as the
    kernels (materialized dense here), so jax.grad through this oracle
    is the exact-gradient reference for the in-kernel dropout."""
    s = (jnp.einsum('bhqd,bhkd->bhqk', q1, k,
                    preferred_element_type=jnp.float32) +
         jnp.einsum('bhqd,bhkd->bhqk', q2, p,
                    preferred_element_type=jnp.float32)) * scale
    if mask is not None:
        m = mask if mask.ndim == 4 else mask[:, None]
        s = jnp.where(m, s, NEG_INF)
    a = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        a = jnp.where(m, a, 0.0)
    if dropout_rate > 0.0:
        B, h, T1, T2 = a.shape
        seed = jnp.asarray(dropout_seed, jnp.uint32)
        bh = jnp.arange(B * h, dtype=jnp.int32).reshape(B, h, 1, 1)
        qi = jnp.arange(T1, dtype=jnp.int32).reshape(1, 1, T1, 1)
        ki = jnp.arange(T2, dtype=jnp.int32).reshape(1, 1, 1, T2)
        a = a * _dropout_mult(seed, bh, qi, ki, dropout_rate)
    return jnp.einsum('bhqk,bhkd->bhqd', a.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _relpos_fwd_call(q1, q2, k, p, v, mask, scale, block_q, block_k,
                     want_lse: bool = False, dropout_rate: float = 0.0,
                     dropout_seed=None):
    B, h, T1, d = q1.shape
    T2 = k.shape[2]
    block_q = min(block_q, max(T1, 1))
    block_k = min(block_k, max(T2, 1))
    pq = (-T1) % block_q
    pk = (-T2) % block_k
    T1p, T2p = T1 + pq, T2 + pk
    pad_q = ((0, 0), (0, 0), (0, pq), (0, 0))
    pad_k = ((0, 0), (0, 0), (0, pk), (0, 0))
    q1p = jnp.pad(q1, pad_q).reshape(B * h, T1p, d)
    q2p = jnp.pad(q2, pad_q).reshape(B * h, T1p, d)
    kp = jnp.pad(k, pad_k).reshape(B * h, T2p, d)
    pp = jnp.pad(jnp.broadcast_to(p, (B, h, T2, d)),
                 pad_k).reshape(B * h, T2p, d)
    vp = jnp.pad(v, pad_k).reshape(B * h, T2p, d)
    has_mask = mask is not None or pk > 0
    if has_mask:
        m, hm = _prep_mask(mask, B, T1, T2, pq, pk)
    grid = (B, h, T1p // block_q)
    qspec = pl.BlockSpec((1, block_q, d),
                         lambda b, i, j: (b * h + i, j, 0))
    kspec = pl.BlockSpec((1, T2p, d), lambda b, i, j: (b * h + i, 0, 0))
    in_specs = [qspec, qspec, kspec, kspec, kspec]
    args = [q1p, q2p, kp, pp, vp]
    if dropout_rate > 0.0:
        in_specs.insert(0, _seed_spec())
        args.insert(0, _seed_arr(dropout_seed))
    if has_mask:
        in_specs.append(pl.BlockSpec(
            (1, block_q, T2p),
            lambda b, i, j, hm=hm: (b * hm + (i if hm > 1 else 0), j,
                                    0)))
        args.append(m)
    out_specs = [qspec]
    out_shape = [jax.ShapeDtypeStruct((B * h, T1p, d), v.dtype)]
    if want_lse:
        out_specs.append(pl.BlockSpec(
            (1, block_q, 128), lambda b, i, j: (b * h + i, j, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B * h, T1p, 128),
                                              jnp.float32))
    res = pl.pallas_call(
        functools.partial(_relpos_fwd_kernel, scale=scale,
                          block_k=block_k, kv_len=T2p,
                          has_mask=has_mask, has_lse=want_lse,
                          dropout_rate=dropout_rate),
        grid=grid, in_specs=in_specs,
        out_specs=out_specs if want_lse else out_specs[0],
        out_shape=out_shape if want_lse else out_shape[0],
    )(*args)
    if want_lse:
        out, lse = res
        return (out.reshape(B, h, T1p, d)[:, :, :T1],
                lse[:, :, 0].reshape(B, h, T1p)[:, :, :T1])
    return res.reshape(B, h, T1p, d)[:, :, :T1]


# ---------------------------------------------------------------------------
# rel-pos training backward: blockwise recomputation, no (T1, T2)
# scores/softmax residuals in HBM (VERDICT.md round-1 item #9 — the
# previous backward fell back to the materializing jnp reference)
# ---------------------------------------------------------------------------
def _relpos_bwd_dq_kernel(*refs, scale: float, block_k: int,
                          kv_len: int, has_mask: bool,
                          dropout_rate: float = 0.0):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_rate > 0.0 else None
    idx = 5
    q1_ref, q2_ref, k_ref, p_ref, v_ref = refs[:5]
    mask_ref = None
    if has_mask:
        mask_ref = refs[idx]
        idx += 1
    do_ref, lse_ref, delta_ref, dq1_ref, dq2_ref = refs[idx:idx + 5]
    q1 = q1_ref[0].astype(jnp.float32)
    q2 = q2_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :, 0].astype(jnp.float32)
    delta = delta_ref[0, :, 0].astype(jnp.float32)
    block_q, d = q1.shape
    if dropout_rate > 0.0:
        bh = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
        q0 = pl.program_id(2) * block_q
        qi = q0 + jax.lax.broadcasted_iota(jnp.int32,
                                           (block_q, block_k), 0)
        ki_base = jax.lax.broadcasted_iota(jnp.int32,
                                           (block_q, block_k), 1)
        seed = seed_ref[0]

    def body(i, carry):
        dq1, dq2 = carry
        k = k_ref[0, pl.dslice(i * block_k, block_k)].astype(jnp.float32)
        p = p_ref[0, pl.dslice(i * block_k, block_k)].astype(jnp.float32)
        v = v_ref[0, pl.dslice(i * block_k, block_k)].astype(jnp.float32)
        s = (jax.lax.dot_general(q1, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) +
             jax.lax.dot_general(q2, p, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32))
        s = s * scale
        if has_mask:
            m = mask_ref[0, :, pl.dslice(i * block_k, block_k)] != 0
            s = jnp.where(m, s, NEG_INF)
        pgt = jnp.where(s <= NEG_INF * 0.5, 0.0,
                        jnp.exp(s - lse[:, None]))
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            # y = D . softmax(s); da = D . dp, and delta already equals
            # rowsum(da . a) because out = (D . a) @ v
            dp = dp * _dropout_mult(seed, bh, qi,
                                    i * block_k + ki_base,
                                    dropout_rate)
        ds = pgt * (dp - delta[:, None]) * scale
        dq1 = dq1 + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq2 = dq2 + jax.lax.dot_general(
            ds, p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq1, dq2

    z = jnp.zeros((block_q, d), jnp.float32)
    dq1, dq2 = jax.lax.fori_loop(0, kv_len // block_k, body, (z, z))
    dq1_ref[0] = dq1.astype(dq1_ref.dtype)
    dq2_ref[0] = dq2.astype(dq2_ref.dtype)


def _relpos_bwd_dkpv_kernel(*refs, scale: float, block_q: int,
                            q_len: int, has_mask: bool,
                            dropout_rate: float = 0.0):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_rate > 0.0 else None
    idx = 5
    q1_ref, q2_ref, k_ref, p_ref, v_ref = refs[:5]
    mask_ref = None
    if has_mask:
        mask_ref = refs[idx]
        idx += 1
    (do_ref, lse_ref, delta_ref, dk_ref, dp_ref,
     dv_ref) = refs[idx:idx + 6]
    k = k_ref[0].astype(jnp.float32)
    p = p_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    block_k, d = k.shape
    if dropout_rate > 0.0:
        # kv-tiled grid: the k offset is fixed per program, q advances
        # with the loop — same global (qi, ki) hash as the fwd kernel
        bh = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
        k0 = pl.program_id(2) * block_k
        ki = k0 + jax.lax.broadcasted_iota(jnp.int32,
                                           (block_q, block_k), 1)
        qi_base = jax.lax.broadcasted_iota(jnp.int32,
                                           (block_q, block_k), 0)
        seed = seed_ref[0]

    def body(i, carry):
        dk, dp_, dv = carry
        q1 = q1_ref[0, pl.dslice(i * block_q,
                                 block_q)].astype(jnp.float32)
        q2 = q2_ref[0, pl.dslice(i * block_q,
                                 block_q)].astype(jnp.float32)
        do = do_ref[0, pl.dslice(i * block_q,
                                 block_q)].astype(jnp.float32)
        lse = lse_ref[0, pl.dslice(i * block_q, block_q),
                      0].astype(jnp.float32)
        delta = delta_ref[0, pl.dslice(i * block_q, block_q),
                          0].astype(jnp.float32)
        s = (jax.lax.dot_general(q1, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) +
             jax.lax.dot_general(q2, p, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32))
        s = s * scale
        if has_mask:
            m = mask_ref[0, pl.dslice(i * block_q, block_q)] != 0
            s = jnp.where(m, s, NEG_INF)
        pgt = jnp.where(s <= NEG_INF * 0.5, 0.0,
                        jnp.exp(s - lse[:, None]))
        if dropout_rate > 0.0:
            drop = _dropout_mult(seed, bh, i * block_q + qi_base, ki,
                                 dropout_rate)
            pv = pgt * drop
        else:
            pv = pgt
        dv = dv + jax.lax.dot_general(
            pv, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dpv = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            dpv = dpv * drop
        ds = pgt * (dpv - delta[:, None]) * scale
        dk = dk + jax.lax.dot_general(
            ds, q1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_ = dp_ + jax.lax.dot_general(
            ds, q2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dp_, dv

    z = jnp.zeros((block_k, d), jnp.float32)
    dk, dp_, dv = jax.lax.fori_loop(0, q_len // block_q, body,
                                    (z, z, z))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dp_ref[0] = dp_.astype(dp_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _relpos_bwd_call(q1, q2, k, p, v, mask, out, lse, dout, scale,
                     block_q, block_k, dropout_rate: float = 0.0,
                     dropout_seed=None):
    B, h, T1, d = q1.shape
    T2 = k.shape[2]
    block_q = min(block_q, max(T1, 1))
    block_k = min(block_k, max(T2, 1))
    pq = (-T1) % block_q
    pk = (-T2) % block_k
    T1p, T2p = T1 + pq, T2 + pk
    pad_q = ((0, 0), (0, 0), (0, pq), (0, 0))
    pad_k = ((0, 0), (0, 0), (0, pk), (0, 0))
    q1p = jnp.pad(q1, pad_q).reshape(B * h, T1p, d)
    q2p = jnp.pad(q2, pad_q).reshape(B * h, T1p, d)
    kp = jnp.pad(k, pad_k).reshape(B * h, T2p, d)
    pp = jnp.pad(jnp.broadcast_to(p, (B, h, T2, d)),
                 pad_k).reshape(B * h, T2p, d)
    vp = jnp.pad(v, pad_k).reshape(B * h, T2p, d)
    do_p = jnp.pad(dout, pad_q).reshape(B * h, T1p, d)
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)
    delta_p = jnp.broadcast_to(
        jnp.pad(delta, ((0, 0), (0, 0), (0, pq))).reshape(
            B * h, T1p)[:, :, None], (B * h, T1p, 128))
    lse_p = jnp.broadcast_to(
        jnp.pad(lse, ((0, 0), (0, 0), (0, pq))).reshape(
            B * h, T1p)[:, :, None], (B * h, T1p, 128))

    has_mask = mask is not None or pk > 0
    if has_mask:
        m, hm = _prep_mask(mask, B, T1, T2, pq, pk)

    qspec = pl.BlockSpec((1, block_q, d),
                         lambda b, i, j: (b * h + i, j, 0))
    kv_full = pl.BlockSpec((1, T2p, d), lambda b, i, j: (b * h + i, 0, 0))
    aux_spec = pl.BlockSpec((1, block_q, 128),
                            lambda b, i, j: (b * h + i, j, 0))
    # dq1/dq2: grid over q tiles
    in_specs = [qspec, qspec, kv_full, kv_full, kv_full]
    args = [q1p, q2p, kp, pp, vp]
    if dropout_rate > 0.0:
        in_specs.insert(0, _seed_spec())
        args.insert(0, _seed_arr(dropout_seed))
    if has_mask:
        in_specs.append(pl.BlockSpec(
            (1, block_q, T2p),
            lambda b, i, j, hm=hm: (b * hm + (i if hm > 1 else 0), j,
                                    0)))
        args.append(m)
    in_specs += [qspec, aux_spec, aux_spec]
    args += [do_p, lse_p, delta_p]
    dq1, dq2 = pl.pallas_call(
        functools.partial(_relpos_bwd_dq_kernel, scale=scale,
                          block_k=block_k, kv_len=T2p,
                          has_mask=has_mask, dropout_rate=dropout_rate),
        grid=(B, h, T1p // block_q),
        in_specs=in_specs, out_specs=[qspec, qspec],
        out_shape=[jax.ShapeDtypeStruct((B * h, T1p, d), q1.dtype),
                   jax.ShapeDtypeStruct((B * h, T1p, d), q2.dtype)],
    )(*args)

    # dk/dp/dv: grid over kv tiles
    q_full = pl.BlockSpec((1, T1p, d), lambda b, i, j: (b * h + i, 0, 0))
    kspec = pl.BlockSpec((1, block_k, d),
                         lambda b, i, j: (b * h + i, j, 0))
    aux_full = pl.BlockSpec((1, T1p, 128),
                            lambda b, i, j: (b * h + i, 0, 0))
    in_specs = [q_full, q_full, kspec, kspec, kspec]
    args = [q1p, q2p, kp, pp, vp]
    if dropout_rate > 0.0:
        in_specs.insert(0, _seed_spec())
        args.insert(0, _seed_arr(dropout_seed))
    if has_mask:
        in_specs.append(pl.BlockSpec(
            (1, T1p, block_k),
            lambda b, i, j, hm=hm: (b * hm + (i if hm > 1 else 0), 0,
                                    j)))
        args.append(m)
    in_specs += [q_full, aux_full, aux_full]
    args += [do_p, lse_p, delta_p]
    dk, dp, dv = pl.pallas_call(
        functools.partial(_relpos_bwd_dkpv_kernel, scale=scale,
                          block_q=block_q, q_len=T1p,
                          has_mask=has_mask, dropout_rate=dropout_rate),
        grid=(B, h, T2p // block_k),
        in_specs=in_specs, out_specs=[kspec, kspec, kspec],
        out_shape=[jax.ShapeDtypeStruct((B * h, T2p, d), k.dtype),
                   jax.ShapeDtypeStruct((B * h, T2p, d), jnp.float32),
                   jax.ShapeDtypeStruct((B * h, T2p, d), v.dtype)],
    )(*args)
    dq1 = dq1.reshape(B, h, T1p, d)[:, :, :T1]
    dq2 = dq2.reshape(B, h, T1p, d)[:, :, :T1]
    dk = dk.reshape(B, h, T2p, d)[:, :, :T2]
    dp = dp.reshape(B, h, T2p, d)[:, :, :T2]
    dv = dv.reshape(B, h, T2p, d)[:, :, :T2]
    return dq1, dq2, dk, dp, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 10))
def flash_attention_relpos(q1, q2, k, p, v, mask=None, scale=1.0,
                           block_q: int = 128, block_k: int = 128,
                           dropout_seed=None,
                           dropout_rate: float = 0.0):
    """Rel-pos attention (matrix_ac + matrix_bd fused blockwise):
    never materializes the (T1, T2) bias or scores in HBM.

    q1 = q + pos_bias_u, q2 = q + pos_bias_v; p broadcastable
    (1|B, h, T2, d).  Backward is the blockwise recomputation kernels
    (_relpos_bwd_*): neither direction materializes (T1, T2) scores or
    softmax residuals in HBM, so long-T rel-pos TRAINING gets the same
    memory profile as inference.

    dropout_rate/dropout_seed: in-kernel attention-weight dropout
    (out = (D . softmax(s)) @ v with D = keep/(1-rate)) — the mask is
    a counter-based hash of global positions (_dropout_mult),
    regenerated identically inside backward, so training dropout costs
    ZERO (T1, T2) HBM traffic (the XLA path's ~17 GB/step of fp32
    score/mask tensors was the measured train-MFU bound, BENCH_NOTES).
    Grad consistency vs an autodiffed same-mask oracle is tested in
    test_flash_attention.py."""
    return _relpos_fwd_call(q1, q2, k, p, v, mask, scale, block_q,
                            block_k, dropout_rate=dropout_rate,
                            dropout_seed=dropout_seed)


def _relpos_vjp_fwd(q1, q2, k, p, v, mask, scale, block_q, block_k,
                    dropout_seed, dropout_rate):
    out, lse = _relpos_fwd_call(q1, q2, k, p, v, mask, scale, block_q,
                                block_k, want_lse=True,
                                dropout_rate=dropout_rate,
                                dropout_seed=dropout_seed)
    return out, (q1, q2, k, p, v, mask, dropout_seed, out, lse)


def _relpos_vjp_bwd(scale, block_q, block_k, dropout_rate, res, dout):
    q1, q2, k, p, v, mask, dropout_seed, out, lse = res
    dq1, dq2, dk, dp, dv = _relpos_bwd_call(
        q1, q2, k, p, v, mask, out, lse, dout, scale, block_q, block_k,
        dropout_rate=dropout_rate, dropout_seed=dropout_seed)
    # p may have been broadcast over batch/head; reduce the grad back
    if p.shape[0] == 1 and dp.shape[0] != 1:
        dp = jnp.sum(dp, axis=0, keepdims=True)
    dp = dp.astype(p.dtype)
    return dq1, dq2, dk, dp, dv, None, None


flash_attention_relpos.defvjp(_relpos_vjp_fwd, _relpos_vjp_bwd)
