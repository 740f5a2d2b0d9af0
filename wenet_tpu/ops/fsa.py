"""Dense FSA <-> posterior intersection scores as a `lax.scan`.

TPU-native replacement for the k2 graph machinery the reference's
LF-MMI loss rides on (ref wenet/models/k2/model.py:100-140:
k2.DenseFsaVec + LFMMILoss intersections).  k2 materializes a lattice
on CPU/GPU; here the denominator graph is small and FIXED, so the
total (log-semiring) score of intersecting it with the frame
posteriors is one forward recursion:

    alpha_{t+1}[dst] = logsumexp over emit arcs (src,dst,l,w):
                           alpha_t[src] + w + logp[t, l]
    (+ epsilon closure between frames, bounded depth)

which is a `lax.scan` over frames with segment-logsumexp per step —
static shapes, fully jittable, vmapped over the batch.  Arc tables are
host-prepared once from a TextFst (`fst_to_dense_arcs`).
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wenet_tpu.lm.fst import TextFst

NEG_INF = -1.0e30


class DenseFsa(NamedTuple):
    """Epsilon-split arc tables of a scoring FSA.

    emit arcs consume one frame with ctc label `label` (= ilabel-1 of
    the source TextFst); eps arcs are free moves applied between frames
    up to `eps_depth` times.  Weights are LOG-domain (= -cost).
    """
    emit_src: np.ndarray  # (A,) int32
    emit_dst: np.ndarray
    emit_label: np.ndarray
    emit_weight: np.ndarray  # (A,) float32 log-domain
    eps_src: np.ndarray  # (E,) int32
    eps_dst: np.ndarray
    eps_weight: np.ndarray
    final_weight: np.ndarray  # (S,) log-domain, NEG_INF if non-final
    num_states: int
    start: int
    eps_depth: int


def fst_to_dense_arcs(fst: TextFst) -> DenseFsa:
    """Split a TextFst (tropical costs, ilabel = ctc_id + 1, 0 = eps)
    into dense arc tables.  Computes the longest eps chain for the
    bounded between-frame closure; raises on eps cycles."""
    emit, eps = [], []
    states = sorted(set(fst.arcs.keys()) | set(fst.finals.keys())
                    | {fst.start}
                    | {a.nextstate for arcs in fst.arcs.values()
                       for a in arcs})
    remap = {s: i for i, s in enumerate(states)}
    for s, arcs in fst.arcs.items():
        for a in arcs:
            if a.ilabel == 0:
                eps.append((remap[s], remap[a.nextstate], -a.weight))
            else:
                emit.append((remap[s], remap[a.nextstate], a.ilabel - 1,
                             -a.weight))
    S = len(states)
    final_weight = np.full((S,), NEG_INF, np.float32)
    for s, c in fst.finals.items():
        final_weight[remap[s]] = -c

    # longest eps chain (DFS over eps arcs; cycle -> error)
    eps_adj = {}
    for src, dst, _ in eps:
        eps_adj.setdefault(src, []).append(dst)
    depth = {}

    def longest(s, stack):
        if s in stack:
            raise ValueError('epsilon cycle in scoring FSA')
        if s in depth:
            return depth[s]
        stack.add(s)
        d = 0
        for nxt in eps_adj.get(s, ()):
            d = max(d, 1 + longest(nxt, stack))
        stack.discard(s)
        depth[s] = d
        return d

    eps_depth = max((longest(s, set()) for s in eps_adj), default=0)

    def col(rows, i, dtype):
        return np.asarray([r[i] for r in rows], dtype) if rows else \
            np.zeros((0,), dtype)

    return DenseFsa(
        emit_src=col(emit, 0, np.int32), emit_dst=col(emit, 1, np.int32),
        emit_label=col(emit, 2, np.int32),
        emit_weight=col(emit, 3, np.float32),
        eps_src=col(eps, 0, np.int32), eps_dst=col(eps, 1, np.int32),
        eps_weight=col(eps, 2, np.float32),
        final_weight=final_weight, num_states=S,
        start=remap[fst.start], eps_depth=eps_depth)


def _seg_logsumexp(vals, seg, num):
    m = jax.ops.segment_max(vals, seg, num_segments=num)
    m_safe = jnp.where(m <= NEG_INF, 0.0, m)
    # double-where: dead members must not reach exp with -1e30-scale
    # arguments or reverse-mode AD produces NaN cotangents
    dead = vals <= NEG_INF / 2
    arg = jnp.where(dead, -100.0, vals - m_safe[seg])
    s = jax.ops.segment_sum(jnp.exp(arg), seg, num_segments=num)
    out = m_safe + jnp.log(jnp.maximum(s, 1e-38))
    return jnp.where(m <= NEG_INF, NEG_INF, out)


def fsa_forward_score(log_probs: jax.Array, length: jax.Array,
                      fsa: DenseFsa) -> jax.Array:
    """Log total probability of (posteriors x FSA) over all paths.

    log_probs: (T, V); length: scalar frame count.  Batched use:
    `jax.vmap(fsa_forward_score, in_axes=(0, 0, None))`.
    """
    S = fsa.num_states
    e_src = jnp.asarray(fsa.emit_src)
    e_dst = jnp.asarray(fsa.emit_dst)
    e_lab = jnp.asarray(fsa.emit_label)
    e_w = jnp.asarray(fsa.emit_weight)
    p_src = jnp.asarray(fsa.eps_src)
    p_dst = jnp.asarray(fsa.eps_dst)
    p_w = jnp.asarray(fsa.eps_weight)

    def eps_close(alpha):
        # frontier formulation: delta^k carries the mass that used
        # EXACTLY k eps hops, so each eps path is counted once.
        # (Relaxing the accumulated alpha instead would add a length-k
        # path C(depth, k) times and inflate every score.)
        delta = alpha
        for _ in range(fsa.eps_depth):
            delta = _seg_logsumexp(delta[p_src] + p_w, p_dst, S)
            alpha = jnp.logaddexp(alpha, delta)
        return alpha

    alpha0 = jnp.full((S,), NEG_INF).at[fsa.start].set(0.0)
    alpha0 = eps_close(alpha0)

    def step(alpha, inp):
        logp_t, valid = inp
        contrib = alpha[e_src] + e_w + logp_t[e_lab]
        new = _seg_logsumexp(contrib, e_dst, S)
        new = eps_close(new)
        return jnp.where(valid, new, alpha), None

    T = log_probs.shape[0]
    valid = jnp.arange(T) < length
    alpha, _ = jax.lax.scan(step, alpha0, (log_probs, valid))
    total = jax.nn.logsumexp(alpha + jnp.asarray(fsa.final_weight))
    return total
