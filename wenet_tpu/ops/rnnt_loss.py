"""RNN-T loss as a diagonal-wavefront lax.scan.

Replaces torchaudio.functional.rnnt_loss (ref
wenet/models/transducer/transducer.py:152-160).  The (T, U) alpha
lattice is swept along anti-diagonals: every cell on diagonal d depends
only on diagonal d-1, so the whole grid is T+U-1 vectorized scan steps
(the per-cell python recursions of CPU implementations disappear).
Gradients flow through the scan by autodiff (soft occupancies).
"""

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def _rnnt_single(log_probs: jax.Array, labels: jax.Array, T: jax.Array,
                 U: jax.Array, blank: int) -> jax.Array:
    """-log P(labels | encoder) for one utterance.

    log_probs: (Tmax, Umax+1, V) joint log-probs; labels: (Umax,);
    T / U: true lengths."""
    Tmax, Up1, _ = log_probs.shape
    Umax = Up1 - 1
    u_idx = jnp.arange(Up1)

    bl = log_probs[:, :, blank]  # (T, U+1)
    em = jnp.take_along_axis(
        log_probs[:, :Umax, :],
        labels[None, :, None].astype(jnp.int32), axis=2)[:, :, 0]
    # forbid emitting beyond the true label length
    em = jnp.where(jnp.arange(Umax)[None, :] < U, em, NEG_INF)

    # wavefront state A[u] = alpha[d - u, u]
    A0 = jnp.full((Up1,), NEG_INF).at[0].set(0.0)
    d_star = T - 1 + U

    def step(carry, d):
        A, ll = carry
        t_for_u = d - u_idx  # cell (t, u) on this diagonal
        # blank arrival: from (t-1, u)
        t_bl = jnp.clip(t_for_u - 1, 0, Tmax - 1)
        bl_prev = bl[t_bl, u_idx]
        from_blank = jnp.where(
            (t_for_u >= 1) & (t_for_u <= Tmax - 1), A + bl_prev, NEG_INF)
        # emit arrival: from (t, u-1)
        t_em = jnp.clip(t_for_u, 0, Tmax - 1)
        u_em = jnp.clip(u_idx - 1, 0, Umax - 1)
        em_prev = em[t_em, u_em]
        A_shift = jnp.concatenate([jnp.full((1,), NEG_INF), A[:-1]])
        from_emit = jnp.where(
            (u_idx >= 1) & (t_for_u >= 0) & (t_for_u <= Tmax - 1),
            A_shift + em_prev, NEG_INF)
        A_new = jnp.logaddexp(from_blank, from_emit)
        # cells not on a valid diagonal keep NEG_INF
        A_new = jnp.where((t_for_u >= 0) & (t_for_u < Tmax), A_new,
                          NEG_INF)
        # capture the terminal cell when its diagonal arrives
        final_here = A_new[U] + bl[jnp.clip(T - 1, 0, Tmax - 1), U]
        ll = jnp.where(d == d_star, final_here, ll)
        return (A_new, ll), None

    # diagonal 0 is just alpha[0,0]=0; also handle the degenerate U==0
    init_ll = jnp.where(d_star == 0, A0[0] + bl[0, 0], NEG_INF)
    (A, ll), _ = jax.lax.scan(step, (A0, init_ll),
                              jnp.arange(1, Tmax + Umax))
    return -ll


def rnnt_loss(log_probs: jax.Array,
              labels: jax.Array,
              logit_lengths: jax.Array,
              label_lengths: jax.Array,
              blank: int = 0,
              reduction: str = 'mean') -> jax.Array:
    """log_probs: (B, T, U+1, V) log-softmaxed joint outputs.

    Matches torchaudio.functional.rnnt_loss semantics (which applies
    log_softmax internally; pass raw logits via `rnnt_loss_logits`)."""
    per = jax.vmap(_rnnt_single, in_axes=(0, 0, 0, 0, None))(
        log_probs, labels, logit_lengths, label_lengths, blank)
    if reduction == 'mean':
        return jnp.mean(per)
    if reduction == 'sum':
        return jnp.sum(per)
    return per


def rnnt_loss_logits(logits: jax.Array, labels: jax.Array,
                     logit_lengths: jax.Array, label_lengths: jax.Array,
                     blank: int = 0,
                     reduction: str = 'mean') -> jax.Array:
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return rnnt_loss(log_probs, labels, logit_lengths, label_lengths,
                     blank, reduction)
