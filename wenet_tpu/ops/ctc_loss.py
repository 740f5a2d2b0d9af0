"""CTC loss with an UNROLLED alpha recursion.

Numerically identical to optax.ctc_loss (same recursion, same op
order, same log_epsilon clamping — tests/test_ctc_loss.py pins loss
and gradient equality) but ~launch-overhead-free: optax scans T steps
one at a time, and at flagship shapes (T'≈374, per-step work a few
(B, N) logaddexps) the device executes ~374 serial micro-kernels —
the profiler attributed 4.8 ms/step (9%) of the training step to this
serial tail (BENCH_NOTES trace table).  `unroll=K` makes XLA fuse K
recursion steps into each launched kernel: the math stays sequential
(the recursion is inherently serial over T — there is no wavefront
over a second axis like ops/rnnt_loss.py exploits for the T×U RNNT
grid) but the launch count drops K-fold.

The (B,T,V)x(B,N,V) one-hot einsum optax uses to gather per-label
log-probs is replaced by take_along_axis — identical values (the
einsum only ever adds exact zeros), no V-sized contraction.

ref analog: none (torch ships a cuDNN kernel); semantics per
Graves et al. 2006, matching torch.nn.CTCLoss as optax does.
"""

import jax
import jax.numpy as jnp


def ctc_loss(logits: jax.Array, logit_paddings: jax.Array,
             labels: jax.Array, label_paddings: jax.Array,
             blank_id: int = 0, log_epsilon: float = -1e5,
             unroll: int = 8) -> jax.Array:
    """Per-sequence CTC loss, (B,).  Same contract as optax.ctc_loss:
    logits (B, T, V); paddings 1.0 at padded positions; labels (B, N)
    right-padded."""
    batchsize, _, _ = logits.shape
    _, maxlabellen = labels.shape

    logprobs = jax.nn.log_softmax(logits)
    labellens = maxlabellen - jnp.sum(label_paddings, axis=1).astype(
        jnp.int32)

    # repeat[b, n] == 1.0 when label[b, n] == label[b, n+1]
    repeat = (labels[:, :-1] == labels[:, 1:]).astype(jnp.float32)
    repeat = jnp.pad(repeat, ((0, 0), (0, 1)))

    logprobs_phi = logprobs[:, :, blank_id:blank_id + 1]  # (B, T, 1)
    logprobs_phi = jnp.transpose(logprobs_phi, (1, 0, 2))  # (T, B, 1)

    # per-label emission log-probs via gather (optax: one-hot einsum;
    # identical values — the einsum's extra terms are exact zeros)
    logprobs_emit = jnp.take_along_axis(
        logprobs, labels[:, None, :].astype(jnp.int32), axis=2)
    logprobs_emit = jnp.transpose(logprobs_emit, (1, 0, 2))  # (T, B, N)

    logalpha_phi_init = jnp.full((batchsize, maxlabellen + 1),
                                 log_epsilon)
    logalpha_phi_init = logalpha_phi_init.at[:, 0].set(0.0)
    logalpha_emit_init = jnp.full((batchsize, maxlabellen), log_epsilon)

    def update_phi_score(phi, added_score):
        return jnp.concatenate(
            [phi[:, :1], jnp.logaddexp(phi[:, 1:], added_score)],
            axis=-1)

    def loop_body(prev, x):
        prev_phi, prev_emit = prev
        prev_phi_orig = prev_phi
        prev_phi = update_phi_score(
            prev_phi, prev_emit + log_epsilon * repeat)

        logprob_emit, logprob_phi, pad = x

        next_emit = jnp.logaddexp(
            prev_phi[:, :-1] + logprob_emit, prev_emit + logprob_emit)
        next_phi = prev_phi + logprob_phi
        next_phi = update_phi_score(
            next_phi,
            prev_emit + logprob_phi + log_epsilon * (1.0 - repeat))

        pad = pad.reshape((batchsize, 1))
        next_emit = pad * prev_emit + (1.0 - pad) * next_emit
        next_phi = pad * prev_phi_orig + (1.0 - pad) * next_phi
        return (next_phi, next_emit), None

    xs = (logprobs_emit, logprobs_phi,
          logit_paddings.transpose((1, 0)))
    (logalpha_phi_last, logalpha_emit_last), _ = jax.lax.scan(
        loop_body, (logalpha_phi_init, logalpha_emit_init), xs,
        unroll=unroll)

    # final epsilon transition
    logalpha_phi_last = update_phi_score(logalpha_phi_last,
                                         logalpha_emit_last)

    one_hot = jax.nn.one_hot(labellens, num_classes=maxlabellen + 1)
    return -jnp.einsum('bn,bn->b', logalpha_phi_last, one_hot)
