"""CTC loss: optax's recursion with a tunable scan unroll factor.

Numerically identical to optax.ctc_loss (same recursion, same op
order, same log_epsilon clamping — tests/test_ctc_loss.py pins loss
and gradient equality).  Two reformulations were tried against the
trace's "4.8 ms/step serial CTC tail" and MEASURED on the chip at
flagship shapes (B=32, T=300, V=4233, N=40; fwd+grad, jit, warm):

  optax.ctc_loss                      5.75 ms
  take_along_axis emission, unroll=8  11.37 ms   <- 2x WORSE
  one-hot einsum emission, unroll=1   5.80 ms    (== optax)
  one-hot einsum emission, unroll=32  5.95 ms    (unroll never pays)

Lessons recorded: (a) replacing the (B,T,V)x(B,N,V) one-hot einsum
with a gather is a large LOSS on TPU — the gather's backward is a
scatter-add, HBM-bound, where the einsum's backward is another MXU
GEMM; (b) the scan over T is not launch-bound under XLA on TPU, so
unrolling only bloats the loop body.  The recursion itself is
inherently serial over T (no second axis to wavefront over, unlike
ops/rnnt_loss.py's T x U grid), so ~5.8 ms is the formulation's
floor here and the default below is the measured optimum
(einsum emission, unroll=1 — i.e. optax's own shape).

ref analog: none (torch ships a cuDNN kernel); semantics per
Graves et al. 2006, matching torch.nn.CTCLoss as optax does.
"""

import jax
import jax.numpy as jnp


def ctc_loss(logits: jax.Array, logit_paddings: jax.Array,
             labels: jax.Array, label_paddings: jax.Array,
             blank_id: int = 0, log_epsilon: float = -1e5,
             unroll: int = 1) -> jax.Array:
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

    # per-label emission log-probs via the one-hot einsum — an MXU GEMM
    # forward AND backward.  A take_along_axis gather reads less but
    # its backward is an HBM-bound scatter-add: measured 2x slower
    # end-to-end (see module docstring)
    one_hot_lab = jax.nn.one_hot(labels, num_classes=logits.shape[2])
    logprobs_emit = jnp.einsum('btv,bnv->btn', logprobs, one_hot_lab)
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
