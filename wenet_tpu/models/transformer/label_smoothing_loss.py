"""Label smoothing KL loss. ref: wenet/models/transformer/label_smoothing_loss.py:21-106.

Pure function: no scatter into a dense true-dist tensor — the KL against
the smoothed one-hot reduces to
    sum_v p(v) * (log p(v) - log q(v))
with p = smoothed one-hot, computed directly from logits.
"""

import jax
import jax.numpy as jnp


def label_smoothing_loss(logits: jax.Array,
                         target: jax.Array,
                         size: int,
                         padding_idx: int,
                         smoothing: float,
                         normalize_length: bool = False,
                         num_valid=None) -> jax.Array:
    """logits: (B, L, V); target: (B, L) with padding_idx pads.

    num_valid: optional scalar count of real (non-dummy) rows — replaces
    B as the denominator when normalize_length=False, so ragged-tail
    padding rows (executor.py) don't deflate the loss."""
    B = logits.shape[0]
    confidence = 1.0 - smoothing
    low = smoothing / (size - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ignore = target == padding_idx
    tgt = jnp.where(ignore, 0, target)
    # KL(p || q) with p the smoothed one-hot; constant entropy term of p
    # is included to match torch.nn.KLDivLoss exactly.
    logp_true = jnp.take_along_axis(logp, tgt[..., None],
                                    axis=-1).squeeze(-1)
    sum_logp = jnp.sum(logp, axis=-1)
    cross = -(confidence * logp_true + low * (sum_logp - logp_true))
    # entropy of p (same for every position, fully static): sum p log p
    import math
    ent = (confidence * math.log(confidence) if confidence > 0 else 0.0)
    ent += ((size - 1) * low * math.log(low) if low > 0 else 0.0)
    kl = cross + ent
    kl = jnp.where(ignore, 0.0, kl)
    total = jnp.maximum(jnp.sum(~ignore), 1)
    if normalize_length:
        denom = total
    elif num_valid is not None:
        denom = jnp.maximum(num_valid, 1)
    else:
        denom = B
    return jnp.sum(kl) / denom
