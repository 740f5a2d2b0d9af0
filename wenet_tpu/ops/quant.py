"""Weight-only int8 quantization for serving.

Analog of the reference's quantized TorchScript export
(ref: wenet/bin/export_jit.py:39-60 — dynamic-quantized Linear for the
runtime).  Here 2D Dense kernels (and decoder embeddings) are stored
per-output-channel int8 with fp32 scales; dequantization happens inside
the jitted program, so HBM reads the int8 tensors (4× less weight
bandwidth) and XLA fuses the `convert` into the consuming matmul.
On v5e the MXU's int8 path doubles peak over bf16 for fully-quantized
matmuls; weight-only keeps accuracy effectively unchanged (per-channel
scales, symmetric).
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MIN_SIZE = 4096  # don't quantize tiny tensors (biases, norms)


def _is_quantizable(path_names, x) -> bool:
    if not hasattr(x, 'ndim') or x.ndim != 2:
        return False
    if x.size < _MIN_SIZE:
        return False
    leaf = path_names[-1]
    return leaf in ('kernel', 'embedding')


def quantize_int8(variables: Dict) -> Tuple[Dict, Dict]:
    """Split variables into (quantized-int8 pytree, fp pytree).

    Returns (qvars, meta) where qvars mirrors `variables` with
    quantizable leaves replaced by int8 arrays, and meta maps the same
    structure to per-channel fp32 scales (None for untouched leaves).
    """
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    q_leaves, s_leaves = [], []
    for keypath, x in flat:
        names = [str(getattr(k, 'key', getattr(k, 'name', k)))
                 for k in keypath]
        if _is_quantizable(names, x):
            xf = np.asarray(x, np.float32)
            scale = np.abs(xf).max(axis=0, keepdims=True) / 127.0
            scale = np.maximum(scale, 1e-10)
            q = np.clip(np.round(xf / scale), -127, 127).astype(np.int8)
            q_leaves.append(jnp.asarray(q))
            s_leaves.append(jnp.asarray(scale, jnp.float32))
        else:
            q_leaves.append(x)
            s_leaves.append(None)
    qvars = jax.tree_util.tree_unflatten(treedef, q_leaves)
    scales = jax.tree_util.tree_unflatten(
        treedef, [s if s is not None else 0 for s in s_leaves])
    return qvars, scales


def dequantize(qvars: Dict, scales: Dict, dtype=jnp.bfloat16) -> Dict:
    """Rebuild compute-dtype variables inside jit (int8 * scale)."""

    def leaf(q, s):
        if hasattr(q, 'dtype') and q.dtype == jnp.int8:
            return (q.astype(jnp.float32) * s).astype(dtype)
        if hasattr(q, 'dtype') and jnp.issubdtype(q.dtype,
                                                  jnp.floating):
            return q.astype(dtype)
        return q

    return jax.tree_util.tree_map(leaf, qvars, scales)


def quantized_bytes(variables) -> Tuple[int, int]:
    """(fp32 bytes, int8-quantized bytes) for reporting."""
    fp = q = 0
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    for keypath, x in flat:
        if not hasattr(x, 'size'):
            continue
        names = [str(getattr(k, 'key', getattr(k, 'name', k)))
                 for k in keypath]
        fp += x.size * 4
        q += x.size * (1 if _is_quantizable(names, x) else 4)
    return fp, q
