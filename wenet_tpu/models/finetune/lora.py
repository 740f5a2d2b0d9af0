"""LoRA fine-tuning. ref: wenet/models/finetune/lora/{layers.py:16-340, utils.py:41-200}.

The reference swaps nn.Linear instances inside attention for LoRA
variants after construction (inject_lora_to_model, utils.py:41).  linen
modules are frozen, so injection happens at *construction*: init_model
activates a `lora_scope` and the attention layers build LoRADense (same
param paths as Dense + lora_A/lora_B) for the selected projections.
Trainability masking is an optax.masked transform over param paths;
merging folds BA into the kernel for export/eval.
"""

from contextlib import contextmanager
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from wenet_tpu.ops.dropout import Dropout
_ACTIVE: Optional[dict] = None


@contextmanager
def lora_scope(conf: Optional[dict]):
    """conf: {'lora_rank', 'lora_alpha', 'lora_dropout', 'lora_list'}."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = conf
    try:
        yield
    finally:
        _ACTIVE = prev


def active_lora() -> Optional[dict]:
    return _ACTIVE


class LoRADense(nn.Module):
    """Dense + rank-r update (B @ A), scaled alpha/r.

    ref: layers.py:103-172 (Linear)."""
    features: int
    use_bias: bool = True
    r: int = 8
    alpha: int = 8
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_dim = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (in_dim, self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(x.dtype)
        if self.r > 0:
            # torch layout: lora_A (r, in), lora_B (out, r)
            lora_A = self.param('lora_A',
                                nn.initializers.kaiming_uniform(),
                                (self.r, in_dim))
            lora_B = self.param('lora_B', nn.initializers.zeros,
                                (self.features, self.r))
            scaling = self.alpha / self.r
            xd = Dropout(self.dropout)(x, deterministic=deterministic)
            y = y + (xd @ lora_A.T.astype(x.dtype)) @ \
                lora_B.T.astype(x.dtype) * scaling
        return y


def make_attention_dense(features: int, use_bias: bool, name: str,
                         key: str, conf: Optional[dict] = None):
    """Dense or LoRADense depending on the lora conf.

    key in {'q','k','v','o'} (ref train_utils.py:119-177 lora_list)."""
    if conf is None:
        conf = active_lora()
    if conf and conf.get('lora_rank', 0) > 0 and \
            key in conf.get('lora_list', ('o', 'q', 'k', 'v')):
        return LoRADense(features=features, use_bias=use_bias,
                         r=conf['lora_rank'],
                         alpha=conf.get('lora_alpha', conf['lora_rank']),
                         dropout=conf.get('lora_dropout', 0.0),
                         name=name)
    return nn.Dense(features, use_bias=use_bias, name=name)


def lora_param_mask(params) -> Any:
    """True for LoRA params (trainable), False otherwise."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for keypath, _ in flat:
        path = [k.key if hasattr(k, 'key') else str(k) for k in keypath]
        leaves.append(any(p.startswith('lora_') for p in path))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def mark_only_lora_as_trainable(tx: optax.GradientTransformation,
                                params) -> optax.GradientTransformation:
    """ref: utils.py mark_only_lora_as_trainable."""
    mask = lora_param_mask(params)
    frozen_mask = jax.tree_util.tree_map(lambda m: not m, mask)
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(), frozen_mask),
    )


def merge_lora(params, alpha: Optional[float] = None):
    """Fold B@A * (alpha/r) into kernels (eval/export) — the same
    scaling LoRADense applies at runtime; merging without it halves
    the update whenever alpha != r. ref: layers.py:147-163.

    alpha: lora_alpha used at injection time; defaults to r (scale 1)."""

    def merge(tree):
        if not isinstance(tree, dict):
            return tree
        if 'lora_A' in tree and 'kernel' in tree:
            A = tree['lora_A']  # (r, in)
            B = tree['lora_B']  # (out, r)
            r = A.shape[0]
            scaling = (alpha if alpha is not None else r) / r
            new = dict(tree)
            new['kernel'] = tree['kernel'] + scaling * (B @ A).T
            new['lora_A'] = jnp.zeros_like(A)
            new['lora_B'] = jnp.zeros_like(B)
            return new
        return {k: merge(v) for k, v in tree.items()}

    return merge(params)


def estimate_gradient(model, variables, batches, rng=None):
    """Average loss gradient over a few batches (LoRA-GA probe).

    ref: finetune/lora/utils.py:116-155 (estimate_gradient).  Returns a
    params-shaped pytree of mean gradients; only 'kernel' leaves of
    LoRA-wrapped denses are consumed by `reinit_lora`."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def loss_fn(params, batch):
        variables_ = {**variables, 'params': params}
        out = model.apply(variables_, batch['feats'],
                          batch['feats_lengths'], batch['target'],
                          batch['target_lengths'],
                          rngs={'dropout': rng, 'chunk': rng})
        loss = out['loss'] if isinstance(out, dict) else out[0]['loss']
        return jnp.asarray(loss, jnp.float32)

    grad_fn = jax.jit(jax.grad(loss_fn))
    acc = None
    n = 0
    for batch in batches:
        g = grad_fn(variables['params'], batch)
        acc = g if acc is None else jax.tree_util.tree_map(
            jnp.add, acc, g)
        n += 1
    assert n > 0, 'estimate_gradient needs at least one batch'
    return jax.tree_util.tree_map(lambda x: x / n, acc)


def reinit_lora(params, grads=None, init_type: str = 'gradient',
                stable_gamma: float = 16.0, rng=None,
                alpha: Optional[float] = None):
    """Re-initialize lora_A/lora_B, LoRA-GA style.

    ref: finetune/lora/utils.py:157-214 (reinit_lora_modules).
    init_type:
      'gradient' — SVD of the accumulated base-kernel gradient: A gets
        the top-r right singular vectors, B the next r left singular
        vectors, both scaled by 1/sqrt(stable_gamma); the kernel is
        compensated by -(B@A)^T so the initial function is unchanged.
      'gaussian' — kaiming A, zero B (the default linen init).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def walk(p, g, key):
        if not isinstance(p, dict):
            return p
        if 'lora_A' in p and 'kernel' in p:
            A, B = p['lora_A'], p['lora_B']
            r = A.shape[0]
            new = dict(p)
            if init_type == 'gradient':
                assert g is not None and 'kernel' in g, \
                    'gradient init needs estimate_gradient output'
                Gt = g['kernel'].T  # torch layout (out, in)
                U, S, Vh = jnp.linalg.svd(Gt, full_matrices=False)
                scale = 1.0 / jnp.sqrt(stable_gamma)
                newA = Vh[:r] * scale
                newB = U[:, r:2 * r] * scale
                new['lora_A'] = newA.astype(A.dtype)
                new['lora_B'] = newB.astype(B.dtype)
                # keep f(x) unchanged at init (LoRA-GA offsets W by
                # the SAME scaled update the forward adds)
                scaling = (alpha if alpha is not None else r) / r
                new['kernel'] = p['kernel'] - scaling * (
                    newB @ newA).T.astype(p['kernel'].dtype)
            else:
                k1, _ = jax.random.split(jax.random.fold_in(rng, key[0]))
                new['lora_A'] = nn.initializers.kaiming_uniform()(
                    k1, A.shape, A.dtype)
                new['lora_B'] = jnp.zeros_like(B)
            return new
        return {k: walk(v, g.get(k) if isinstance(g, dict) else None,
                        key + (hash(k),))
                for k, v in p.items()}

    return walk(params, grads or {}, (0,))
