"""Checkpoint IO: orbax-native + PyTorch reference import.

ref: wenet/utils/checkpoint.py:26-127.  Two formats:
* native: orbax pytree directories + sidecar .yaml infos (replaces the
  reference's .pt files);
* import: reference WeNet .pt state dicts are mapped name-by-name onto
  the flax variable tree (Linear->Dense transpose, NCHW->NHWC conv
  kernels, BatchNorm running stats -> batch_stats, LayerNorm weight ->
  scale, pointwise Conv1d -> Dense), satisfying the "load existing
  PyTorch checkpoints" contract.
"""

import logging
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import yaml

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# flax path -> torch key mapping
# ---------------------------------------------------------------------------
_LIST_SEG = re.compile(
    r'^(encoders0|tp_encoders|encoders|decoders3|decoders|interctc|'
    r'blocks)_(\d+)$')
_CONV_SEG = re.compile(r'^conv_(\d+)$')


def flax_path_to_torch_key(path: Tuple[str, ...]) -> Optional[str]:
    """Map a flattened flax variable path to the reference state-dict key.

    `path` includes the leading collection name ('params', 'batch_stats',
    'cmvn').  Returns None for paths with no torch counterpart."""
    collection, *segs = path
    out: List[str] = []
    for i, seg in enumerate(segs[:-1]):
        m = _LIST_SEG.match(seg)
        if m:
            out += [m.group(1), m.group(2)]
            continue
        m = _CONV_SEG.match(seg)
        if m and out and out[-1] == 'embed':
            # subsampling Sequential interleaves activations at odd idx
            out += ['conv', str(2 * int(m.group(1)))]
            continue
        if seg == 'out' and out and out[-1] == 'embed':
            out += ['out', '0']
            continue
        if seg in ('input_proj', 'channel_proj1'):
            # torch wraps these in Sequential(Linear, act) — squeezeformer
            # subsampling.py:64, branchformer cgmlp.py:149
            out += [seg, '0']
            continue
        if seg == 'norm' and out and out[-1] == 'embed':
            out += ['out', '1']  # LinearNoSubsampling LayerNorm
            continue
        if seg == 'embed' and i > 0 and segs[i - 1] in (
                'decoder', 'left_decoder', 'right_decoder'):
            out += ['embed', '0']  # decoder embedding inside Sequential
            continue
        if seg == 'pos_enc' and i > 0 and segs[i - 1] in (
                'decoder', 'left_decoder', 'right_decoder'):
            out += ['embed', '1']  # learnable PE in decoder Sequential
            continue
        if seg == 'pos_enc' and out and out[-1] == 'embed' and \
                collection == 'params':
            out[-1:] = ['embed', '1']  # learnable PE in decoder embed
            continue
        out.append(seg)
    leaf = segs[-1]
    if collection == 'batch_stats':
        leaf = {'mean': 'running_mean', 'var': 'running_var'}[leaf]
    elif collection == 'cmvn':
        pass  # mean / istd keep their names
    else:
        leaf = {'kernel': 'weight', 'scale': 'weight',
                'embedding': 'weight'}.get(leaf, leaf)
    return '.'.join(out + [leaf])


def _to_flax_leaf(torch_arr: np.ndarray, target: np.ndarray,
                  leaf_name: str, tkey: str = '') -> np.ndarray:
    """Layout conversion torch -> flax for one tensor."""
    a = np.asarray(torch_arr)
    if leaf_name == 'kernel':
        if a.ndim == 2 and target.ndim == 2:
            a = a.T  # Linear (out,in) -> (in,out)
        elif a.ndim == 3 and target.ndim == 2:
            a = a[:, :, 0].T  # pointwise Conv1d -> Dense
        elif a.ndim == 3 and target.ndim == 3:
            if 'tp_upsample_cnn' in tkey:
                # torch ConvTranspose1d (I,O,K): flax ConvTranspose
                # computes a fractionally-strided *correlation*, torch
                # the gradient-of-conv — so flip the kernel axis
                # (shape-based detection can't see this when I == O)
                t = a.transpose(2, 0, 1)[::-1]  # -> (K,I,O) flipped
            else:
                t = a.transpose(2, 1, 0)  # Conv1d (O,I,K) -> (K,I,O)
                if t.shape != target.shape:
                    t = a.transpose(2, 0, 1)[::-1]  # ConvTranspose1d
            a = t
        elif a.ndim == 4 and target.ndim == 4:
            a = a.transpose(2, 3, 1, 0)  # Conv2d OIHW -> HWIO
    if a.shape != target.shape:
        raise ValueError(
            f'shape mismatch after conversion: {a.shape} vs '
            f'{target.shape}')
    return a.astype(target.dtype)


def convert_torch_state_dict(state_dict: Dict[str, Any],
                             variables: Dict[str, Any],
                             strict: bool = False):
    """Produce a new variables pytree with tensors from `state_dict`."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    new_leaves = []
    missing, used = [], set()
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, 'key') else str(k) for k in keypath)
        tkey = flax_path_to_torch_key(path)
        if tkey is not None and tkey in state_dict:
            arr = state_dict[tkey]
            if hasattr(arr, 'numpy'):
                arr = arr.detach().cpu().numpy()
            new_leaves.append(_to_flax_leaf(arr, np.asarray(leaf),
                                            path[-1], tkey))
            used.add(tkey)
        else:
            missing.append('.'.join(path) + (f' (-> {tkey})' if tkey
                                             else ''))
            new_leaves.append(leaf)
    unexpected = [
        k for k in state_dict
        if k not in used and not k.endswith('num_batches_tracked')
        # sinusoidal position-table buffers the reference persists but we
        # recompute (learnable PEs *are* consumed above and never land
        # here); ref embedding.py registers `pe` as a buffer
        and not k.endswith('.pe')
    ]
    if missing:
        logger.warning('not found in torch ckpt: %s', missing[:20])
    if unexpected:
        logger.warning('unused torch ckpt keys: %s', unexpected[:20])
    if strict and (missing or unexpected):
        raise ValueError(f'strict load failed: missing={missing[:5]} '
                         f'unexpected={unexpected[:5]}')
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# ---------------------------------------------------------------------------
# save / load
# ---------------------------------------------------------------------------
def load_checkpoint(model, variables, path: str):
    """ref: checkpoint.py:26-57.  Returns (variables, infos)."""
    if path.endswith('.pt') or path.endswith('.pth') or \
            path.endswith('.bin') or path.endswith('.zip'):
        import torch
        if path.endswith('.zip'):
            # torchscript archive (hub 'final.zip' / export_jit
            # output): recover the weights via jit.load().state_dict()
            ts = torch.jit.load(path, map_location='cpu')
            ckpt = ts.state_dict()
        else:
            ckpt = torch.load(path, map_location='cpu',
                              weights_only=True)
        if isinstance(ckpt, dict) and 'state_dict' in ckpt:
            ckpt = ckpt['state_dict']
        # strip DDP 'module.' prefixes
        ckpt = {k.removeprefix('module.'): v for k, v in ckpt.items()}
        variables = convert_torch_state_dict(ckpt, variables)
        info_path = re.sub(r'\.(pt|pth|bin|zip)$', '.yaml', path)
    else:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        # orbax round-trips tuples as lists — graft the restored leaves
        # onto the LIVE tree structure (optax opt_states are tuples)
        treedef = jax.tree_util.tree_structure(variables)
        leaves = jax.tree_util.tree_leaves(restored)
        variables = jax.tree_util.tree_unflatten(
            treedef, [np.asarray(leaf) for leaf in leaves])
        info_path = os.path.join(path, 'infos.yaml')
        if not os.path.exists(info_path):
            info_path = path.rstrip('/') + '.yaml'
    infos = {}
    if os.path.exists(info_path):
        with open(info_path) as f:
            infos = yaml.safe_load(f) or {}
    return variables, infos


def save_checkpoint(variables, path: str, infos: Optional[dict] = None):
    """ref: checkpoint.py:60-72 (orbax directory + sidecar yaml)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(variables), force=True)
    infos = infos or {}
    with open(os.path.join(path, 'infos.yaml'), 'w') as f:
        yaml.dump(infos, f)


def filter_modules(flat_keys: List[str],
                   modules: List[str]) -> List[str]:
    """Keys matching any of the given module prefixes, AS GIVEN —
    the reference matches prefixes verbatim so 'decoder.'/'ctc.'
    partial init works too (ref: checkpoint.py:74-93)."""
    bad = [m for m in modules
           if not any(k.startswith(m) for k in flat_keys)]
    if bad:
        logger.warning(
            "module(s) %s don't match any checkpoint keys", bad)
    return [k for k in flat_keys
            if any(k.startswith(m) for m in modules)]


def load_trained_modules(model, variables, enc_init: str,
                         enc_init_mods: List[str]):
    """Partial init from a pretrained ckpt. ref: checkpoint.py:96-124."""
    import torch
    ckpt = torch.load(enc_init, map_location='cpu', weights_only=True)
    ckpt = {k.removeprefix('module.'): v for k, v in ckpt.items()}
    wanted = filter_modules(list(ckpt.keys()), enc_init_mods)
    sub = {k: v for k, v in ckpt.items() if k in wanted}
    variables = convert_torch_state_dict(sub, variables)
    return variables, {}


def _to_torch_leaf(flax_arr: np.ndarray, leaf_name: str,
                   tkey: str) -> np.ndarray:
    """Inverse of `_to_flax_leaf`: flax layout -> torch layout."""
    a = np.asarray(flax_arr)
    if leaf_name == 'kernel':
        if a.ndim == 2:
            a = a.T  # (in,out) -> Linear (out,in)
            if 'pointwise_conv' in tkey:
                a = a[:, :, None]  # Dense -> pointwise Conv1d (O,I,1)
        elif a.ndim == 3:
            if 'tp_upsample_cnn' in tkey:
                a = a[::-1].transpose(1, 2, 0)  # -> ConvTranspose1d (I,O,K)
            else:
                a = a.transpose(2, 1, 0)  # (K,I,O) -> Conv1d (O,I,K)
        elif a.ndim == 4:
            a = a.transpose(3, 2, 0, 1)  # HWIO -> Conv2d OIHW
    return a


def convert_to_torch_state_dict(variables) -> Dict[str, np.ndarray]:
    """Export flax variables as a reference-layout torch state dict.

    Inverse of `convert_torch_state_dict`: lets models trained here be
    deployed on the reference's existing libtorch/onnx runtimes (save
    with torch.save for a drop-in `.pt`)."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out: Dict[str, np.ndarray] = {}
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, 'key') else str(k) for k in keypath)
        tkey = flax_path_to_torch_key(path)
        if tkey is None:
            continue
        out[tkey] = _to_torch_leaf(np.asarray(leaf), path[-1], tkey)
    return out


def save_torch_checkpoint(variables, path: str):
    """Write a torch-loadable .pt of the reference layout."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in convert_to_torch_state_dict(variables).items()}
    torch.save(sd, path)
