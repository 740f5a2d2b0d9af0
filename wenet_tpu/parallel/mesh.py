"""Device mesh construction + sharding helpers.

TPU-native replacement for the reference's distributed layer
(ref wenet/utils/train_utils.py:252-270 init_distributed and the
DDP/FSDP/DeepSpeed wrap at :410-488).  One `jax.sharding.Mesh` spans ICI
(within slice) and DCN (across slices); data-parallel batch sharding +
GSPMD gives bucketed all-reduce semantics without NCCL plumbing, and an
optional 'model' axis enables tensor-parallel layouts (the reference has
none — train_utils.py:241 TODO).
"""

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(mesh_shape: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh.  Default: all devices on a single 'data' axis.

    mesh_shape like {'data': 4, 'model': 2}; -1 means 'fill'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not mesh_shape:
        mesh_shape = {DATA_AXIS: n}
    axes = list(mesh_shape.keys())
    sizes = list(mesh_shape.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    assert total == n, f'mesh {dict(zip(axes, sizes))} != {n} devices'
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, sharded over 'data'.

    Single-process: a plain device_put with the NamedSharding.
    Multi-host (mesh spans processes): each host holds its LOCAL batch
    slice (the data pipeline shards by host, datapipes.shard), so the
    global array must be assembled with
    make_array_from_process_local_data — device_put against a global
    sharding would mis-treat the local rows as the whole global batch."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, s), batch)

    # Per-host pipelines pad to their own max lengths; the global
    # array's non-batch dims must agree across processes, so pad every
    # leaf up to the cross-host max first (control-plane allgather of
    # the shapes only). 'target'-like int keys pad with IGNORE_ID so
    # label lengths stay unchanged.
    from jax.experimental import multihost_utils

    def put(key, x):
        x = np.asarray(x)
        shapes = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(x.shape)))
        assert shapes[:, 0].min() == shapes[:, 0].max(), (
            'per-host batch row counts differ — use fixed batch sizes '
            'and the wenet_join guard for multi-host training')
        target = shapes.max(axis=0)
        if not np.array_equal(target, np.asarray(x.shape)):
            fill = -1 if key == 'target' else 0
            pad = [(0, int(t - c)) for c, t in zip(x.shape, target)]
            x = np.pad(x, pad, constant_values=fill)
        return jax.make_array_from_process_local_data(s, x)

    if isinstance(batch, dict):
        return {k: put(k, v) for k, v in batch.items()}
    return jax.tree_util.tree_map(lambda x: put('', x), batch)


def state_shardings(state, mesh: Mesh, shard_model_axis: bool = False,
                    min_dim: int = 512, zero2: bool = False):
    """NamedSharding pytree mirroring any state pytree.

    2D kernels (and their adam moments, which share shapes) go
    column-parallel over 'model' when enabled and divisible; everything
    else is replicated.  zero2=True additionally shards the *optimizer
    moments* (mu/nu leaves of the opt_state) over the 'data' axis —
    the optimizer-state partitioning of ZeRO-2/FSDP SHARD_GRAD_OP (ref
    train_utils.py:238-248, 280-317), at zero model-code cost via
    GSPMD."""
    has_model = MODEL_AXIS in mesh.axis_names
    msize = mesh.shape[MODEL_AXIS] if has_model else 1
    dsize = mesh.shape.get(DATA_AXIS, 1)

    if zero2:
        flat = jax.tree_util.tree_flatten_with_path(state)[0]
        treedef = jax.tree_util.tree_structure(state)
        out = []
        for keypath, x in flat:
            names = [str(getattr(k, 'name', getattr(k, 'key', k)))
                     for k in keypath]
            in_opt = any('opt_state' in n for n in names)
            is_moment = any(n in ('mu', 'nu') or ".mu" in n or
                            ".nu" in n for n in names)
            shape = getattr(x, 'shape', ())
            if (in_opt and is_moment and len(shape) >= 1
                    and shape[0] % max(dsize, 1) == 0
                    and shape[0] >= dsize and dsize > 1):
                out.append(NamedSharding(
                    mesh, P(*((DATA_AXIS,) + (None,) *
                              (len(shape) - 1)))))
            else:
                out.append(_rule_single(x, mesh, shard_model_axis,
                                        has_model, msize, min_dim))
        return jax.tree_util.tree_unflatten(treedef, out)

    def rule(x):
        return _rule_single(x, mesh, shard_model_axis, has_model,
                            msize, min_dim)

    return jax.tree_util.tree_map(rule, state)


def _rule_single(x, mesh, shard_model_axis, has_model, msize, min_dim):
    shape = getattr(x, 'shape', ())
    if (shard_model_axis and has_model and len(shape) == 2
            and shape[1] % msize == 0 and shape[1] >= min_dim):
        return NamedSharding(mesh, P(None, MODEL_AXIS))
    if (shard_model_axis and has_model and len(shape) == 3
            and shape[0] % msize == 0):
        # stacked MoE expert weights (E, D, H): expert-parallel
        # over the model axis (GSPMD turns the dense-dispatch
        # einsums into per-device expert shards + all-reduce)
        return NamedSharding(mesh, P(MODEL_AXIS, None, None))
    return replicated(mesh)
