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
    """Place a host batch dict onto the mesh, sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def param_sharding_rules(params, mesh: Mesh,
                         shard_model_axis: bool = False):
    """Sharding tree for params.

    Default: full replication (ASR models are small: <=130M params).
    With shard_model_axis=True, large 2D kernels are split over 'model'
    along their output dim (megatron column style) when divisible —
    a free win via GSPMD for the larger whisper-scale models."""
    if not shard_model_axis or MODEL_AXIS not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)
    msize = mesh.shape[MODEL_AXIS]

    def rule(x):
        if x.ndim == 2 and x.shape[1] % msize == 0 and x.shape[1] >= 1024:
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        return replicated(mesh)

    return jax.tree_util.tree_map(rule, params)


def state_shardings(state, mesh: Mesh, shard_model_axis: bool = False,
                    min_dim: int = 512):
    """NamedSharding pytree mirroring any state pytree.

    2D kernels (and their adam moments, which share shapes) go
    column-parallel over 'model' when enabled and divisible; everything
    else is replicated."""
    has_model = MODEL_AXIS in mesh.axis_names
    msize = mesh.shape[MODEL_AXIS] if has_model else 1

    def rule(x):
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

    return jax.tree_util.tree_map(rule, state)
