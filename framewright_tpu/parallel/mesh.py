"""Device mesh construction and frame-batch sharding policies.

The reference's assignment strategies (round_robin / least_loaded /
vram_aware / weighted, utils/multi_gpu.py:780) exist because GPUs run
independent processes at different speeds. Under SPMD on a TPU mesh the
scheduler is the XLA program itself: an even layout over the ``frames``
axis is optimal by construction, and "work stealing" disappears. What
remains policy-worthy is WHICH axes to shard: frames (data parallel,
default), space (tile rows for single huge frames), or both.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from framewright_tpu.errors import ShardingError

FRAME_AXIS = "frames"
SPACE_AXIS = "space"


def build_mesh(
    mesh_shape: Tuple[int, ...] = (),
    devices: Optional[Sequence] = None,
    axis_names: Optional[Tuple[str, ...]] = None,
) -> Mesh:
    """Build a mesh over the local (or given) devices.

    () -> 1-D mesh over all devices on the ``frames`` axis.
    (a,) -> 1-D ``frames`` mesh of size a.
    (a, b) -> 2-D ``frames`` x ``space`` mesh.
    """
    devs = list(devices if devices is not None else jax.devices())
    if not mesh_shape:
        mesh_shape = (len(devs),)
    n = int(np.prod(mesh_shape))
    if n > len(devs):
        raise ShardingError(
            f"mesh_shape {mesh_shape} needs {n} devices, have {len(devs)}"
        )
    if axis_names is None:
        axis_names = (FRAME_AXIS, SPACE_AXIS)[: len(mesh_shape)]
    if len(axis_names) != len(mesh_shape):
        raise ShardingError("axis_names length must match mesh_shape")
    grid = np.asarray(devs[:n]).reshape(mesh_shape)
    return Mesh(grid, axis_names)


def frame_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for a (B, H, W, C) frame batch: B over ``frames``,
    optionally H over ``space``."""
    axes = [FRAME_AXIS, None, None, None]
    if spatial and SPACE_AXIS in mesh.axis_names:
        axes[1] = SPACE_AXIS
    return NamedSharding(mesh, P(*axes))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_frames(batch, mesh: Mesh, spatial: bool = False):
    """Place a host (B, H, W, C) array onto the mesh. B must divide by
    the frames-axis size (the ring buffer pads batches to this)."""
    sh = frame_sharding(mesh, spatial)
    nf = mesh.shape[FRAME_AXIS]
    if batch.shape[0] % nf:
        raise ShardingError(
            f"batch size {batch.shape[0]} not divisible by frames axis {nf}"
        )
    return jax.device_put(batch, sh)


def pad_batch_for_mesh(n: int, mesh: Mesh) -> int:
    """Round a batch size up to a multiple of the frames axis."""
    nf = mesh.shape[FRAME_AXIS]
    return -(-n // nf) * nf
