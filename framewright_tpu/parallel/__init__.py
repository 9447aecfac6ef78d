"""Parallel execution: device meshes, sharded frame batches, chunk queues.

TPU-native replacement for the reference's multi-GPU stack
(utils/multi_gpu.py MultiGPUDistributor work-stealing threads,
infrastructure/gpu/distributor.py plan-based distribution,
distributed/ UDP-discovery render farm — SURVEY.md §2.B): frame/scene
data parallelism becomes ``jax.sharding`` over an ICI mesh (SPMD, no
work stealing needed), and multi-host scale-out reuses jax distributed
process groups over DCN with the host-side scene-chunk queue retained.
"""

from framewright_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    frame_sharding,
    replicate,
    shard_frames,
)
