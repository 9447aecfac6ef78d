"""Frame interpolation (RIFE-class) with scene-change gating.

Reference behavior (processors/interpolation.py:132-718): interpolate
by powers of 2 to reach the target fps (factor = 2^k), skip synthesis
across scene changes (duplicate the boundary frame instead), optional
multi-pass smoothing, driven by the `rife-ncnn-vulkan` binary over a
frame directory. TPU version: the IFNet forward is jit-compiled once
and streamed pairwise; scene gating uses the pairwise detector.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

import numpy as np

from framewright_tpu.processors.base import to_float, to_uint8
from framewright_tpu.processors.scene_detection import frame_pair_scores

logger = logging.getLogger(__name__)


@dataclass
class InterpolationConfig:
    model_name: str = "rife-v4.6"
    target_fps: float = 0.0           # 0 = double the source fps
    scene_change_threshold: float = 0.30
    scene_change_skip: bool = True
    compute_dtype: str = "float32"
    batch_pairs: int = 4              # frame pairs per device step
    weights_dir: Optional[str] = None
    sharding: str = "none"            # none | data: shard the pair batch
    #                                 over the local ``frames`` mesh
    #                                 (each device synthesizes its own
    #                                 pairs' midpoints — the recipe's
    #                                 interpolate stage under BASELINE
    #                                 config 5)


@dataclass
class InterpolationResult:
    frames_in: int = 0
    frames_out: int = 0
    factor: int = 1
    scene_skips: int = 0
    output_fps: float = 0.0


def interpolation_factor(source_fps: float, target_fps: float) -> int:
    """Power-of-2 multiplier reaching >= target (reference
    interpolation.py:579-588). 0 target -> 2x."""
    if target_fps <= 0 or source_fps <= 0:
        return 2
    if target_fps <= source_fps:
        return 1
    return 2 ** math.ceil(math.log2(target_fps / source_fps))


class FrameInterpolator:
    def __init__(self, config: Optional[InterpolationConfig] = None):
        self.config = config or InterpolationConfig()
        self._fn = None
        self._params = None
        self._cfg_arch = None

    def setup(self, height: int, width: int) -> None:
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import ifnet

        cfg = self.config
        arch = ifnet.IFNetConfig()
        # weights: .npz in the pinned weights dir, else the registry
        # chain (default weights dir / packaged / ported-npz cache —
        # `models port rife-v4.6 --path flownet.pkl` lands there),
        # else seeded random (test mode)
        params = None
        if cfg.weights_dir:
            from pathlib import Path

            from framewright_tpu.models import torch_port

            npz = Path(cfg.weights_dir) / f"{cfg.model_name}.npz"
            if npz.exists():
                params = torch_port.import_npz(npz)
                params = jax.tree_util.tree_map(
                    lambda v: jnp.asarray(v) if hasattr(v, "shape") else v, params
                )
        if params is None:
            try:
                from framewright_tpu.models import registry

                spec, params = registry.init_model(
                    cfg.model_name, allow_random=False)
                arch = spec.arch_config
            except Exception:  # noqa: BLE001 — no real weights anywhere
                params = None
        if params is None:
            params = ifnet.init(jax.random.PRNGKey(0), arch)
        self._params = params
        self._cfg_arch = arch

        @jax.jit
        def run(p, a, b, t):
            return ifnet.interpolate_padded(p, a, b, t, arch)

        self._fn = run

        # pair-batch data parallelism over the local mesh: each device
        # synthesizes midpoints for its own slice of pairs (reference
        # analog utils/multi_gpu.py:549 distribute_frames; pairs are
        # independent, so no halo is needed)
        self._mesh = None
        if cfg.sharding == "data" and len(jax.devices()) > 1:
            from framewright_tpu.parallel.mesh import (
                build_mesh,
                frame_sharding,
                replicate,
            )

            self._mesh = build_mesh()
            self._pair_sharding = frame_sharding(self._mesh)
            self._params = jax.device_put(self._params,
                                          replicate(self._mesh))
            # pair batches should fill the mesh
            nf = len(self._mesh.devices.flat)
            if cfg.batch_pairs % nf:
                cfg.batch_pairs = -(-cfg.batch_pairs // nf) * nf
            logger.info("interpolation sharded over %d devices", nf)

    def _mid(self, a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
        """Synthesize frames at time t between batched pairs."""
        import jax
        import jax.numpy as jnp

        n = a.shape[0]
        if self._mesh is not None:
            from framewright_tpu.parallel.mesh import pad_batch_for_mesh

            n_pad = pad_batch_for_mesh(n, self._mesh)
            if n_pad != n:
                pad = ((0, n_pad - n), (0, 0), (0, 0), (0, 0))
                a = np.pad(a, pad, mode="edge")
                b = np.pad(b, pad, mode="edge")
            aj = jax.device_put(jnp.asarray(a), self._pair_sharding)
            bj = jax.device_put(jnp.asarray(b), self._pair_sharding)
        else:
            aj, bj = jnp.asarray(a), jnp.asarray(b)
        out = self._fn(self._params, aj, bj, t)
        return to_uint8(np.asarray(out)[:n])

    # ------------------------------------------------------------------
    def interpolate_stream(
        self,
        frames_iter: Iterator[np.ndarray],
        factor: int,
        result: Optional[InterpolationResult] = None,
    ) -> Iterator[np.ndarray]:
        """Yield interpolated stream: between each source pair, insert
        (factor-1) synthesized frames (recursive midpoints); across
        scene changes, duplicate the left frame instead."""
        cfg = self.config
        result = result or InterpolationResult()
        prev: Optional[np.ndarray] = None
        pending: List[np.ndarray] = []  # buffered left frames for batching

        def synth_between(a_batch: np.ndarray, b_batch: np.ndarray, k: int) -> List[List[np.ndarray]]:
            """k-1 in-between frames per pair via recursive midpointing;
            returns per-pair lists."""
            n = a_batch.shape[0]
            times = [i / k for i in range(1, k)]
            af = to_float(a_batch)
            bf = to_float(b_batch)
            outs: List[List[np.ndarray]] = [[] for _ in range(n)]
            for t in times:
                mids = self._mid(af, bf, t)
                for i in range(n):
                    outs[i].append(mids[i])
            return outs

        buf_a: List[np.ndarray] = []
        buf_b: List[np.ndarray] = []
        gated: List[bool] = []

        def flush():
            nonlocal buf_a, buf_b, gated
            if not buf_a:
                return []
            emitted: List[np.ndarray] = []
            a = np.stack(buf_a)
            b = np.stack(buf_b)
            need = [i for i, g in enumerate(gated) if not g]
            synth: dict = {}
            if need:
                mids = synth_between(a[need], b[need], factor)
                for j, i in enumerate(need):
                    synth[i] = mids[j]
            for i in range(len(buf_a)):
                emitted.append(buf_a[i])
                if gated[i]:
                    # scene cut: hold the left frame (reference skip)
                    emitted.extend([buf_a[i]] * (factor - 1))
                    result.scene_skips += 1
                else:
                    emitted.extend(synth[i])
            buf_a, buf_b, gated = [], [], []
            return emitted

        for frame in frames_iter:
            result.frames_in += 1
            if prev is not None:
                cut = False
                if cfg.scene_change_skip:
                    score = float(frame_pair_scores(prev[None], frame[None])[0])
                    cut = score >= cfg.scene_change_threshold
                buf_a.append(prev)
                buf_b.append(frame)
                gated.append(cut)
                if len(buf_a) >= cfg.batch_pairs:
                    for f in flush():
                        result.frames_out += 1
                        yield f
            prev = frame
        for f in flush():
            result.frames_out += 1
            yield f
        if prev is not None:
            result.frames_out += 1
            yield prev  # final frame passes through

    def interpolate_to_fps(
        self,
        frames_iter: Iterator[np.ndarray],
        source_fps: float,
    ) -> Iterator[np.ndarray]:
        factor = interpolation_factor(source_fps, self.config.target_fps)
        self.result = InterpolationResult(
            factor=factor, output_fps=source_fps * factor
        )
        if factor == 1:
            for f in frames_iter:
                self.result.frames_in += 1
                self.result.frames_out += 1
                yield f
            return
        yield from self.interpolate_stream(frames_iter, factor, self.result)
