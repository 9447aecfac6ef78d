"""Recurrent video super-resolution processor (BasicVSR-class).

Closes the reference's temporal-SR gap (the reference pipeline runs
per-frame RealESRGAN and papers over temporal consistency separately;
SURVEY §2.D lists VSR among the model families a complete replacement
needs). Uses models/vsr.py.

Streaming design: true BasicVSR is bidirectional over the WHOLE clip —
unusable for streaming. This processor runs it per chunk with a
carried input prefix: each ``process_batch(frames)`` prepends the last
``overlap`` input frames of the previous batch, runs the recurrent
model over the (overlap + batch) window, and returns outputs for the
new frames only. Forward propagation state thus spans chunk seams
through the overlap; backward propagation sees ``overlap``-frames of
lookahead at worst. This matches how streaming deployments of
BasicVSR-family models chunk long videos.

The jitted program has a STATIC window length: short final batches are
edge-padded to the window and trimmed after — one compiled program per
resolution. uint8 in / uint8 out on device (same host-link rationale
as processors/super_resolution.py).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import numpy as np

from framewright_tpu.errors import classify_error, HBMError
from framewright_tpu.processors.base import require_shape, to_uint8

logger = logging.getLogger(__name__)

_PAD_MULT = 32  # SpyNet 6-level pyramid


@dataclass
class VSRConfig:
    model_name: str = "BasicVSR"
    chunk: int = 8                 # new frames per device step
    overlap: int = 2               # carried context frames
    compute_dtype: str = "bfloat16"
    weights_dir: Optional[str] = None
    sharding: str = "none"         # none | spatial: shard the window's
    #                                HEIGHT over a 1-D ``space`` mesh.
    #                                The recurrent time axis is a scan
    #                                (unshardable), so multi-chip VSR
    #                                splits each frame spatially and XLA
    #                                inserts conv/flow halo exchanges —
    #                                BASELINE config-5 recipe path.


class VideoSuperResolution:
    """Stateful chunked VSR. Call setup(h, w) once, then process_batch
    per consecutive frame batch (temporal order matters — callers must
    not reorder or drop frames; the restorer disables dedup for vsr)."""

    name = "video_sr"

    def __init__(self, config: Optional[VSRConfig] = None):
        self.config = config or VSRConfig()
        self.scale = 4
        self._fn = None
        self._tail: Optional[np.ndarray] = None

    def setup(self, height: int, width: int) -> None:
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models.registry import init_model

        cfg = self.config
        spec, params = init_model(
            cfg.model_name, weights_dir=cfg.weights_dir, allow_random=True)
        self.scale = spec.scale
        self._spec = spec
        self._h, self._w = height, width
        self._ph = -height % _PAD_MULT
        self._pw = -width % _PAD_MULT
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(
            cfg.compute_dtype, jnp.bfloat16)
        win = cfg.chunk + cfg.overlap
        arch = spec.arch_config

        @jax.jit
        def run(x_u8):
            x = x_u8.astype(dtype) / jnp.asarray(255.0, dtype)
            if self._ph or self._pw:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, self._ph),
                                (0, self._pw), (0, 0)), mode="edge")
            y = spec.apply_fn(params, x, arch)
            y = y[:, :, : height * self.scale, : width * self.scale, :]
            y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0)
            return jnp.floor(y * 255.0 + 0.5).astype(jnp.uint8)

        self._fn = run
        self._win = win
        self._tail = None

        # spatial sharding: H over all local devices. The padded height
        # must divide by the mesh; _PAD_MULT=32 already makes H a
        # multiple of 32, so any device count <= 32 that divides it
        # works — otherwise fall back to unsharded.
        self._mesh = None
        if cfg.sharding == "spatial" and len(jax.devices()) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from framewright_tpu.parallel.mesh import build_mesh, replicate

            nd = len(jax.devices())
            if height % nd == 0:
                self._mesh = build_mesh((nd,), axis_names=("space",))
                # window (1, T, H, W, C): shard axis 2
                self._in_sharding = NamedSharding(
                    self._mesh, P(None, None, "space"))
                params = jax.device_put(params, replicate(self._mesh))
                logger.info("VSR height-sharded over %d devices", nd)
            else:
                logger.warning(
                    "VSR spatial sharding skipped: height %d not "
                    "divisible by %d devices", height, nd)
        logger.info("VSR %s: window %d (+%d overlap), %dx%d -> %dx%d",
                    cfg.model_name, win, cfg.overlap, width, height,
                    width * self.scale, height * self.scale)

    def output_size(self, height: int, width: int):
        return height * self.scale, width * self.scale

    def dispatch(self, frames: np.ndarray):
        """Async half: build the window, update the recurrent carry,
        enqueue the device step (jax async dispatch). The restorer
        overlaps this batch's compute with the previous batch's
        device->host fetch."""
        require_shape(frames, self.name)
        if frames.dtype != np.uint8:
            frames = to_uint8(frames)
        n = frames.shape[0]
        ov = self.config.overlap
        if n > self.config.chunk:
            # caller sent a larger batch than chunk: process in slices
            outs = [self.process_batch(frames[i : i + self.config.chunk])
                    for i in range(0, n, self.config.chunk)]
            return {"out": np.concatenate(outs, axis=0)}
        if self._tail is None:
            # first chunk: edge-repeat the opening frame as context
            self._tail = np.repeat(frames[:1], ov, axis=0)
        window = np.concatenate([self._tail, frames], axis=0)
        if window.shape[0] < self._win:
            pad = np.repeat(window[-1:], self._win - window.shape[0], axis=0)
            window = np.concatenate([window, pad], axis=0)
        real = window[: ov + n]           # context + new frames (no pad)
        self._tail = real[-ov:] if ov else real[:0]
        try:
            xin = window[None]
            if self._mesh is not None:
                import jax
                import jax.numpy as jnp

                xin = jax.device_put(jnp.asarray(xin), self._in_sharding)
            y, exc = self._fn(xin), None
        except Exception as e:  # noqa: BLE001
            y, exc = None, e
        return {"y": y, "exc": exc, "n": n, "ov": ov}

    def materialize(self, handle) -> np.ndarray:
        if "out" in handle:
            return handle["out"]
        try:
            if handle["y"] is None:
                raise handle["exc"]
            y = np.asarray(handle["y"][0])
        except Exception as exc:  # noqa: BLE001
            err = classify_error(exc)
            if isinstance(err, HBMError):
                raise HBMError(
                    f"VSR window {self._win}x{self._w}x{self._h} does not "
                    f"fit HBM; lower --batch-size (chunk) or input "
                    f"resolution"
                ) from exc
            raise
        return y[handle["ov"] : handle["ov"] + handle["n"]]

    def process_batch(self, frames: np.ndarray) -> np.ndarray:
        return self.materialize(self.dispatch(frames))

    def teardown(self) -> None:
        self._fn = None
        self._tail = None
