"""Processor protocol and shared plumbing.

Reference idiom: each processor is a class with a Config dataclass and
a Result dataclass and a process method over a frame directory
(e.g. processors/enhancement/super_resolution.py:85). TPU-native
version: processors transform (B, H, W, 3) float32 [0,1] numpy/jax
frame batches; the orchestrator moves batches between processors
without touching disk, spilling only at checkpoints.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, Optional

import numpy as np

from framewright_tpu.errors import StageError


@dataclass
class ProcessorResult:
    """Common result envelope (analog of the reference's per-processor
    Result dataclasses)."""

    name: str
    frames_processed: int = 0
    duration_s: float = 0.0
    metrics: Dict[str, Any] = field(default_factory=dict)
    errors: int = 0

    @property
    def fps(self) -> float:
        return self.frames_processed / self.duration_s if self.duration_s > 0 else 0.0


class FrameProcessor:
    """Base class: stateless per-batch frame transform.

    Subclasses implement ``process_batch`` (uint8/float frames in,
    same out, possibly resized) and may override ``output_size`` and
    ``setup``/``teardown`` for weights and compiled functions.
    """

    #: processor name used in pipelines/checkpoints/events
    name: str = "base"
    #: scale factor this processor applies to frame dims (1 = none)
    scale: int = 1
    #: fps multiplier (interpolators change the frame count)
    fps_factor: float = 1.0

    def setup(self, height: int, width: int) -> None:
        """Called once with input dims before the first batch (compile,
        plan tiles, load weights)."""

    def process_batch(self, frames: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 -> (B, H*scale, W*scale, 3) uint8."""
        raise NotImplementedError

    def output_size(self, height: int, width: int):
        return height * self.scale, width * self.scale

    def teardown(self) -> None:
        pass

    # ------------------------------------------------------------------
    def process_video(self, frames_iter: Iterator[np.ndarray],
                      batch_size: int = 8) -> Iterator[np.ndarray]:
        """Stream frames through this processor (test/standalone use;
        the orchestrator drives process_batch directly)."""
        buf: list = []
        started = False
        for f in frames_iter:
            if not started:
                self.setup(f.shape[0], f.shape[1])
                started = True
            buf.append(f)
            if len(buf) == batch_size:
                out = self.process_batch(np.stack(buf))
                for i in range(out.shape[0]):
                    yield out[i]
                buf = []
        if buf:
            out = self.process_batch(np.stack(buf))
            for i in range(out.shape[0]):
                yield out[i]
        self.teardown()


def to_float(frames: np.ndarray):
    """uint8 (B,H,W,3) -> float32 [0,1]."""
    if frames.dtype == np.uint8:
        return frames.astype(np.float32) / 255.0
    return frames.astype(np.float32)


def to_uint8(frames) -> np.ndarray:
    """float [0,1] (numpy or device array) -> uint8, rounding like the
    reference's PNG writeback (clip then round-half-away)."""
    arr = np.asarray(frames, dtype=np.float32)
    return np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)


def require_shape(frames: np.ndarray, stage: str) -> None:
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise StageError(
            f"expected (B, H, W, 3) frames, got {frames.shape}", stage=stage
        )


class Timer:
    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.dt = time.time() - self.t0
