"""A/B testing and ensemble utilities.

Capability parity with the reference's testing/ab_testing.py:281
(ABTestRunner comparing settings variants on sample clips with quality
metrics) and processors/ensemble_sr.py:347 (run multiple SR models and
combine by voting strategy).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from framewright_tpu.config import Config

logger = logging.getLogger(__name__)


@dataclass
class ABVariant:
    name: str
    overrides: Dict


@dataclass
class ABResult:
    variant: str
    psnr: float
    ssim: float
    fps: float
    seconds: float


class ABTestRunner:
    """Run the same clip through config variants, score against a
    reference (bicubic-upscale fidelity proxy when no ground truth)."""

    def __init__(self, base_config: Config, work_dir: Path):
        self.base = base_config
        self.work_dir = Path(work_dir)

    def run(self, source: Path, variants: List[ABVariant],
            sample_frames: int = 8) -> List[ABResult]:
        from framewright_tpu.io import open_reader
        from framewright_tpu.restorer import VideoRestorer

        results = []
        for var in variants:
            cfg = self.base.with_overrides(
                project_dir=str(self.work_dir / var.name),
                validate_output=True, checkpoint_enabled=False,
                **var.overrides)
            out = self.work_dir / f"{var.name}.y4m"
            t0 = time.time()
            res = VideoRestorer(cfg).restore_video(source, output=out)
            dt = time.time() - t0
            q = res.quality
            results.append(ABResult(
                variant=var.name,
                psnr=q.psnr if q else 0.0,
                ssim=q.ssim if q else 0.0,
                fps=round(res.frames_out / dt, 2) if dt else 0.0,
                seconds=round(dt, 2),
            ))
        return results

    @staticmethod
    def winner(results: List[ABResult], metric: str = "psnr") -> ABResult:
        return max(results, key=lambda r: getattr(r, metric))


# ---------------------------------------------------------------------------
# Ensemble SR
# ---------------------------------------------------------------------------

class EnsembleSR:
    """Run several SR models on the same frames and combine
    (reference ensemble_sr.py voting strategies: weighted | median |
    max_sharpness)."""

    def __init__(self, model_names: List[str], strategy: str = "weighted",
                 weights: Optional[List[float]] = None,
                 weights_dir: Optional[str] = None,
                 compute_dtype: str = "float32"):
        from framewright_tpu.processors.super_resolution import (
            SRConfig,
            SuperResolution,
        )

        assert strategy in ("weighted", "median", "max_sharpness")
        self.strategy = strategy
        self.weights = weights or [1.0] * len(model_names)
        self.members = [
            SuperResolution(SRConfig(model_name=n, compute_dtype=compute_dtype,
                                     weights_dir=weights_dir, sharding="none"))
            for n in model_names
        ]
        self.scale = 0

    def setup(self, height: int, width: int) -> None:
        scales = set()
        for m in self.members:
            m.setup(height, width)
            scales.add(m.scale)
        if len(scales) != 1:
            from framewright_tpu.errors import ConfigError

            raise ConfigError(f"ensemble members disagree on scale: {scales}")
        self.scale = scales.pop()

    def output_size(self, height: int, width: int):
        return height * self.scale, width * self.scale

    def teardown(self) -> None:
        for m in self.members:
            m.teardown()

    def process_batch(self, frames: np.ndarray) -> np.ndarray:
        outs = np.stack([m.process_batch(frames).astype(np.float32)
                         for m in self.members])
        if self.strategy == "median":
            return np.median(outs, axis=0).astype(np.uint8)
        if self.strategy == "max_sharpness":
            # per-frame pick of the sharpest member output
            keep = []
            for b in range(outs.shape[1]):
                sharp = [self._sharpness(outs[m, b]) for m in range(len(self.members))]
                keep.append(outs[int(np.argmax(sharp)), b])
            return np.stack(keep).astype(np.uint8)
        w = np.asarray(self.weights, np.float32)[:, None, None, None, None]
        return np.clip((outs * w).sum(0) / w.sum(), 0, 255).astype(np.uint8)

    @staticmethod
    def _sharpness(frame: np.ndarray) -> float:
        g = frame.mean(-1)
        lap = (4 * g - np.roll(g, 1, 0) - np.roll(g, -1, 0)
               - np.roll(g, 1, 1) - np.roll(g, -1, 1))
        return float(lap.var())
