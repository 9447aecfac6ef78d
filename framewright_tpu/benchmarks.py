"""Benchmark suite and performance profiler.

Capability parity with the reference's harness
(benchmarks/benchmark_suite.py:645-1127: BenchmarkRunner +
StandardTestSuite {720p->1080p 100f, 1080p->4K 50f, 24->60fps 100f,
combined 50f} x3 iterations with TestVideoGenerator/ResourceMonitor;
benchmarks/profiler.py:156-452: per-stage wall time + resource sampling
thread). Device-time accounting replaces nvidia-smi polls.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Profiler
# ---------------------------------------------------------------------------

@dataclass
class StageProfile:
    name: str
    wall_s: float = 0.0
    calls: int = 0
    frames: int = 0
    host_mem_peak_mb: float = 0.0

    @property
    def fps(self) -> float:
        return self.frames / self.wall_s if self.wall_s > 0 else 0.0


class PerformanceProfiler:
    """Per-stage timing + background host-resource sampling."""

    def __init__(self, sample_interval: float = 0.5):
        self.stages: Dict[str, StageProfile] = {}
        self.sample_interval = sample_interval
        self._samples: List[Dict] = []
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._t0 = time.time()

    def start_monitor(self) -> None:
        self._thread = threading.Thread(target=self._sample_loop, daemon=True)
        self._thread.start()

    def stop_monitor(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)

    def _sample_loop(self) -> None:
        try:
            import psutil

            proc = psutil.Process()
        except Exception:  # noqa: BLE001
            return
        while not self._stop.wait(self.sample_interval):
            self._samples.append({
                "ts": time.time() - self._t0,
                "cpu_pct": proc.cpu_percent(),
                "rss_mb": proc.memory_info().rss / 2**20,
            })

    class _StageCtx:
        def __init__(self, profiler, name, frames):
            self.profiler, self.name, self.frames = profiler, name, frames

        def __enter__(self):
            self.t0 = time.time()
            return self

        def __exit__(self, *exc):
            p = self.profiler.stages.setdefault(self.name, StageProfile(self.name))
            p.wall_s += time.time() - self.t0
            p.calls += 1
            p.frames += self.frames
            if self.profiler._samples:
                p.host_mem_peak_mb = max(
                    p.host_mem_peak_mb,
                    max(s["rss_mb"] for s in self.profiler._samples[-10:]),
                )

    def stage(self, name: str, frames: int = 0) -> "_StageCtx":
        return self._StageCtx(self, name, frames)

    def report(self) -> Dict:
        total = sum(p.wall_s for p in self.stages.values())
        return {
            "total_s": round(total, 3),
            "stages": [
                {
                    "name": p.name, "wall_s": round(p.wall_s, 3),
                    "pct": round(100 * p.wall_s / total, 1) if total else 0,
                    "calls": p.calls, "fps": round(p.fps, 2),
                }
                for p in sorted(self.stages.values(), key=lambda s: -s.wall_s)
            ],
            "host_samples": len(self._samples),
        }


def device_flops_per_second(fn: Callable, args, flops: int, reps: int = 10) -> float:
    """Measured device throughput for a jitted fn (MFU accounting)."""
    import jax

    y = fn(*args)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(reps):
        y = fn(*args)
    jax.block_until_ready(y)
    return flops * reps / (time.time() - t0)


# ---------------------------------------------------------------------------
# Benchmark suite
# ---------------------------------------------------------------------------

@dataclass
class BenchmarkCase:
    name: str
    width: int
    height: int
    frames: int
    scale: int = 2
    model: str = "realesr-general-x4v3"
    interpolate: bool = False
    target_fps: float = 0.0


def standard_suite(tiny: bool = False) -> List[BenchmarkCase]:
    """The reference's standard definitions (benchmark_suite.py:
    1081-1127), with a tiny CI variant."""
    if tiny:
        return [
            BenchmarkCase("sr_tiny", 64, 48, 8, scale=4, model="realesr-animevideov3"),
            BenchmarkCase("interp_tiny", 64, 48, 8, interpolate=True, target_fps=48),
        ]
    return [
        BenchmarkCase("720p_to_1080p", 1280, 720, 100, scale=2,
                      model="RealESRGAN_x2plus"),
        BenchmarkCase("1080p_to_4k", 1920, 1080, 50, scale=2,
                      model="RealESRGAN_x2plus"),
        BenchmarkCase("24_to_60fps", 1280, 720, 100, scale=1,
                      interpolate=True, target_fps=60),
        BenchmarkCase("combined", 1280, 720, 50, scale=2,
                      model="RealESRGAN_x2plus", interpolate=True, target_fps=60),
    ]


@dataclass
class BenchmarkResult:
    case: str
    fps: float
    seconds: float
    frames: int
    iterations: int


class TestVideoGenerator:
    """Synthetic clip generator (reference TestVideoGenerator)."""

    @staticmethod
    def generate(path: Path, width: int, height: int, frames: int,
                 fps: float = 24.0, seed: int = 0) -> Path:
        from framewright_tpu.io.y4m import Y4MWriter

        rng = np.random.default_rng(seed)
        base = rng.integers(0, 256, (height, width * 2), dtype=np.uint8)
        with Y4MWriter(path, width, height, fps=fps) as w:
            for t in range(frames):
                sh = (t * 3) % width
                frame = np.stack([base[:, sh:sh + width]] * 3, -1)
                w.write_frame(np.ascontiguousarray(frame))
        return path


class BenchmarkRunner:
    def __init__(self, work_dir: Path, iterations: int = 3,
                 compute_dtype: str = "bfloat16", device: str = "auto"):
        self.work_dir = Path(work_dir)
        self.iterations = iterations
        self.compute_dtype = compute_dtype
        self.device = device

    def run_case(self, case: BenchmarkCase) -> BenchmarkResult:
        from framewright_tpu.config import Config
        from framewright_tpu.restorer import VideoRestorer

        self.work_dir.mkdir(parents=True, exist_ok=True)
        clip = self.work_dir / f"{case.name}.y4m"
        if not clip.exists():
            TestVideoGenerator.generate(clip, case.width, case.height, case.frames)
        times = []
        frames_out = 0
        for i in range(self.iterations):
            cfg = Config(
                project_dir=self.work_dir / f"{case.name}_run{i}",
                scale_factor=case.scale,
                sr_model=case.model if case.scale > 1 else "none",
                compute_dtype=self.compute_dtype,
                interpolation=case.interpolate,
                target_fps=case.target_fps,
                device_platform=self.device,
                validate_output=False, checkpoint_enabled=False,
            )
            t0 = time.time()
            res = VideoRestorer(cfg).restore_video(
                clip, output=self.work_dir / f"{case.name}_out{i}.y4m")
            times.append(time.time() - t0)
            frames_out = res.frames_out
        best = min(times)
        return BenchmarkResult(
            case=case.name, fps=round(frames_out / best, 3),
            seconds=round(best, 3), frames=frames_out,
            iterations=self.iterations,
        )

    def run_suite(self, cases: Optional[List[BenchmarkCase]] = None) -> List[BenchmarkResult]:
        cases = cases or standard_suite()
        results = []
        for case in cases:
            logger.info("benchmark: %s", case.name)
            results.append(self.run_case(case))
        return results

    @staticmethod
    def save_results(results: List[BenchmarkResult], path: Path) -> None:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps([r.__dict__ for r in results], indent=2))
