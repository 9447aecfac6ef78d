"""Runtime safeguards: disk, host memory, and HBM monitors.

Capability parity with the reference's protection layer
(utils/disk.py:243 disk monitor, utils/thermal_monitor.py:112 thermal
tiers with auto batch reduction, workflow/processing_safeguards.py:146
preflight checks, utils/power_manager.py keep-awake). GPU thermal
throttling has no TPU analog visible to the host; the equivalent
pressure signals here are HBM headroom, host RAM, and disk — each
emitting events the pipeline reacts to (batch downshift, pause).
"""

from __future__ import annotations

import logging
import shutil
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional

from framewright_tpu.events import EventBus, EventType

logger = logging.getLogger(__name__)


@dataclass
class DiskStatus:
    free_gb: float
    total_gb: float
    ok: bool
    critical: bool


class DiskSpaceMonitor:
    """Checked between batches (the reference checks every 100 frames,
    restorer.py:1770)."""

    def __init__(self, path: Path, min_free_gb: float = 2.0,
                 critical_free_gb: float = 0.5,
                 events: Optional[EventBus] = None):
        self.path = Path(path)
        self.min_free_gb = min_free_gb
        self.critical_free_gb = critical_free_gb
        self.events = events

    def check(self) -> DiskStatus:
        usage = shutil.disk_usage(self.path if self.path.exists() else self.path.parent)
        free_gb = usage.free / 2**30
        status = DiskStatus(
            free_gb=round(free_gb, 2),
            total_gb=round(usage.total / 2**30, 2),
            ok=free_gb >= self.min_free_gb,
            critical=free_gb < self.critical_free_gb,
        )
        if not status.ok and self.events:
            self.events.emit(EventType.DISK_SPACE_LOW, free_gb=status.free_gb)
        return status

    def estimate_output_gb(self, width: int, height: int, frames: int,
                           container: str = "y4m") -> float:
        """Output-size preflight (reference ~10GB/min PNG figure;
        y4m = 1.5 B/px)."""
        px = width * height * frames
        per_px = {"y4m": 1.5, "png": 3.0, "mp4": 0.15}.get(container, 1.5)
        return px * per_px / 2**30


class HostMemoryMonitor:
    def __init__(self, min_free_gb: float = 1.0,
                 events: Optional[EventBus] = None):
        self.min_free_gb = min_free_gb
        self.events = events

    def check(self) -> Dict:
        import psutil

        vm = psutil.virtual_memory()
        free_gb = vm.available / 2**30
        ok = free_gb >= self.min_free_gb
        if not ok and self.events:
            self.events.emit(EventType.HOST_MEMORY_LOW, free_gb=round(free_gb, 2))
        return {"free_gb": round(free_gb, 2), "percent": vm.percent, "ok": ok}


class HBMMonitor:
    """Device-memory pressure (the VRAMMonitor analog,
    restorer.py:362-392): samples jax memory_stats and emits
    HBM_PRESSURE above a utilization threshold."""

    def __init__(self, threshold: float = 0.92,
                 events: Optional[EventBus] = None):
        self.threshold = threshold
        self.events = events
        self.samples: List[float] = []

    def check(self) -> Dict:
        import jax

        dev = jax.devices()[0]
        try:
            stats = dev.memory_stats() or {}
        except Exception:  # noqa: BLE001
            stats = {}
        limit = int(stats.get("bytes_limit", 0))
        used = int(stats.get("bytes_in_use", 0))
        util = used / limit if limit else 0.0
        self.samples.append(util)
        if len(self.samples) > 1000:
            self.samples = self.samples[-1000:]
        if util > self.threshold and self.events:
            self.events.emit(EventType.HBM_PRESSURE, utilization=round(util, 3))
        return {"utilization": round(util, 3),
                "used_gb": round(used / 2**30, 2),
                "limit_gb": round(limit / 2**30, 2),
                "ok": util <= self.threshold}

    @property
    def peak(self) -> float:
        return max(self.samples) if self.samples else 0.0


@dataclass
class PreflightResult:
    ok: bool = True
    blockers: List[str] = field(default_factory=list)
    warnings: List[str] = field(default_factory=list)

    def to_dict(self) -> Dict:
        return {"ok": self.ok, "blockers": self.blockers, "warnings": self.warnings}


def preflight_check(config, source: Path,
                    meta=None) -> PreflightResult:
    """System preflight before a job (reference
    workflow/processing_safeguards.py:146 + restorer preflight)."""
    res = PreflightResult()
    source = Path(source)
    if not source.exists():
        res.blockers.append(f"source not found: {source}")
    # disk: need room for the output
    mon = DiskSpaceMonitor(config.project_dir)
    try:
        status = mon.check()
        if meta is not None:
            need = mon.estimate_output_gb(
                meta.width * config.scale_factor,
                meta.height * config.scale_factor,
                meta.nb_frames,
                "y4m" if config.output_format in ("auto", "y4m") else "mp4",
            )
            if need > status.free_gb:
                res.blockers.append(
                    f"insufficient disk: need ~{need:.1f} GB, have {status.free_gb:.1f} GB")
            elif need > status.free_gb * 0.5:
                res.warnings.append(
                    f"output (~{need:.1f} GB) will use >50% of free disk")
        elif not status.ok:
            res.warnings.append(f"low disk: {status.free_gb:.1f} GB free")
    except OSError as exc:
        res.warnings.append(f"disk check failed: {exc}")
    # device
    from framewright_tpu.hw import detect_hardware

    hw = detect_hardware()
    if hw.platform != "tpu" and not config.allow_cpu_fallback:
        res.blockers.append("no TPU available and allow_cpu_fallback=False")
    elif hw.platform != "tpu":
        res.warnings.append("running on CPU: expect low throughput")
    # weights
    if config.sr_model != "none" and config.scale_factor > 1:
        from framewright_tpu.models.registry import default_weights_dir

        wdir = default_weights_dir()
        if not ((wdir / f"{config.sr_model}.npz").exists()
                or (wdir / f"{config.sr_model}.pth").exists()):
            res.warnings.append(
                f"no weights for {config.sr_model} in {wdir}: random init "
                "(output will not be enhanced)")
    res.ok = not res.blockers
    return res


class KeepAwake:
    """Prevent system sleep for the duration of a long job (the
    reference's power manager, utils/power_manager.py:35 keep-awake).

    Context manager: holds a ``systemd-inhibit`` (Linux) or
    ``caffeinate`` (macOS) child for the scope; silently a no-op when
    neither tool exists (headless servers rarely sleep anyway).
    """

    def __init__(self, why: str = "framewright restore in progress"):
        self.why = why
        self._proc = None

    def __enter__(self) -> "KeepAwake":
        import subprocess
        import sys

        inhibit = shutil.which("systemd-inhibit")
        caffeinate = shutil.which("caffeinate")
        if sys.platform.startswith("linux") and inhibit:
            cmd = [inhibit, "--what=sleep:idle",
                   f"--why={self.why}", "sleep", "infinity"]
        elif sys.platform == "darwin" and caffeinate:
            cmd = [caffeinate, "-i"]
        else:
            return self
        try:
            self._proc = subprocess.Popen(
                cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        except OSError:
            self._proc = None
        return self

    def __exit__(self, *exc) -> None:
        if self._proc is not None:
            self._proc.terminate()
            try:
                self._proc.wait(timeout=2)
            except Exception:  # noqa: BLE001
                self._proc.kill()
            self._proc = None


class SafeguardLoop:
    """Background monitor thread emitting pressure events
    (the thermal-monitor analog)."""

    def __init__(self, project_dir: Path, events: EventBus,
                 interval_s: float = 5.0):
        self.disk = DiskSpaceMonitor(project_dir, events=events)
        self.mem = HostMemoryMonitor(events=events)
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="fw-safeguards")
        self._thread.start()

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                self.disk.check()
                self.mem.check()
            except Exception:  # noqa: BLE001
                logger.exception("safeguard check failed")

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
