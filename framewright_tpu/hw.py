"""Hardware detection and tiers.

Analog of the reference's GPU detector + hardware report
(infrastructure/gpu/detector.py:49-93, hardware.py:111-328) collapsed
to the XLA device model: platform (tpu/cpu), chip count, HBM capacity
(from live memory_stats when available, else known per-generation
sizes), and a tier the preset selector keys off.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional

logger = logging.getLogger(__name__)

# Known HBM per chip (bytes) by device-kind substring, for when
# memory_stats() is unavailable (e.g. CPU simulation of a TPU plan).
_KNOWN_HBM = {
    "v6": 32 * 2**30,
    "v5p": 95 * 2**30,
    "v5 lite": 16 * 2**30,
    "v5e": 16 * 2**30,
    "v4": 32 * 2**30,
    "v3": 16 * 2**30,
    "v2": 8 * 2**30,
}

# Peak bf16 matmul throughput (FLOP/s) by device kind — used by the
# planner's roofline estimates and the profiler's MFU accounting.
_KNOWN_PEAK_BF16 = {
    "v6": 918e12,
    "v5p": 459e12,
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v4": 275e12,
    "v3": 123e12,
    "v2": 46e12,
}


class HardwareTier(Enum):
    CPU_ONLY = "cpu_only"
    TPU_SINGLE = "tpu_single"
    TPU_POD_SLICE = "tpu_pod_slice"
    TPU_MULTI_HOST = "tpu_multi_host"


@dataclass
class DeviceInfo:
    index: int
    platform: str
    kind: str
    hbm_bytes: int
    hbm_free_bytes: int

    @property
    def hbm_gb(self) -> float:
        return self.hbm_bytes / 2**30


@dataclass
class HardwareInfo:
    platform: str
    devices: List[DeviceInfo] = field(default_factory=list)
    num_processes: int = 1
    tier: HardwareTier = HardwareTier.CPU_ONLY

    @property
    def num_devices(self) -> int:
        return len(self.devices)

    @property
    def hbm_per_device(self) -> int:
        return self.devices[0].hbm_bytes if self.devices else 0

    @property
    def peak_bf16_flops(self) -> float:
        if not self.devices:
            return 0.0
        kind = self.devices[0].kind.lower()
        for needle, flops in _KNOWN_PEAK_BF16.items():
            if needle in kind:
                return flops
        return 50e12 if self.platform == "tpu" else 1e12

    def summary(self) -> dict:
        return {
            "platform": self.platform,
            "num_devices": self.num_devices,
            "device_kind": self.devices[0].kind if self.devices else "none",
            "hbm_gb_per_device": round(self.hbm_per_device / 2**30, 1),
            "tier": self.tier.value,
            "num_processes": self.num_processes,
        }


def _hbm_for_kind(kind: str, platform: str) -> int:
    low = kind.lower()
    for needle, size in _KNOWN_HBM.items():
        if needle in low:
            return size
    if platform == "cpu":
        try:
            import psutil

            return int(psutil.virtual_memory().available * 0.5)
        except Exception:  # noqa: BLE001
            return 8 * 2**30
    return 16 * 2**30


def detect_hardware(devices=None) -> HardwareInfo:
    import jax

    devs = devices if devices is not None else jax.devices()
    platform = devs[0].platform if devs else "cpu"
    infos: List[DeviceInfo] = []
    for i, d in enumerate(devs):
        total = free = 0
        try:
            stats = d.memory_stats() or {}
            total = int(stats.get("bytes_limit", 0))
            free = total - int(stats.get("bytes_in_use", 0))
        except Exception:  # noqa: BLE001 - not all backends expose stats
            pass
        if total <= 0:
            total = _hbm_for_kind(getattr(d, "device_kind", ""), platform)
            free = total
        infos.append(DeviceInfo(i, d.platform, getattr(d, "device_kind", d.platform),
                                total, free))
    try:
        import jax as _j

        nproc = _j.process_count()
    except Exception:  # noqa: BLE001
        nproc = 1
    if platform != "tpu":
        tier = HardwareTier.CPU_ONLY
    elif nproc > 1:
        tier = HardwareTier.TPU_MULTI_HOST
    elif len(infos) > 1:
        tier = HardwareTier.TPU_POD_SLICE
    else:
        tier = HardwareTier.TPU_SINGLE
    return HardwareInfo(platform=platform, devices=infos, num_processes=nproc, tier=tier)


def check_hardware() -> dict:
    """CLI-facing hardware report (analog of `framewright-check`)."""
    info = detect_hardware()
    report = info.summary()
    recs = []
    if info.platform == "cpu":
        recs.append("No TPU detected: pipelines run on CPU (slow). ")
    if info.hbm_per_device < 8 * 2**30:
        recs.append("Low device memory: the planner will tile aggressively.")
    report["recommendations"] = recs
    report["status"] = "ok" if info.platform == "tpu" else "degraded"
    return report
