"""HBM-aware tile/batch planner.

Replaces the reference's VRAM tier tables and adaptive tile fallback
(utils/gpu_memory_optimizer.py:104-270: model-MB x size-factor x scale²
vs available VRAM; README tier table 32GB→no-tile … 4GB→tile-128;
shrink-on-OOM retry loop restorer.py:1737-1756) with an analytic HBM
model: estimate peak live activation bytes per body pixel for the model
family, then pick the largest (tile, batch) that fits the HBM budget —
preferring whole-frame no-tiling (best MXU utilization, no halo waste)
and keeping tile dims MXU-aligned.

The same shrink-on-OOM downshift exists as ``TilePlan.downshift()`` —
wired to RetryPolicy.on_retry in the SR processor.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, replace
from typing import Optional, Tuple

from framewright_tpu.errors import HBMError

logger = logging.getLogger(__name__)

# Peak live activation bytes per body-resolution pixel per dtype byte.
# RRDB: round-5 recalibration for the MERGE-RESIDENT body + resident
# tail3 (round-4's 4000 was measured on the pre-merge path whose
# per-RDB extraction buffers + 4K tail feats dominated — that peak no
# longer exists; the resident path keeps ~4 block-layout buffers of
# 64ch packed words per frame, ~1-1.5 GB at 1080p x2, and B=4 runs on
# a 16 GB chip without OOM in every round-4/5 bench). The axon plugin
# exposes no memory_stats, so the constant is bounded empirically:
# B=4 bf16 fits comfortably; batches past the measured-best are capped
# by _MEASURED_MAX_BATCH below, not by this estimate.
_ACT_CHANNELS = {
    "rrdb": 1200.0,
    "srvgg": 200.0,
    "nafnet": 380.0,
    "restormer": 520.0,
    "ifnet": 260.0,
    # HAT: window attention stores qkv + logits per window; ~dim*16
    "hat": 2900.0,
    "default": 512.0,
}

# Measured-best whole-frame batches (scripts/bench_outmode.py round-5,
# 1080p x2 on v5e): the batch curve is nearly flat past these (B=4
# bf16 gains 0.7% over B=3; int8 B=4 is a compiler crash — see
# _COMPILER_MAX_BATCH) while compile time and OOM risk grow, so the
# planner stops here rather than chasing its analytic estimate to B=16.
_MEASURED_MAX_BATCH = {
    ("rrdb", "bfloat16"): 4,
    ("rrdb", "int8"): 3,
}

_DTYPE_BYTES = {"bfloat16": 2, "float32": 4, "int8": 1}

# Known compiler limits, NOT memory limits: the axon remote compile
# server reproducibly fails (HTTP 500, helper exit 1) on the int8-i32
# merge-body program at frame batch >= 4 (PERF.md "compiler fragility";
# repro: scripts/probe_compiler_crashes.py).  When a compiler release
# fixes it, bump/remove the entry and the planner adopts the larger
# batch automatically.
_COMPILER_MAX_BATCH = {
    ("rrdb", "int8"): 3,
}

# Candidate tile interior sizes, MXU/lane-friendly, divisible by 4
# (pixel_unshuffle at scale 1-2 needs mod-4 input dims).
_TILE_CANDIDATES = (1024, 768, 512, 384, 256, 192, 128, 96, 64)


@dataclass(frozen=True)
class TilePlan:
    """Execution geometry for one model stage over one clip resolution."""

    height: int
    width: int
    scale: int
    tile_size: int          # 0 = whole frame, else interior tile edge
    overlap: int            # halo pixels each side (input resolution)
    batch: int              # frames (no tiling) or tiles per device step
    body_divisor: int       # input-res -> body-res factor (pixel_unshuffle)
    est_bytes: int          # planner's activation estimate for this plan

    @property
    def tiled(self) -> bool:
        return self.tile_size > 0

    @property
    def grid(self) -> Tuple[int, int]:
        if not self.tiled:
            return (1, 1)
        ts = self.tile_size
        return (-(-self.height // ts), -(-self.width // ts))

    @property
    def tiles_per_frame(self) -> int:
        g = self.grid
        return g[0] * g[1]

    def downshift(self) -> "TilePlan":
        """Next-smaller plan after a device OOM (halve batch first, then
        shrink tiles — mirrors the reference's adaptive fallback)."""
        if self.batch > 1:
            return replace(self, batch=max(1, self.batch // 2))
        if not self.tiled:
            ts = min(_TILE_CANDIDATES[0], _round8(max(self.height, self.width) // 2))
            return replace(self, tile_size=max(64, ts))
        idx = [t for t in _TILE_CANDIDATES if t < self.tile_size]
        if not idx:
            raise HBMError(
                f"Cannot shrink below tile_size={self.tile_size}; "
                f"frame {self.width}x{self.height} does not fit HBM"
            )
        return replace(self, tile_size=idx[0])


def _round8(x: int) -> int:
    return max(8, (x // 8) * 8)


def body_divisor(family: str, scale: int) -> int:
    """Input-resolution divisor at which the model body runs.

    RRDB uses pixel_unshuffle for scale<4 so its 23-block body always
    runs at out_res/4 (rrdb.py); other families run at input res.
    """
    if family == "rrdb":
        return {4: 1, 2: 2, 1: 4}.get(scale, 1)
    return 1


def estimate_activation_bytes(
    family: str, h: int, w: int, scale: int, dtype: str, batch: int = 1
) -> int:
    """Peak live activation bytes for a (batch, h, w) input forward."""
    u = body_divisor(family, scale)
    body_px = (h // u) * (w // u)
    ch = _ACT_CHANNELS.get(family, _ACT_CHANNELS["default"])
    act = batch * body_px * ch * _DTYPE_BYTES.get(dtype, 2)
    # output buffer (f32 on the way back to host) + upsample tail feats
    out = batch * h * scale * w * scale * 3 * 4
    tail = batch * h * scale * w * scale * 70 * _DTYPE_BYTES.get(dtype, 2)
    return int(act + out + tail)


def plan(
    height: int,
    width: int,
    scale: int,
    family: str = "rrdb",
    dtype: str = "bfloat16",
    hbm_free_bytes: Optional[int] = None,
    hbm_utilization: float = 0.85,
    params_bytes: int = 0,
    tile_size_override: int = 0,
    overlap: int = 8,
    max_batch: int = 16,
) -> TilePlan:
    """Choose (tile, batch) for a stage. ``tile_size_override`` > 0 pins
    the tile size (user flag); 0 lets the planner decide."""
    if hbm_free_bytes is None:
        from framewright_tpu.hw import detect_hardware

        hw = detect_hardware()
        hbm_free_bytes = hw.devices[0].hbm_free_bytes if hw.devices else 8 * 2**30
    budget = int(hbm_free_bytes * hbm_utilization) - params_bytes * 3  # +grads-free copies
    budget = max(budget, 16 * 2**20)
    u = body_divisor(family, scale)
    max_batch = min(max_batch,
                    _COMPILER_MAX_BATCH.get((family, dtype), max_batch),
                    _MEASURED_MAX_BATCH.get((family, dtype), max_batch))

    def fits(h: int, w: int, b: int) -> Tuple[bool, int]:
        est = estimate_activation_bytes(family, h, w, scale, dtype, b)
        return est <= budget, est

    if tile_size_override > 0:
        ts = tile_size_override
        full = ts + 2 * overlap
        for b in range(max_batch, 0, -1):
            ok, est = fits(full, full, b)
            if ok:
                return TilePlan(height, width, scale, ts, overlap, b, u, est)
        ok, est = fits(full, full, 1)
        return TilePlan(height, width, scale, ts, overlap, 1, u, est)

    # Prefer whole-frame processing with the largest batch that fits.
    best_b = 0
    est_whole = 0
    for b in range(max_batch, 0, -1):
        ok, est = fits(height, width, b)
        if ok:
            best_b, est_whole = b, est
            break
    if best_b >= 1:
        return TilePlan(height, width, scale, 0, 0, best_b, u, est_whole)

    # Tile: largest candidate tile with the batch that fits.
    for ts in _TILE_CANDIDATES:
        if ts > max(height, width):
            continue
        full = ts + 2 * overlap
        for b in (8, 4, 2, 1):
            if b > max_batch:
                continue
            ok, est = fits(full, full, b)
            if ok:
                logger.info(
                    "planner: %dx%d %s x%d -> tile %d (+%d halo) batch %d (%.0f MiB est)",
                    width, height, family, scale, ts, overlap, b, est / 2**20,
                )
                return TilePlan(height, width, scale, ts, overlap, b, u, est)
    raise HBMError(
        f"No tile plan fits: {width}x{height} {family} x{scale} in "
        f"{budget / 2**30:.1f} GiB budget"
    )
