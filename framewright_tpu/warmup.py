"""Compilation-cache warmup for the production SR path.

The S=112 fused kernels take minutes on the axon remote compile server
(full e2e program: ~6 min cold).  The persistent XLA compilation cache
makes repeats fast, but only if (a) the cache dir is STABLE across
projects and (b) something compiled the production program geometry
before the user's first real run.  This module provides both:

- ``enable_xla_cache``: one shared place that wires
  ``jax_compilation_cache_dir`` with a user-level default
  (``~/.framewright_tpu/xla_cache``) instead of the per-project dir
  that made every fresh project cold-compile (the round-4 driver bench
  measured 397.6 s to first frame on a fresh tempdir project).
- ``warmup_sr``: compile the restorer's ACTUAL e2e SR program for a
  target geometry into the cache without processing any video — the
  ``framewright warmup`` verb.  Uses the same SRConfig construction as
  the restorer (``build_sr_config``) so the traced program is
  bit-identical to what ``restore`` runs.

Reference analog: the TensorRT engine cache
(reference src/framewright/infrastructure/gpu/backends/tensorrt.py:
110-455) — engines are built once per (model, shape, precision) and
reloaded from disk thereafter.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path
from typing import Dict, Optional, Sequence

logger = logging.getLogger(__name__)


def default_cache_dir() -> Path:
    """Stable user-level compilation cache location.

    Override order: $FW_XLA_CACHE_DIR, else ~/.framewright_tpu/xla_cache
    (the same root the model-weights registry uses)."""
    env = os.environ.get("FW_XLA_CACHE_DIR")
    if env:
        return Path(env)
    return Path.home() / ".framewright_tpu" / "xla_cache"


def enable_xla_cache(cache_dir: Optional[Path] = None) -> Optional[Path]:
    """Point JAX's persistent compilation cache at ``cache_dir`` (or the
    stable default). Best-effort: returns the dir or None."""
    try:
        import jax

        cache = Path(cache_dir) if cache_dir else default_cache_dir()
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        return cache
    except Exception:  # noqa: BLE001 — cache is best-effort
        logger.debug("XLA compilation cache unavailable", exc_info=True)
        return None


def build_sr_config(cfg) -> "SRConfig":  # noqa: F821 — forward ref
    """The restorer's SuperResolution stage config from a top-level
    Config — factored out so ``warmup_sr`` compiles the IDENTICAL
    program the restorer will run."""
    from framewright_tpu.processors.super_resolution import SRConfig

    return SRConfig(
        model_name=cfg.sr_model,
        compute_dtype=cfg.compute_dtype,
        tile_size=cfg.tile_size,
        tile_overlap=cfg.tile_overlap,
        batch_size=cfg.batch_size,
        hbm_utilization=cfg.hbm_utilization,
        outscale=cfg.outscale,
        enhancement_cap=cfg.max_enhancement_strength,
        diffusion_steps=cfg.diffusion_steps,
        diffusion_strength=cfg.diffusion_strength,
    )


def warmup_sr(height: int, width: int, config=None,
              output_color: str = "yuv420",
              batches: Optional[Sequence[int]] = None,
              progress=None) -> Dict:
    """Compile (and cache) the production SR program(s) for a geometry.

    Runs the restorer's SR stage end to end on synthetic uint8 frames:
    setup -> planner -> jit trace -> compile -> one real execution, so
    the persistent cache holds the serialized executable for exactly
    the program a subsequent ``restore`` of a (height, width) clip
    uses.  ``output_color`` should match the production writer path
    ("yuv420" for the straight-to-Y4M fast path, "rgb" otherwise).
    ``batches``: frame-batch sizes to compile; default is the planner's
    chosen batch (the steady-state program) plus batch 1 (the common
    short-tail program) when different.

    Returns {"cache_dir", "plan_batch", "programs": [{batch, seconds}]}.
    """
    import numpy as np

    from framewright_tpu.config import Config
    from framewright_tpu.processors.super_resolution import SuperResolution

    cfg = config or Config()
    cache = enable_xla_cache(cfg.xla_cache_dir)

    def say(msg):
        logger.info(msg)
        if progress is not None:
            progress(msg)

    say(f"warmup: {cfg.sr_model} {cfg.compute_dtype} {width}x{height} "
        f"(cache: {cache})")
    sr = SuperResolution(build_sr_config(cfg))
    sr.setup(height, width)
    if output_color and hasattr(sr, "set_output_color"):
        sr.set_output_color(output_color)
    plan = getattr(sr, "_plan", None)
    plan_batch = plan.batch if plan is not None and not plan.tiled else 1
    if batches is None:
        batches = [plan_batch] + ([1] if plan_batch != 1 else [])
    rng = np.random.default_rng(0)
    programs = []
    for b in batches:
        x = rng.integers(0, 256, (b, height, width, 3), dtype=np.uint8)
        t0 = time.time()
        sr.process_batch(x)
        dt = time.time() - t0
        programs.append({"batch": int(b), "seconds": round(dt, 1)})
        say(f"warmup: batch {b} compiled+ran in {dt:.1f}s")
    return {"cache_dir": str(cache) if cache else None,
            "plan_batch": int(plan_batch), "programs": programs}
