#!/usr/bin/env python
"""Measure the merge-resident RRDB path's true HBM peak per geometry
and the batch-throughput curve, to recalibrate the planner
(_ACT_CHANNELS["rrdb"] was measured on the pre-merge-body path and is
~2x conservative — VERDICT r4 weak #6).

For each (dtype, B): run apply_fast at 1080p x2, read the device's
peak_bytes_in_use delta, and derive channel-bytes per body pixel:
    ch = (peak_per_frame - out_bytes) / (body_px * dtype_bytes)
Also times each step, extending the round-4 sweep past B=4 — if B=5/6
fits and is faster, the headline batch rises for free.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/calibrate_planner.py
"""

import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".xla_bench_cache"))

import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb

H, W = 1080, 1920
REPS = 6


def peak_bytes(dev):
    try:
        st = dev.memory_stats()
        return int(st.get("peak_bytes_in_use", 0))
    except Exception:  # noqa: BLE001
        return 0


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:  # noqa: BLE001
        pass
    cfg = rrdb.RRDBConfig(num_block=23, scale=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        p0 = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        fast16 = rrdb.make_fast_params(p0)
        ps = rrdb.stack_body(p0)
    p_dev = jax.device_put(ps, dev)
    fast16 = jax.device_put(fast16, dev)
    x1 = jnp.asarray(np.random.default_rng(0).random((1, H, W, 3)),
                     jnp.bfloat16)

    sample = jnp.asarray(np.asarray(x1[:, :256, :256], np.float32))
    amax = np.asarray(rrdb.calibrate_act_scales(p_dev, cfg, sample))
    with jax.default_device(cpu):
        fast8 = rrdb.make_fast_params(p0, compute_dtype="int8",
                                      act_amax=amax)
    fast8 = jax.device_put(fast8, dev)

    fwd = jax.jit(lambda p, fp, t: rrdb.apply_fast(
        p, fp, t, cfg, out_mode="yuv420_u8"))

    body_px = (H // 2) * (W // 2)
    base_peak = peak_bytes(dev)
    print(f"baseline peak (weights resident): {base_peak/2**30:.2f} GiB")
    rows = []
    for dtype_name, fp, dbytes in (("bf16", fast16, 2), ("int8", fast8, 1)):
        bs = (1, 2, 3, 4, 5, 6) if dtype_name == "bf16" else (1, 2, 3)
        for b in bs:
            xb = jnp.broadcast_to(x1, (b,) + x1.shape[1:])
            key = f"{dtype_name} B={b}"
            try:
                y = fwd(p_dev, fp, xb)
                jax.block_until_ready(y)
                t0 = time.time()
                for _ in range(REPS):
                    y = fwd(p_dev, fp, xb)
                jax.block_until_ready(y)
                dt = (time.time() - t0) / (REPS * b)
                pk = peak_bytes(dev)
                per_frame = (pk - base_peak) / b
                ch = per_frame / (body_px * dbytes)
                rows.append((key, dt * 1e3, pk / 2**30, per_frame / 2**30, ch))
                print(f"{key:12s}: {dt*1e3:7.1f} ms/frame  peak {pk/2**30:5.2f} "
                      f"GiB  ({per_frame/2**30:4.2f} GiB/frame, ch={ch:.0f})")
            except Exception as exc:  # noqa: BLE001
                print(f"{key:12s}: FAILED {str(exc)[:140]}")
    if rows:
        worst = max(r[4] for r in rows)
        print(f"\nsuggested _ACT_CHANNELS['rrdb'] (fused path, +10% margin): "
              f"{worst * 1.1:.0f}")


if __name__ == "__main__":
    main()
