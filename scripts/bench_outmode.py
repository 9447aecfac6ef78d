#!/usr/bin/env python
"""A/B the fused output epilogues (ops/fused_tail.py out_mode) on
hardware: full apply_fast at 1080p x2, bf16-RGB out vs in-kernel
uint8 RGB vs in-kernel YUV420 planes.

What each mode removes vs "bf16" (the round-4 headline program):
  rgb_u8    — the 13.5 ms/frame bf16 depth-to-space ROOT reshape runs
              on uint8 (2x less data) and K2's output writes halve.
  yuv420_u8 — K2 emits 24 uint8 rows instead of 128 bf16 rows (10.7x
              less), the d2s runs on uint8 planes, and the SR jit's
              whole-4K XLA CSC + subsample disappears (e2e path).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_outmode.py
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
REPS = 8


def sync(t):
    if isinstance(t, tuple):
        t = t[0]
    return float(jnp.mean(t[0, ::731, ::731].astype(jnp.float32)))


def bench(fwd, p, fp, x, label):
    y = fwd(p, fp, x)
    sync(y)
    t0 = time.time()
    for _ in range(REPS):
        y = fwd(p, fp, x)
    sync(y)
    dt = (time.time() - t0) / (REPS * x.shape[0])
    print(f"{label:28s}: {dt*1e3:7.1f} ms/frame ({1.0/dt:5.2f} fps)")
    return dt


def main():
    print("platform:", jax.devices()[0].platform)
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
    dev = jax.devices()[0]
    p_dev = jax.device_put(ps, dev)
    fast16 = jax.device_put(fast16, dev)

    x1 = jnp.asarray(np.random.default_rng(0).random((1, H, W, 3)),
                     jnp.bfloat16)

    # int8-i32 fast params (static scales off a device calibration)
    sample = jnp.asarray(np.asarray(x1[:, :256, :256], np.float32))
    amax = np.asarray(rrdb.calibrate_act_scales(p_dev, cfg, sample))
    with jax.default_device(cpu):
        fast8 = rrdb.make_fast_params(p0, compute_dtype="int8",
                                      act_amax=amax)
    fast8 = jax.device_put(fast8, dev)

    def make(mode):
        return jax.jit(lambda p, fp, t: rrdb.apply_fast(
            p, fp, t, cfg, out_mode=mode))

    results = {}
    for dtype_name, fp in (("int8", fast8), ("bf16", fast16)):
        bs = (1, 3) if dtype_name == "int8" else (1, 4)
        for mode in ("bf16", "rgb_u8", "yuv420_u8"):
            fwd = make(mode)
            for b in bs:
                xb = jnp.broadcast_to(x1, (b,) + x1.shape[1:])
                key = f"{dtype_name} B={b} {mode}"
                try:
                    results[key] = bench(fwd, p_dev, fp, xb, key)
                except Exception as exc:  # noqa: BLE001
                    print(f"{key:28s}: FAILED {str(exc)[:120]}")
    print({k: round(v * 1e3, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
