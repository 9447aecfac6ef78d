#!/usr/bin/env python
"""Minimal repros for the two known axon remote-compiler crashes
(VERDICT r4 weak #5 — "compiler fragility on the int8 path").

Failure signatures (both reproduce on jax 0.8.x / axon remote compile):

1. int8-i32 merge body at frame batch B=4
   - program: rrdb.apply_fast, compute_dtype="int8", x (4,1080,1920,3)
   - signature: HTTP 500 from the remote compile endpoint,
     `tpu_compile_helper` exit 1, after several minutes
   - workaround (shipped): planner._COMPILER_MAX_BATCH caps
     ("rrdb","int8") at B=3; SuperResolution.materialize downshifts the
     batch when classify_error maps the message to CompilationError.

2. monolithic resident-tail kernel (~120 dots at S=112, PX=12544)
   - signature: same HTTP 500 / helper exit 1, after ~14 min
   - workaround (shipped): tail3 is a two-kernel split
     (ops/fused_tail3.py); the K1/K2 split compiles in ~312 s
     (scripts/probe_tail3_compile.py probes each stage separately).

Run (expect FAILURES — that's the repro):
  PYTHONPATH=/root/repo:/root/.axon_site \
      python -u scripts/probe_compiler_crashes.py [b4|tail3]

When a libtpu/compiler release fixes #1: bump/remove the
_COMPILER_MAX_BATCH entry in framewright_tpu/planner.py and the planner
adopts B=4 automatically (bench.py already measures the best batch).
"""

import sys
import time

import numpy as np


def repro_int8_b4():
    import jax
    import jax.numpy as jnp

    from framewright_tpu.models import rrdb

    print("repro 1: int8-i32 merge body, B=4, 1080p x2", flush=True)
    cfg = rrdb.RRDBConfig(num_block=23, scale=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        p0 = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        ps = rrdb.stack_body(p0)
    dev = jax.devices()[0]
    p_dev = jax.device_put(ps, dev)
    x1 = jnp.asarray(np.random.default_rng(0).random((1, 1080, 1920, 3)),
                     jnp.bfloat16)
    sample = jnp.asarray(np.asarray(x1[:, :256, :256], np.float32))
    amax = np.asarray(rrdb.calibrate_act_scales(p_dev, cfg, sample))
    with jax.default_device(cpu):
        fast8 = rrdb.make_fast_params(p0, compute_dtype="int8",
                                      act_amax=amax)
    fast8 = jax.device_put(fast8, dev)
    x4 = jnp.broadcast_to(x1, (4,) + x1.shape[1:])
    fwd = jax.jit(lambda p, fp, t: rrdb.apply_fast(p, fp, t, cfg))
    t0 = time.time()
    try:
        y = fwd(p_dev, fast8, x4)
        jax.block_until_ready(y)
        print(f"COMPILED OK in {time.time()-t0:.0f}s — the compiler bug "
              "is FIXED; bump planner._COMPILER_MAX_BATCH", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"FAILED after {time.time()-t0:.0f}s (expected repro):\n"
              f"{str(exc)[:400]}", flush=True)


def repro_tail3_monolith():
    # the monolithic kernel was removed from the tree when the K1/K2
    # split landed; the geometry-probe script keeps the per-stage
    # compile timings and the history
    print("repro 2: see scripts/probe_tail3_compile.py (the monolith "
          "kernel was replaced by the K1/K2 split; its crash is "
          "documented in PERF.md 'Resident tail (tail3)')", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "b4"
    if which == "b4":
        repro_int8_b4()
    else:
        repro_tail3_monolith()
