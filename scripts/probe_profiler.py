#!/usr/bin/env python
"""Attempt a real per-op device timeline via jax.profiler on the axon
stack (PERF.md round-1 item 7 / VERDICT round-3 item 8).

Traces one fused-body frame (bf16) and, if the trace materializes,
prints the top device ops by total duration from the perfetto JSON.
Outcome (works / fails, and how) is recorded in PERF.md either way.
"""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb

H, W = 1080, 1920
TRACE_DIR = "/tmp/jax_trace_r4"


def main():
    print("platform:", jax.devices()[0].platform)
    cpu = jax.local_devices(backend="cpu")[0]
    cfg = rrdb.RRDBConfig(num_block=23, scale=2)
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        fast = rrdb.make_fast_params(params)
        params = rrdb.stack_body(params)
    params, fast = jax.device_put((params, fast), jax.devices()[0])
    x = jnp.asarray(np.random.rand(1, H, W, 3), jnp.bfloat16)

    f = jax.jit(lambda p, fp, t: rrdb.apply_fast(p, fp, t, cfg))
    y = f(params, fast, x)
    y.block_until_ready()
    print("warmup done")

    os.makedirs(TRACE_DIR, exist_ok=True)
    try:
        with jax.profiler.trace(TRACE_DIR, create_perfetto_trace=True):
            for _ in range(2):
                y = f(params, fast, x)
            y.block_until_ready()
    except Exception as e:
        print("TRACE FAILED:", type(e).__name__, e)
        return 1

    files = sorted(glob.glob(TRACE_DIR + "/**/*", recursive=True))
    for p in files:
        if os.path.isfile(p):
            print("  trace file:", p, os.path.getsize(p))

    pjs = [p for p in files if p.endswith(".json.gz")]
    if not pjs:
        print("no perfetto json produced")
        return 2
    with gzip.open(pjs[-1], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    # aggregate complete events (ph == 'X') by name on TPU tracks
    tot = {}
    for ev in events:
        if not isinstance(ev, dict) or ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0)
        tot[name] = tot.get(name, 0.0) + dur
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
    print("top ops by total us (2 frames):")
    for name, us in top:
        print(f"  {us/1000:9.2f} ms  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
