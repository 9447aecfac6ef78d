#!/usr/bin/env python
"""Per-op device timeline for the full RRDB fast path via jax.profiler
(works on the axon stack — perfetto JSON parsed by trace_report.py).

Usage: python scripts/probe_profiler.py [bf16|int8] [trace_dir] [B] [out_mode]
"""

import os
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb

H, W = 1080, 1920


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/jax_trace_{mode}"
    print("platform:", jax.devices()[0].platform, "mode:", mode,
          "body:", os.environ.get("FW_RDB_BODY", "default"))
    cpu = jax.local_devices(backend="cpu")[0]
    cfg = rrdb.RRDBConfig(num_block=23, scale=2)
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        params = rrdb.stack_body(params)
    params = jax.device_put(params, jax.devices()[0])
    if mode == "int8":
        amax = rrdb.calibrate_act_scales(
            params, cfg, jnp.asarray(np.random.rand(1, 256, 256, 3),
                                     jnp.bfloat16))
        with jax.default_device(cpu):
            fast = rrdb.make_fast_params(jax.device_get(params),
                                         compute_dtype="int8",
                                         act_amax=np.asarray(amax))
    else:
        with jax.default_device(cpu):
            fast = rrdb.make_fast_params(jax.device_get(params))
    fast = jax.device_put(fast, jax.devices()[0])
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    out_mode = sys.argv[4] if len(sys.argv) > 4 else "bf16"
    x = jnp.asarray(np.random.rand(b, H, W, 3), jnp.bfloat16)

    f = jax.jit(lambda p, fp, t: rrdb.apply_fast(p, fp, t, cfg,
                                                 out_mode=out_mode))

    def sync(t):
        if isinstance(t, tuple):
            t = t[0]
        jax.block_until_ready(t)

    y = f(params, fast, x)
    sync(y)
    t0 = time.time()
    for _ in range(4):
        y = f(params, fast, x)
    sync(y)
    print(f"frame: {(time.time()-t0)/4/b*1000:.1f} ms (B={b}, {out_mode})")

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        for _ in range(2):
            y = f(params, fast, x)
        sync(y)
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "trace_report.py"), trace_dir])


if __name__ == "__main__":
    sys.exit(main())
