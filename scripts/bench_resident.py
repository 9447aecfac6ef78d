#!/usr/bin/env python
"""A/B the block-resident body vs the per-RDB round-trip body on the
real device, same process back-to-back (cross-process timings drift;
PERF.md round-2 caveat), bf16 and int8."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from framewright_tpu.models import rrdb

H, W = 1080, 1920


def sync(t):
    return float(jnp.mean(jnp.ravel(t)[::100000].astype(jnp.float32)))


def timeit(fn, *args, reps=6):
    y = fn(*args)
    sync(y)
    t0 = time.time()
    for _ in range(reps):
        y = fn(*args)
    sync(y)
    return (time.time() - t0) / reps


def main():
    print("platform:", jax.devices()[0].platform, "S:",
          os.environ.get("FW_RDB_S", "112"))
    cpu = jax.local_devices(backend="cpu")[0]
    cfg = rrdb.RRDBConfig(num_block=23, scale=2)
    from framewright_tpu.ops import fused_rrdb

    for mode in ("bf16", "int8"):
        with jax.default_device(cpu):
            params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
            fast = rrdb.make_fast_params(params, compute_dtype=mode)
            params = rrdb.stack_body(params)
        paramsd, fastd = jax.device_put((params, fast), jax.devices()[0])
        x = jnp.asarray(np.random.rand(1, H, W, 3), jnp.bfloat16)

        def run_roundtrip(p, fp, t):
            feat = rrdb._head(p, t, cfg)
            os.environ["FW_RDB_RESIDENT"] = "0"
            return fused_rrdb.rrdb_body_fast(feat, fp)

        def run_resident(p, fp, t):
            feat = rrdb._head(p, t, cfg)
            return fused_rrdb.rrdb_body_resident(feat, fp)

        # warm both, then interleave measurements twice (drift guard)
        jr = jax.jit(run_roundtrip)
        je = jax.jit(run_resident)
        a1 = timeit(jr, paramsd, fastd, x)
        b1 = timeit(je, paramsd, fastd, x)
        a2 = timeit(jr, paramsd, fastd, x)
        b2 = timeit(je, paramsd, fastd, x)
        print(f"[{mode}] roundtrip: {a1*1000:.1f} / {a2*1000:.1f} ms   "
              f"resident: {b1*1000:.1f} / {b2*1000:.1f} ms")


if __name__ == "__main__":
    main()
