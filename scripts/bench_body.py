#!/usr/bin/env python
"""Ablate the RRDB fast-path frame budget on the real device:
head only / head+N RRDBs for N in (1, 23) -> per-RRDB cost and fixed
overhead, plus raw fused-RDB kernel rate at the production shape."""

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
    import os
    compute_dtype = "int8" if os.environ.get("FW_RDB_INT8") else "bf16"
    print("platform:", jax.devices()[0].platform, "mode:", compute_dtype)
    cpu = jax.local_devices(backend="cpu")[0]
    for nblocks in (1, 4, 23):
        cfg = rrdb.RRDBConfig(num_block=nblocks, scale=2)
        with jax.default_device(cpu):
            params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
            fast = rrdb.make_fast_params(params, compute_dtype=compute_dtype)
            params = rrdb.stack_body(params)
        params, fast = jax.device_put((params, fast), jax.devices()[0])
        x = jnp.asarray(np.random.rand(1, H, W, 3), jnp.bfloat16)

        # body only (head + fused body, no tail)
        def body_only(p, fp, t):
            feat = rrdb._head(p, t, cfg)
            from framewright_tpu.ops.fused_rrdb import rrdb_body_fast
            return rrdb_body_fast(feat, fp)

        dt = timeit(jax.jit(body_only), params, fast, x)
        print(f"head+body nblocks={nblocks}: {dt*1000:.1f} ms")

    # raw kernel rate: one RDB image call at production feature shape
    from framewright_tpu.ops.fused_rrdb import _fused_rdb_image, rdb_wide_weights
    with jax.default_device(cpu):
        p1 = rrdb.init(jax.random.PRNGKey(0), rrdb.RRDBConfig(num_block=1),
                       dtype=jnp.bfloat16)
        wide = rdb_wide_weights(p1["body"][0]["rdb1"])
    wide = jax.device_put(wide, jax.devices()[0])
    feat = jnp.asarray(np.random.rand(1, 64, H // 2, W // 2), jnp.bfloat16)
    f = jax.jit(lambda fc, w: _fused_rdb_image(fc, w, H // 2, W // 2))
    dt = timeit(f, feat, wide)
    print(f"single RDB image (extract+kernel+assemble): {dt*1000:.2f} ms")


if __name__ == "__main__":
    main()
