#!/usr/bin/env python
"""Raw fused-RDB kernel rate (no extraction/assembly): bf16 vs int8
at the production block population (540x960 -> NB blocks of S^2)."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb
from framewright_tpu.ops import fused_rrdb as F

H, W = 540, 960
REPS = 20


def main():
    print("platform:", jax.devices()[0].platform, "S:", F.S)
    nh, nw = -(-H // F.BH), -(-W // F.BH)
    nb = nh * nw
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        p1 = rrdb.init(jax.random.PRNGKey(0), rrdb.RRDBConfig(num_block=1),
                       dtype=jnp.bfloat16)
        rdbp = p1["body"][0]["rdb1"]
        wide16 = F.rdb_wide_weights(rdbp)
        wide8 = F.rdb_wide_weights_int8(rdbp)
    dev = jax.devices()[0]
    wide16, wide8 = jax.device_put((wide16, wide8), dev)
    rng = np.random.default_rng(0)
    blocks = jax.device_put(jnp.asarray(
        rng.standard_normal((nb, F.NF, F.PX)).astype(np.float32) * 0.5,
        jnp.bfloat16), dev)
    ext = np.zeros((nb, 4), np.int32)
    ext[:, 1] = F.S
    ext[:, 3] = F.S
    ext = jax.device_put(jnp.asarray(ext), dev)

    # useful FLOPs per kernel sweep (640 target-rows x 9 taps per px)
    flops = 2 * 9 * (64 * 192 + 32 * (160 + 128 + 96 + 64)) * F.PX * nb

    def sync(t):
        return float(jnp.mean(t[::37, 0, ::511].astype(jnp.float32)))

    for name, fn, wts in (
            ("bf16", F.fused_rdb_blocks, wide16),
            ("int8", F.fused_rdb_blocks_int8, wide8)):
        f = jax.jit(lambda b, e, w=wts, fn=fn: fn(b, e, w))
        y = f(blocks, ext)
        sync(y)
        t0 = time.time()
        for _ in range(REPS):
            y = f(blocks, ext)
        sync(y)
        dt = (time.time() - t0) / REPS
        print(f"{name}: {dt*1e3:.2f} ms/frame-RDB sweep ({nb} blocks), "
              f"{flops/dt/1e12:.1f} T(FL)OP/s useful, "
              f"x69 RDBs = {dt*69*1e3:.0f} ms/frame body")


if __name__ == "__main__":
    main()
