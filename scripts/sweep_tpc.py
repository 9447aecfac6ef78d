#!/usr/bin/env python
"""In-process TPC sweep: bf16 and int8 fused-RDB kernel variants
back-to-back on the same device (cross-process timings on the axon
stack drift; same-process comparisons are the trustworthy method)."""

import importlib
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb

H, W = 540, 960
REPS = 20


def measure(mode, tpc_nf, tpc_gc):
    os.environ["FW_TPC_NF"] = os.environ["FW_TPC_NF_I8"] = str(tpc_nf)
    os.environ["FW_TPC_GC"] = os.environ["FW_TPC_GC_I8"] = str(tpc_gc)
    from framewright_tpu.ops import fused_rrdb as F
    importlib.reload(F)
    nh, nw = -(-H // F.BH), -(-W // F.BH)
    nb = nh * nw
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        p1 = rrdb.init(jax.random.PRNGKey(0), rrdb.RRDBConfig(num_block=1),
                       dtype=jnp.bfloat16)
        rdbp = p1["body"][0]["rdb1"]
        wts = (F.rdb_wide_weights_int8(rdbp) if mode == "int8"
               else F.rdb_wide_weights(rdbp))
    dev = jax.devices()[0]
    wts = jax.device_put(wts, dev)
    rng = np.random.default_rng(0)
    blocks = jax.device_put(jnp.asarray(
        rng.standard_normal((nb, F.NF, F.PX)).astype(np.float32) * 0.5,
        jnp.bfloat16), dev)
    ext = np.zeros((nb, 4), np.int32)
    ext[:, 1] = F.S
    ext[:, 3] = F.S
    ext = jax.device_put(jnp.asarray(ext), dev)
    fn = F.fused_rdb_blocks_int8 if mode == "int8" else F.fused_rdb_blocks
    f = jax.jit(lambda b, e: fn(b, e, wts))

    def sync(y):
        return float(jnp.mean(y[::37, 0, ::511].astype(jnp.float32)))

    y = f(blocks, ext)
    sync(y)
    t0 = time.time()
    for _ in range(REPS):
        y = f(blocks, ext)
    sync(y)
    dt = (time.time() - t0) / REPS
    print(f"{mode} TPC=({tpc_nf},{tpc_gc}): {dt*1e3:.2f} ms "
          f"-> x69 = {dt*69*1e3:.0f} ms body", flush=True)
    return dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    for mode, tn, tg in [
        ("bf16", 2, 4), ("bf16", 4, 4), ("bf16", 3, 3), ("bf16", 4, 8),
        ("int8", 4, 4), ("int8", 4, 8), ("int8", 8, 8), ("int8", 3, 3),
        ("bf16", 2, 4),  # repeat first to gauge drift
    ]:
        try:
            measure(mode, tn, tg)
        except Exception as e:  # noqa: BLE001
            print(f"{mode} TPC=({tn},{tg}) FAILED: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
