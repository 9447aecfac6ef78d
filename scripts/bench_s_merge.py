#!/usr/bin/env python
"""Re-sweep the block side S for the MERGE-resident body + tail3.

The production S=112 was picked by a round-2 sweep of the old
roundtrip body (extract -> kernel -> assemble per sweep), where larger
blocks lost to padding waste + VMEM pressure from the per-sweep
extraction working set. The merge body eliminated that working set, so
the trade-off moved: larger S means fewer blocks (less halo recompute:
(S/(S-16))^2 = 1.36x at 112, 1.31x at 128, 1.23x at 160) and fewer
per-block ring merges, at the cost of bigger VMEM tiles.

S must keep HALO*S % 128 == 0 (ring strips stay (8,128)-aligned lane
strips): any S % 16 == 0 qualifies.

Run ONE S per process (S is bound at framewright_tpu import):
  FW_RDB_S=128 PYTHONPATH=/root/repo:/root/.axon_site \
      python -u scripts/bench_s_merge.py
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

H, W = 1080, 1920


def sync(t):
    return float(jnp.mean(jnp.ravel(t)[::100000].astype(jnp.float32)))


def timeit(fn, *args, reps=8):
    y = fn(*args)
    sync(y)
    t0 = time.time()
    for _ in range(reps):
        y = fn(*args)
    sync(y)
    return (time.time() - t0) / reps


def main():
    from framewright_tpu.models import rrdb
    from framewright_tpu.ops import fused_rrdb

    print("platform:", jax.devices()[0].platform,
          "S:", fused_rrdb.S, "HALO:", fused_rrdb.HALO, flush=True)
    cfg = rrdb.RRDBConfig(num_block=23, scale=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        params_s = rrdb.stack_body(params)
    params_s = jax.device_put(params_s, jax.devices()[0])
    amax = rrdb.calibrate_act_scales(
        params_s, cfg, jnp.asarray(np.random.rand(1, 256, 256, 3),
                                   jnp.bfloat16))
    with jax.default_device(cpu):
        hp = jax.device_get(params_s)
        fast16 = rrdb.make_fast_params(hp)
        fast8i = rrdb.make_fast_params(hp, compute_dtype="int8",
                                       act_amax=np.asarray(amax),
                                       int8_scheme="i32")
    fast16, fast8i = jax.device_put((fast16, fast8i), jax.devices()[0])

    import sys

    only = sys.argv[1] if len(sys.argv) > 1 else ""
    out_mode = sys.argv[2] if len(sys.argv) > 2 else "rgb_u8"
    plan = [("int8", fast8i, "3", (1, 3)),
            ("bf16", fast16, "3", (1, 4))]
    if only:
        plan = [p for p in plan if p[0] == only]
    for name, fp, tail, batches in plan:
        os.environ["FW_TAIL"] = tail
        for b in batches:
            x = jnp.asarray(np.random.rand(b, H, W, 3), jnp.bfloat16)
            f = jax.jit(lambda p, fpp, t: rrdb.apply_fast(
                p, fpp, t, cfg, out_mode=out_mode))
            try:
                dt = timeit(f, params_s, fp, x) / b
                print(f"S={fused_rrdb.S} {name} B={b} tail{tail}: "
                      f"{dt*1000:7.1f} ms/frame ({1/dt:.2f} fps)",
                      flush=True)
            except Exception as e:
                print(f"S={fused_rrdb.S} {name} B={b} tail{tail}: FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
