#!/usr/bin/env python
"""Two cheap post-tail3 probes on the int8-i32 headline path:

1. FW_SCAN_UNROLL: the round-4 trace showed the 23-RRDB `while` costs
   ~10 ms/frame beyond the three merge-kernel closed_calls. Full
   unroll (23) removes the while; 2/4 partial unrolls amortize it.
2. int8 B=4: pre-tail3 this reproducibly killed the remote compiler
   (HTTP 500) — tail1's XLA image-level convs at B=4 were in that
   program; with the resident tail the program is leaner, retry.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_unroll_b4.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb

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
    print("platform:", jax.devices()[0].platform, flush=True)
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
        fast8i = rrdb.make_fast_params(hp, compute_dtype="int8",
                                       act_amax=np.asarray(amax),
                                       int8_scheme="i32")
    fast8i = jax.device_put(fast8i, jax.devices()[0])

    os.environ["FW_TAIL"] = "3"
    for b, unroll in [(1, 1), (1, 2), (1, 23), (3, 1), (4, 1), (4, 2)]:
        os.environ["FW_SCAN_UNROLL"] = str(unroll)
        x = jnp.asarray(np.random.rand(b, H, W, 3), jnp.bfloat16)
        f = jax.jit(lambda p, fp, t: rrdb.apply_fast(p, fp, t, cfg))
        try:
            dt = timeit(f, params_s, fast8i, x) / b
            print(f"int8 B={b} unroll={unroll}: {dt*1000:7.1f} ms/frame "
                  f"({1/dt:.2f} fps)", flush=True)
        except Exception as e:
            print(f"int8 B={b} unroll={unroll}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
