#!/usr/bin/env python
"""A/B the resident tail (tail3: conv_body + skip + all four tail convs
on the body's resident blocks, ops/fused_tail3.py) vs the round-4
defaults (bf16 tail2 / int8 tail1), in the FULL apply_fast context at
1080p x2, same process, B=1 and the best measured batch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_tail3.py
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
    print("platform:", jax.devices()[0].platform)
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

    plan = [("bf16", fast16, ("2", "3"), (1, 4)),
            ("int8", fast8i, ("1", "3"), (1, 3))]
    for name, fp, tails, batches in plan:
        for b in batches:
            x = jnp.asarray(np.random.rand(b, H, W, 3), jnp.bfloat16)
            for tail in tails:
                os.environ["FW_TAIL"] = tail
                f = jax.jit(lambda p, fpp, t: rrdb.apply_fast(p, fpp, t,
                                                              cfg))
                try:
                    dt = timeit(f, params_s, fp, x) / b
                    print(f"{name} B={b} tail{tail}: {dt*1000:7.1f} "
                          f"ms/frame ({1/dt:.2f} fps)", flush=True)
                except Exception as e:
                    print(f"{name} B={b} tail{tail}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}",
                          flush=True)


if __name__ == "__main__":
    main()
