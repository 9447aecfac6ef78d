#!/usr/bin/env python
"""Re-test frame batching through the MERGE body (the round-2 B=2
anti-result was driven by the per-RDB extraction working set, which the
merge body eliminated). Same-process A/B at 1080p x2, bf16 + int8-i32."""

import time

import numpy as np
import jax
import jax.numpy as jnp

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

    for name, fp in (("bf16", fast16), ("int8", fast8i)):
        for b in (2, 3, 4):
            x = jnp.asarray(np.random.rand(b, H, W, 3), jnp.bfloat16)
            f = jax.jit(lambda p, fpp, t: rrdb.apply_fast(p, fpp, t, cfg))
            try:
                dt = timeit(f, params_s, fp, x)
                print(f"{name} B={b}: {dt*1000:7.1f} ms/batch = "
                      f"{dt/b*1000:6.1f} ms/frame ({b/dt:.2f} fps)")
            except Exception as e:
                print(f"{name} B={b}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
