#!/usr/bin/env python
"""A/B the extended tail (tail2: conv_up1 folded in, body-res input)
vs the 2x-res phase tail + XLA conv_up1, in the FULL apply_fast
context at 1080p x2, bf16 and int8-i32, same process."""

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
    print("platform:", jax.devices()[0].platform,
          "S2:", os.environ.get("FW_TAIL2_S", "96"))
    cfg = rrdb.RRDBConfig(num_block=23, scale=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        params_s = rrdb.stack_body(params)
    params_s = jax.device_put(params_s, jax.devices()[0])
    x = jnp.asarray(np.random.rand(1, H, W, 3), jnp.bfloat16)
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
        for tail in ("1", "2"):
            os.environ["FW_TAIL"] = tail
            f = jax.jit(lambda p, fpp, t: rrdb.apply_fast(p, fpp, t, cfg))
            try:
                dt = timeit(f, params_s, fp, x)
                print(f"{name} tail{tail}: {dt*1000:7.1f} ms full frame "
                      f"({1/dt:.2f} fps)")
            except Exception as e:
                print(f"{name} tail{tail}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
