#!/usr/bin/env python
"""A/B the merge-in-kernel resident body vs the round-trip body on the
real device (head+body, 1080p x2 -> body at 960x540), bf16 and
int8-static, same process back-to-back."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb
from framewright_tpu.ops import fused_rrdb as F

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
    print("platform:", jax.devices()[0].platform, "S:", F.S,
          "HALO:", F.HALO, "BH:", F.BH)
    cfg = rrdb.RRDBConfig(num_block=23, scale=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        fast16 = rrdb.make_fast_params(params)
        params_s = rrdb.stack_body(params)
    params_s, fast16 = jax.device_put((params_s, fast16), jax.devices()[0])
    x = jnp.asarray(np.random.rand(1, H, W, 3), jnp.bfloat16)

    # int8 static: calibrate on-device (small crop)
    amax = rrdb.calibrate_act_scales(
        params_s, cfg, jnp.asarray(np.random.rand(1, 256, 256, 3),
                                   jnp.bfloat16))
    with jax.default_device(cpu):
        hp = jax.device_get(params_s)
        fast8 = rrdb.make_fast_params(hp, compute_dtype="int8",
                                      act_amax=np.asarray(amax),
                                      int8_scheme="f32acc")
        fast8i = rrdb.make_fast_params(hp, compute_dtype="int8",
                                       act_amax=np.asarray(amax),
                                       int8_scheme="i32")
    fast8, fast8i = jax.device_put((fast8, fast8i), jax.devices()[0])

    def make(body_fn, fp):
        def run(p, f, t):
            feat = rrdb._head(p, t, cfg)
            return body_fn(feat, f)
        return jax.jit(run), fp

    for name, body, fp in (
            ("bf16 roundtrip", F.rrdb_body_fast_roundtrip, fast16),
            ("bf16 merge    ", F.rrdb_body_merge, fast16),
            ("int8 roundtrip", F.rrdb_body_fast_roundtrip, fast8),
            ("int8 merge    ", F.rrdb_body_merge, fast8),
            ("int8 merge i32", F.rrdb_body_merge, fast8i),
    ):
        f, fp_ = make(body, fp)
        t0 = time.time()
        try:
            dt = timeit(f, params_s, fp_, x)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        print(f"{name}: {dt*1000:7.1f} ms head+body "
              f"(compile+warm {time.time()-t0-6*dt:.0f}s)")


if __name__ == "__main__":
    main()
