#!/usr/bin/env python
"""Same-process A/B of the two block extractions under the FULL
apply_fast program (concat-based extract_blocks vs the original
per-window slice loop), plus the isolated extraction cost.

Cross-process timing drift on the shared dev chip is +-15-20%
(PERF.md), so extraction variants must be compared in ONE process.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python -u scripts/bench_extract_ab.py [int8|bf16]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

H, W = 1080, 1920


def sync(t):
    return float(jnp.mean(jnp.ravel(t)[::100000].astype(jnp.float32)))


def timeit(fn, *args, reps=10):
    y = fn(*args)
    sync(y)
    t0 = time.time()
    for _ in range(reps):
        y = fn(*args)
    sync(y)
    return (time.time() - t0) / reps


def main():
    from framewright_tpu.models import rrdb
    from framewright_tpu.ops import fused_rrdb as fr

    only = sys.argv[1] if len(sys.argv) > 1 else "int8"
    print("platform:", jax.devices()[0].platform, "S:", fr.S, flush=True)
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
        if only == "int8":
            fast = rrdb.make_fast_params(hp, compute_dtype="int8",
                                         act_amax=np.asarray(amax),
                                         int8_scheme="i32")
            batches, tail = (1, 3), "3"
        else:
            fast = rrdb.make_fast_params(hp)
            batches, tail = (1, 4), "3"
    fast = jax.device_put(fast, jax.devices()[0])
    os.environ["FW_TAIL"] = tail

    variants = [("concat", fr.extract_blocks_concat),
                ("slices", fr.extract_blocks)]

    # isolated extraction cost (64ch bf16 channel-major image -> blocks)
    img = jnp.asarray(np.random.rand(1, fr.NF, H, W), jnp.bfloat16)
    for name, fn in variants:
        g = jax.jit(lambda t, f=fn: f(t, H, W))
        dt = timeit(g, img)
        print(f"extract[{name}] isolated: {dt*1000:7.2f} ms", flush=True)

    orig = fr.extract_blocks
    for b in batches:
        x = jnp.asarray(np.random.rand(b, H, W, 3), jnp.bfloat16)
        for name, fn in variants:
            fr.extract_blocks = fn
            f = jax.jit(lambda p, fpp, t: rrdb.apply_fast(
                p, fpp, t, cfg, out_mode="rgb_u8"))
            try:
                dt = timeit(f, params_s, fast, x) / b
                print(f"apply_fast[{name}] {only} B={b}: {dt*1000:7.1f} "
                      f"ms/frame ({1/dt:.2f} fps)", flush=True)
            except Exception as e:
                print(f"apply_fast[{name}] {only} B={b}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    fr.extract_blocks = orig


if __name__ == "__main__":
    main()
