#!/usr/bin/env python
"""Rate probe at the RDB kernel's exact matmul geometry: a chain of
(192,128)@(128,4096) contractions with VMEM-resident operands,
bf16/f32-acc vs int8/i32-acc. Each step uses DISTINCT weights (like the
real kernel's tap chunks) so nothing CSEs, and no elementwise int8 ops
(Mosaic supports only i16/i32 vectors elementwise)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, PX = 192, int(__import__("os").environ.get("PROBE_K", "128")), 4096
CHUNKS = max(1, 3200 // (int(__import__("os").environ.get("PROBE_K", "128"))))          # matmuls per kernel invocation (~1 RDB worth)
REPS = 20


GRID = 64            # grid steps per dispatch (amortizes launch cost)


def make_kernel(acc_dtype):
    def kernel(w_ref, x_ref, o_ref, acc_ref):
        acc_ref[:] = jnp.dot(w_ref[0], x_ref[0],
                             preferred_element_type=acc_dtype)
        for i in range(1, CHUNKS):
            acc_ref[:] += jnp.dot(w_ref[i], x_ref[0],
                                  preferred_element_type=acc_dtype)
        o_ref[0] = acc_ref[:]

    return kernel


def run(dtype, acc_dtype):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-3, 3, (CHUNKS, M, K))).astype(dtype)
    x = jnp.asarray(rng.integers(-3, 3, (GRID, K, PX))).astype(dtype)
    f = pl.pallas_call(
        make_kernel(acc_dtype),
        grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, K, PX), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, M, PX), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID, M, PX), acc_dtype),
        scratch_shapes=[pltpu.VMEM((M, PX), acc_dtype)],
    )
    jf = jax.jit(lambda a, b: f(a, b))
    y = jf(w, x)
    float(jnp.sum(y[..., ::37, ::501].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(REPS):
        y = jf(w, x)
    float(jnp.sum(y[..., ::37, ::501].astype(jnp.float32)))
    dt = (time.time() - t0) / REPS
    ops = 2 * M * K * PX * CHUNKS * GRID
    print(f"{np.dtype(dtype).name}: {dt*1e6:.0f} us/kernel = "
          f"{ops/dt/1e12:.1f} T(FL)OP/s", flush=True)
    return dt


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    t_bf = run(jnp.bfloat16, jnp.float32)
    try:
        t_i8 = run(jnp.int8, jnp.int32)
        print(f"int8 speedup vs bf16: {t_bf/t_i8:.2f}x")
    except Exception as e:  # noqa: BLE001
        print("int8 dot FAILED:", str(e)[:400])
