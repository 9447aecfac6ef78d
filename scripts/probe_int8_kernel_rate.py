#!/usr/bin/env python
"""bf16 vs int8 matmul rate at the fused-RDB kernel's real shapes.

Mimics the kernel's inner structure: a VMEM-resident activation block
(C, PX), rolled per tap (data-dependence prevents folding), wide weight
matrix, f32/int32 accumulation into a VMEM scratch. Decides whether the
int8-native body (PERF.md §4) can beat bf16 on this stack.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PX = 4096
NT = 192
ROUNDS = 512  # simulated conv rounds per kernel call (amortize dispatch)


def bf16_kernel(x_ref, w_ref, o_ref, acc_ref):
    # x: (64, PX) bf16 stored packed as (32, PX) int32; w: (NT, 128) bf16
    def body(i, _):
        rolled = pltpu.roll(x_ref[:], i + 1, axis=1)
        a = pltpu.bitcast(rolled, jnp.bfloat16)            # (64, PX)
        chunk = jnp.concatenate([a, pltpu.bitcast(
            pltpu.roll(x_ref[:], i + 2, axis=1), jnp.bfloat16)], axis=0)
        acc_ref[:] += jnp.dot(w_ref[:], chunk,
                              preferred_element_type=jnp.float32)
        return 0
    jax.lax.fori_loop(0, ROUNDS, body, 0)
    o_ref[:] = acc_ref[0:8]


def int8_kernel(x_ref, w_ref, o_ref, acc_ref):
    # x: (64, PX) int8 packed as (16, PX) int32; w: (NT, 256) int8
    def body(i, _):
        a = pltpu.bitcast(pltpu.roll(x_ref[:], i + 1, axis=1), jnp.int8)
        b = pltpu.bitcast(pltpu.roll(x_ref[:], i + 2, axis=1), jnp.int8)
        c = pltpu.bitcast(pltpu.roll(x_ref[:], i + 3, axis=1), jnp.int8)
        d = pltpu.bitcast(pltpu.roll(x_ref[:], i + 4, axis=1), jnp.int8)
        chunk = jnp.concatenate([a, b, c, d], axis=0)      # (256, PX)
        acc_ref[:] += jnp.dot(w_ref[:], chunk,
                              preferred_element_type=jnp.int32)
        return 0
    jax.lax.fori_loop(0, ROUNDS, body, 0)
    o_ref[:] = acc_ref[0:8].astype(jnp.float32)


def time_kernel(kernel, x, w, acc_dtype, k_width, flops_per_round):
    f = jax.jit(lambda x, w: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, PX), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NT, PX), acc_dtype)],
    )(x, w))
    out = f(x, w); _ = float(jnp.sum(out[:, ::511]))
    t0 = time.time()
    N = 30
    for _ in range(N):
        out = f(x, w)
    _ = float(jnp.sum(out[:, ::511]))
    dt = (time.time() - t0) / N
    tops = ROUNDS * flops_per_round / dt / 1e12
    return dt, tops


def main():
    rng = np.random.default_rng(0)
    print("platform:", jax.devices()[0].platform)

    xb = jnp.asarray(rng.integers(-2**30, 2**30, (32, PX), dtype=np.int64)
                     .astype(np.int32))
    wb = jnp.asarray(rng.standard_normal((NT, 128)), jnp.bfloat16)
    dt, tops = time_kernel(bf16_kernel, xb, wb, jnp.float32, 128,
                           2 * NT * 128 * PX)
    print(f"bf16 K=128: {dt*1e3:.2f} ms/call, {tops:.1f} TFLOP/s")

    xi = jnp.asarray(rng.integers(-2**30, 2**30, (16, PX), dtype=np.int64)
                     .astype(np.int32))
    wi = jnp.asarray(rng.integers(-127, 127, (NT, 256), dtype=np.int8))
    try:
        dt, tops = time_kernel(int8_kernel, xi, wi, jnp.int32, 256,
                               2 * NT * 256 * PX)
        print(f"int8 K=256: {dt*1e3:.2f} ms/call, {tops:.1f} TOP/s")
    except Exception as e:
        print("int8 FAILED:", str(e)[:400])


if __name__ == "__main__":
    main()
