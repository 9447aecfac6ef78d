#!/usr/bin/env python
"""Probe pltpu.bitcast + pltpu.roll semantics for packed sub-32-bit
feature storage (PERF.md int8/bf16-packed design).

Questions:
 P1: bitcast (R, L) int32 -> bf16: output shape + element mapping
     (which sublane holds the low/high 16 bits of each word).
 P2: roll(int32 packed, axis=lane) then bitcast == bitcast then roll?
     (lane-axis roll shifts whole 32-bit words, so the two bf16
     channels packed in a word must travel together).
 P3: int8 x int8 -> int32 dot_general inside pallas on this stack.
 P4: bitcast (R, L) int32 -> int8 mapping (4 int8 per word).
 P5: throughput: bf16 matmul vs int8 matmul at kernel shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(kernel, out_shape, *args, **kw):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        **kw,
    )(*args)


def p1():
    R, L = 8, 128
    # word = (hi16 << 16) | lo16, with distinct recognizable bf16 values
    lo = np.arange(R * L, dtype=np.float32).reshape(R, L)
    hi = lo + 10000.0
    lo16 = lo.astype(jnp.bfloat16).view(np.uint16).astype(np.uint32)
    hi16 = hi.astype(jnp.bfloat16).view(np.uint16).astype(np.uint32)
    words = ((hi16 << 16) | lo16).astype(np.int32)

    def k(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.bfloat16)

    out = run(k, jax.ShapeDtypeStruct((2 * R, L), jnp.bfloat16),
              jnp.asarray(words))
    out = np.asarray(out, np.float32)
    print("P1 out shape:", out.shape)
    # hypothesis A: row 2i = lo of input row i, row 2i+1 = hi (interleave)
    a = (np.allclose(out[0::2], lo, atol=64) and
         np.allclose(out[1::2], hi, atol=64))
    # hypothesis B: rows [0:R] = lo, rows [R:2R] = hi (blocked)
    b = (np.allclose(out[:R], lo, atol=64) and
         np.allclose(out[R:], hi, atol=64))
    print("P1 interleaved(2i=lo,2i+1=hi):", a, " blocked([:R]=lo):", b)
    if not (a or b):
        print("P1 sample out[0,:4]:", out[0, :4], " out[1,:4]:", out[1, :4],
              " expected lo[0,:4]:", lo[0, :4])


def p2():
    R, L = 8, 256
    rng = np.random.default_rng(0)
    lo = rng.standard_normal((R, L)).astype(jnp.bfloat16)
    hi = rng.standard_normal((R, L)).astype(jnp.bfloat16)
    words = ((hi.view(np.uint16).astype(np.uint32) << 16)
             | lo.view(np.uint16).astype(np.uint32)).astype(np.int32)
    SHIFT = 7

    def k(x_ref, o_ref):
        r = pltpu.roll(x_ref[:], SHIFT, axis=1)
        o_ref[:] = pltpu.bitcast(r, jnp.bfloat16)

    out = np.asarray(run(k, jax.ShapeDtypeStruct((2 * R, L), jnp.bfloat16),
                         jnp.asarray(words)), np.float32)
    lo_r = np.roll(lo.astype(np.float32), SHIFT, axis=1)
    hi_r = np.roll(hi.astype(np.float32), SHIFT, axis=1)
    ok_i = np.allclose(out[0::2], lo_r) and np.allclose(out[1::2], hi_r)
    ok_b = np.allclose(out[:R], lo_r) and np.allclose(out[R:], hi_r)
    print("P2 roll-then-bitcast == packed roll: interleaved:", ok_i,
          " blocked:", ok_b)


def p3():
    M, K, N = 128, 128, 256
    rng = np.random.default_rng(1)
    a = rng.integers(-127, 127, (M, K), dtype=np.int8)
    b = rng.integers(-127, 127, (K, N), dtype=np.int8)

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    try:
        out = np.asarray(run(k, jax.ShapeDtypeStruct((M, N), jnp.int32),
                             jnp.asarray(a), jnp.asarray(b)))
        ref = a.astype(np.int32) @ b.astype(np.int32)
        print("P3 int8 dot in pallas: ok =", np.array_equal(out, ref))
    except Exception as e:
        print("P3 int8 dot FAILED:", str(e)[:300])


def p4():
    R, L = 8, 128
    vals = np.arange(4 * R * L, dtype=np.int32).reshape(4, R, L) % 256 - 128
    v = vals.astype(np.int8).astype(np.uint8).astype(np.uint32)
    words = (v[0] | (v[1] << 8) | (v[2] << 16) | (v[3] << 24)).astype(np.int32)

    def k(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int8)

    try:
        out = np.asarray(run(k, jax.ShapeDtypeStruct((4 * R, L), jnp.int8),
                             jnp.asarray(words)))
        exp = vals.astype(np.int8)
        ok_i = all(np.array_equal(out[j::4], exp[j]) for j in range(4))
        ok_b = all(np.array_equal(out[j * R:(j + 1) * R], exp[j])
                   for j in range(4))
        print("P4 int32->int8 bitcast: interleaved:", ok_i, " blocked:", ok_b)
        if not (ok_i or ok_b):
            print("P4 sample out[:5,0]:", out[:5, 0],
                  " exp bytes [v0,v1,v2,v3][0,0]:", [int(exp[j][0, 0]) for j in range(4)])
    except Exception as e:
        print("P4 bitcast int8 FAILED:", str(e)[:300])


def p5():
    import time
    M, K, N, REPS = 256, 256, 4096, 64

    def mk(dtype, acc):
        def k(a_ref, b_ref, o_ref):
            def body(i, _):
                o_ref[:] = jax.lax.dot_general(
                    a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=acc)
                return 0
            jax.lax.fori_loop(0, REPS, body, 0)
        return k

    rng = np.random.default_rng(2)
    for name, dt, acc in (("bf16", jnp.bfloat16, jnp.float32),
                          ("int8", jnp.int8, jnp.int32)):
        if dt == jnp.int8:
            a = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
            b = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
        else:
            a = jnp.asarray(rng.standard_normal((M, K)), dt)
            b = jnp.asarray(rng.standard_normal((K, N)), dt)
        try:
            f = jax.jit(lambda a, b: pl.pallas_call(
                mk(dt, acc),
                out_shape=jax.ShapeDtypeStruct((M, N), acc),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b))
            out = f(a, b); _ = float(jnp.sum(out[::97, ::97]))
            t0 = time.time()
            for _ in range(20):
                out = f(a, b)
            _ = float(jnp.sum(out[::97, ::97]))
            dt_s = (time.time() - t0) / 20
            tops = 2 * M * K * N * REPS / dt_s / 1e12
            print(f"P5 {name}: {tops:.1f} T(FL)OP/s ({dt_s*1e3:.2f} ms/call)")
        except Exception as e:
            print(f"P5 {name} FAILED:", str(e)[:200])


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    p1(); p2(); p3(); p4(); p5()
