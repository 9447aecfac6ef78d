#!/usr/bin/env python
"""Probe int8 primitives on the TPU for the int8-native RDB kernel:

a) pltpu.bitcast (C/4, PX) int32 -> int8: resulting shape + byte order
   (need channel-block expansion on the sublane axis).
b) int8 x int8 -> int32 matmul rate vs bf16 (expect ~2x).
c) roll packed int32 then bitcast: tap-shift correctness for packed
   int8 channels.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_bitcast():
    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int8)

    x = np.arange(8 * 256, dtype=np.int32).reshape(8, 256)
    # pack known bytes: row r, lane l -> bytes [b0..b3] = (r, l%256, 2r, 7)
    packed = ((x // 256 % 8).astype(np.uint32)
              | ((x % 256).astype(np.uint32) << 8)
              | (((x // 256 % 8) * 2).astype(np.uint32) << 16)
              | (np.uint32(7) << 24)).astype(np.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((32, 256), jnp.int8),
        )(jnp.asarray(packed))
        out = np.asarray(out)
        print("bitcast OK shape:", out.shape)
        print("row0[:8]:", out[0, :8], "row1[:8]:", out[1, :8])
        print("row2[:8]:", out[2, :8], "row3[:8]:", out[3, :8])
        print("row4[:8]:", out[4, :8])
    except Exception as e:  # noqa: BLE001
        print("bitcast (8,256)i32 -> (32,256)i8 FAILED:", str(e)[:300])

    # alternate target shape: (8, 1024)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.int8),
        )(jnp.asarray(packed))
        print("bitcast to (8,1024) OK; row0[:12]:", np.asarray(out)[0, :12])
    except Exception as e:  # noqa: BLE001
        print("bitcast (8,1024) FAILED:", str(e)[:200])


def probe_int8_matmul_rate():
    def mk(dtype, acc):
        def kernel(a_ref, b_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                               preferred_element_type=acc)
        return kernel

    M = K = N = 1024
    reps = 30
    for dtype, acc in ((jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)):
        rng = np.random.default_rng(0)
        a = rng.integers(-100, 100, (M, K)).astype(np.float32)
        b = rng.integers(-100, 100, (K, N)).astype(np.float32)
        aj = jnp.asarray(a).astype(dtype)
        bj = jnp.asarray(b).astype(dtype)

        def chain(a0, b0, n=reps):
            # chain distinct data through iterations (axon microbench trap)
            def body(c, _):
                y = pl.pallas_call(
                    mk(dtype, acc),
                    out_shape=jax.ShapeDtypeStruct((M, N), acc),
                )(a0 + c.astype(dtype), b0)
                return (y[:1, :1].reshape(()).astype(jnp.int32)
                        % 3).astype(jnp.int8), y
            c, ys = jax.lax.scan(body, jnp.int8(0), None, length=n)
            return ys[-1]

        try:
            f = jax.jit(chain)
            y = f(aj, bj)
            float(jnp.sum(y[::97, ::97].astype(jnp.float32)))
            t0 = time.time()
            y = f(aj, bj)
            float(jnp.sum(y[::97, ::97].astype(jnp.float32)))
            dt = (time.time() - t0) / reps
            tflops = 2 * M * K * N / dt / 1e12
            print(f"{dtype.__name__} matmul {M}^3: {dt*1e6:.0f} us "
                  f"= {tflops:.1f} T(FL)OP/s")
        except Exception as e:  # noqa: BLE001
            print(f"{dtype.__name__} matmul FAILED:", str(e)[:300])


def probe_packed_roll():
    def kernel(x_ref, o_ref):
        r = pltpu.roll(x_ref[:], 1, axis=1)
        o_ref[:] = pltpu.bitcast(r, jnp.int8)

    rng = np.random.default_rng(1)
    vals = rng.integers(-128, 128, (32, 256), dtype=np.int64)
    packed = np.zeros((8, 256), np.int32)
    for r in range(8):
        for byte in range(4):
            packed[r] |= (vals[4 * r + byte] & 0xFF).astype(np.int32) << (8 * byte)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((32, 256), jnp.int8),
        )(jnp.asarray(packed))
        out = np.asarray(out)
        want = np.roll(vals, 1, axis=1).astype(np.int8)
        # match under byte->sublane order hypothesis: out[4r+b] = byte b
        ok = np.array_equal(out, want)
        print("packed roll+bitcast matches byte-sublane order:", ok)
        if not ok:
            print("out[0,:6]", out[0, :6], "want[0,:6]", want[0, :6])
            print("out[1,:6]", out[1, :6], "want[1,:6]", want[1, :6])
    except Exception as e:  # noqa: BLE001
        print("packed roll FAILED:", str(e)[:300])


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    probe_bitcast()
    probe_int8_matmul_rate()
    probe_packed_roll()
