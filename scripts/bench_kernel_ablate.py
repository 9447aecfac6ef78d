#!/usr/bin/env python
"""Ablate the fused-RDB kernel's cost components on hardware.

Variants surgically remove one mechanism each (numerics intentionally
wrong where needed — this measures COST, not correctness):
  full         : production kernel
  no_roll      : taps use the unshifted source (roll cost)
  static_scale : int8 only — skip the dynamic absmax reduce
  no_quant     : int8 only — activations reuse the input's quantized
                 words (skips quant_pack per activation)
  no_dequant   : int8 only — accumulate raw int32->f32 without scales
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from framewright_tpu.models import rrdb
from framewright_tpu.ops import fused_rrdb as F

H, W = 540, 960
REPS = 20
TPC_NF, TPC_GC = 4, 8


def make_kernel(mode, no_roll=False, static_scale=False, no_quant=False,
                no_dequant=False):
    S, PX, NT, NF, GC = F.S, F.PX, F.NT, F.NF, F.GC

    def tap_roll(src, di, dj):
        if no_roll:
            return src
        shift = (1 - di) * S + (1 - dj)
        return src if shift == 0 else pltpu.roll(src, shift % PX, axis=1)

    def accum16(src, w_ref, acc_ref, c, tpc, off, init=False):
        n, t, k = 9, 0, 0
        while t < n:
            m = min(tpc, n - t)
            parts = [tap_roll(src, *F.TAPS[t + u]) for u in range(m)]
            packed = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
            chunk = pltpu.bitcast(packed, jnp.bfloat16)
            contrib = jnp.dot(w_ref[:, k:k + m * c], chunk,
                              preferred_element_type=jnp.float32)
            if init and t == 0:
                acc_ref[off:NT] = contrib
            else:
                acc_ref[off:NT] += contrib
            k += m * c
            t += m

    def accum8(src, w_ref, ws_ref, sa, acc_ref, c, tpc, off, init=False):
        n, t, k = 9, 0, 0
        rows = NT - off
        scale = None if no_dequant else ws_ref[0:rows] * sa
        while t < n:
            m = min(tpc, n - t)
            parts = [tap_roll(src, *F.TAPS[t + u]) for u in range(m)]
            packed = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
            chunk = pltpu.bitcast(packed, jnp.int8)
            d = jax.lax.dot_general(
                w_ref[:, k:k + m * c], chunk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            contrib = d if no_dequant else d * scale
            if init and t == 0:
                acc_ref[off:NT] = contrib
            else:
                acc_ref[off:NT] += contrib
            k += m * c
            t += m

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    if mode == "bf16":
        def kernel(ext_ref, x_ref, wx, w1, w2, w3, w4, b_ref,
                   o_ref, acc, xf, x1, x2, x3, x4):
            def act_pack(v):
                return pltpu.bitcast(lrelu(v).astype(jnp.bfloat16),
                                     jnp.int32)
            xf[:] = pltpu.bitcast(x_ref[0], jnp.int32)
            accum16(xf[:], wx, acc, NF, TPC_NF, 0, init=True)
            x1[:] = act_pack(acc[0:32] + b_ref[0:32])
            accum16(x1[:], w1, acc, GC, TPC_GC, 32)
            x2[:] = act_pack(acc[32:64] + b_ref[32:64])
            accum16(x2[:], w2, acc, GC, TPC_GC, 64)
            x3[:] = act_pack(acc[64:96] + b_ref[64:96])
            accum16(x3[:], w3, acc, GC, TPC_GC, 96)
            x4[:] = act_pack(acc[96:128] + b_ref[96:128])
            accum16(x4[:], w4, acc, GC, TPC_GC, 128)
            x5 = acc[128:NT] + b_ref[128:NT]
            o_ref[0] = (0.2 * x5).astype(jnp.bfloat16) + x_ref[0]
        n_in = 6
        scratch = [pltpu.VMEM((NT, PX), jnp.float32),
                   pltpu.VMEM((NF // 2, PX), jnp.int32)] + \
                  [pltpu.VMEM((GC // 2, PX), jnp.int32)] * 4
        return kernel, n_in, scratch

    def kernel(ext_ref, x_ref, wx, w1, w2, w3, w4,
               sx, s1, s2, s3, s4, b_ref,
               o_ref, acc, xq, x1, x2, x3, x4):
        def quant_pack(a, c):
            if static_scale or no_quant or no_dequant:
                sa = jnp.float32(0.01)
                q = jnp.clip(a * 100.0, -127.0, 127.0)
            else:
                amax = jnp.maximum(jnp.max(jnp.abs(a)), 1e-8)
                sa = amax * (1.0 / 127.0)
                q = jnp.clip(jnp.round(a * (127.0 / amax)), -127.0, 127.0)
            return pltpu.bitcast(q.astype(jnp.int8), jnp.int32), sa

        xq0, sa_x = quant_pack(x_ref[0].astype(jnp.float32), NF)
        xq[:] = xq0
        accum8(xq[:], wx, sx, sa_x, acc, NF, TPC_NF, 0, init=True)
        if no_quant:
            # reuse half the input words as the "activation" (cost probe)
            x1[:] = xq[0:GC // 4]
            x2[:] = xq[0:GC // 4]
            x3[:] = xq[0:GC // 4]
            x4[:] = xq[0:GC // 4]
            accum8(x1[:], w1, s1, sa_x, acc, GC, TPC_GC, 32)
            accum8(x2[:], w2, s2, sa_x, acc, GC, TPC_GC, 64)
            accum8(x3[:], w3, s3, sa_x, acc, GC, TPC_GC, 96)
            accum8(x4[:], w4, s4, sa_x, acc, GC, TPC_GC, 128)
        else:
            q, sa = quant_pack(lrelu(acc[0:32] + b_ref[0:32]), GC)
            x1[:] = q
            accum8(x1[:], w1, s1, sa, acc, GC, TPC_GC, 32)
            q, sa = quant_pack(lrelu(acc[32:64] + b_ref[32:64]), GC)
            x2[:] = q
            accum8(x2[:], w2, s2, sa, acc, GC, TPC_GC, 64)
            q, sa = quant_pack(lrelu(acc[64:96] + b_ref[64:96]), GC)
            x3[:] = q
            accum8(x3[:], w3, s3, sa, acc, GC, TPC_GC, 96)
            q, sa = quant_pack(lrelu(acc[96:128] + b_ref[96:128]), GC)
            x4[:] = q
            accum8(x4[:], w4, s4, sa, acc, GC, TPC_GC, 128)
        x5 = acc[128:NT] + b_ref[128:NT]
        o_ref[0] = (0.2 * x5).astype(jnp.bfloat16) + x_ref[0]

    n_in = 11
    scratch = [pltpu.VMEM((NT, PX), jnp.float32),
               pltpu.VMEM((NF // 4, PX), jnp.int32)] + \
              [pltpu.VMEM((GC // 4, PX), jnp.int32)] * 4
    return kernel, n_in, scratch


def run_variant(name, mode, wts, blocks, ext, **kw):
    kernel, n_in, scratch = make_kernel(mode, **kw)
    S, PX, NT, NF = F.S, F.PX, F.NT, F.NF
    nb = blocks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    if mode == "bf16":
        args = (ext, blocks, wts["Wx"], wts["W1"], wts["W2"], wts["W3"],
                wts["W4"], wts["b"])
    else:
        args = (ext, blocks, wts["Wx"], wts["W1"], wts["W2"], wts["W3"],
                wts["W4"], wts["sx"], wts["s1"], wts["s2"], wts["s3"],
                wts["s4"], wts["b"])
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, NF, PX), jnp.bfloat16))(*a))
    try:
        y = f(*args)
        float(jnp.mean(y[::37, 0, ::511].astype(jnp.float32)))
        t0 = time.time()
        for _ in range(REPS):
            y = f(*args)
        float(jnp.mean(y[::37, 0, ::511].astype(jnp.float32)))
        dt = (time.time() - t0) / REPS
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name} FAILED: {str(e)[:160]}", flush=True)


def main():
    import os
    os.environ.setdefault("FW_TPC_NF_I8", str(TPC_NF))
    os.environ.setdefault("FW_TPC_GC_I8", str(TPC_GC))
    print("platform:", jax.devices()[0].platform, "S:", F.S, flush=True)
    nh, nw = -(-H // F.BH), -(-W // F.BH)
    nb = nh * nw
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        p1 = rrdb.init(jax.random.PRNGKey(0), rrdb.RRDBConfig(num_block=1),
                       dtype=jnp.bfloat16)
        rdbp = p1["body"][0]["rdb1"]
        w16 = F.rdb_wide_weights(rdbp)
        w8 = F.rdb_wide_weights_int8(rdbp)
    dev = jax.devices()[0]
    w16, w8 = jax.device_put((w16, w8), dev)
    rng = np.random.default_rng(0)
    blocks = jax.device_put(jnp.asarray(
        rng.standard_normal((nb, F.NF, F.PX)).astype(np.float32) * 0.5,
        jnp.bfloat16), dev)
    ext = np.zeros((nb, 4), np.int32)
    ext[:, 1] = F.S
    ext[:, 3] = F.S
    ext = jax.device_put(jnp.asarray(ext), dev)

    run_variant("bf16 full     ", "bf16", w16, blocks, ext)
    run_variant("bf16 no_roll  ", "bf16", w16, blocks, ext, no_roll=True)
    run_variant("int8 full     ", "int8", w8, blocks, ext)
    run_variant("int8 no_roll  ", "int8", w8, blocks, ext, no_roll=True)
    run_variant("int8 static_sc", "int8", w8, blocks, ext, static_scale=True)
    run_variant("int8 no_quant ", "int8", w8, blocks, ext, no_quant=True)
    run_variant("int8 no_dequant", "int8", w8, blocks, ext, no_dequant=True)


if __name__ == "__main__":
    main()
