#!/usr/bin/env python
"""Ablate the int8-i32 MERGE kernel's cost components on hardware.

Where do the ~1.96 ms/sweep go at the production geometry (60 blocks
of S=112 at 540x960)? Variants surgically remove one mechanism each
(numerics intentionally wrong — this measures COST):

  full        : production _rdb_kernel_int8_i32_merge
  no_requant  : x1..x4 reuse slices of xq (skips the 4 inter-conv
                requant passes + the final x5 dequant stays)
  no_merge    : xm taken straight from x_ref (skips ring composition)
  no_roll     : taps use the unshifted source
  mxu_only    : no_requant + no_merge + no_roll

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_i32_ablate.py
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
REPS = 30


def make_kernel(no_requant=False, no_merge=False, no_roll=False):
    S, PX, NT, NF, GC = F.S, F.PX, F.NT, F.NF, F.GC
    TPC_NF, TPC_GC = F.TPC_NF_I32, F.TPC_GC_I32

    def tap_roll(src, di, dj):
        if no_roll:
            return src
        shift = (1 - di) * S + (1 - dj)
        return src if shift == 0 else pltpu.roll(src, shift % PX, axis=1)

    def accum_raw(src_packed, w_ref, acc_ref, c, tpc, off, init=False):
        n = len(F.TAPS)
        t = 0
        k = 0
        while t < n:
            m = min(tpc, n - t)
            parts = [tap_roll(src_packed, *F.TAPS[t + u]) for u in range(m)]
            packed = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
            chunk = pltpu.bitcast(packed, jnp.int8)
            contrib = jax.lax.dot_general(
                w_ref[:, k:k + m * c], chunk,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            if init and t == 0:
                acc_ref[off:NT] = contrib
            else:
                acc_ref[off:NT] += contrib
            k += m * c
            t += m

    def kernel(ext_ref, aq_ref, x_ref, up_ref, dn_ref, lf_ref, rt_ref,
               dul_ref, dur_ref, ddl_ref, ddr_ref,
               wx_ref, w1_ref, w2_ref, w3_ref, w4_ref, osc_ref, ob_ref,
               o_ref, acc_ref, xm_ref, xq_ref, x1_ref, x2_ref, x3_ref,
               x4_ref):
        if no_merge:
            xm_ref[:] = pltpu.bitcast(x_ref[0], jnp.int32)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
            valid = lanes >= 0
        else:
            valid = F._merge_ring_packed(
                ext_ref, x_ref, up_ref, dn_ref, lf_ref, rt_ref,
                dul_ref, dur_ref, ddl_ref, ddr_ref, xm_ref)
        xm = pltpu.bitcast(xm_ref[:], jnp.bfloat16)
        inv0 = aq_ref[5]
        q0 = jnp.clip(jnp.round(xm.astype(jnp.float32) * inv0),
                      -127.0, 127.0)
        xq_ref[:] = pltpu.bitcast(q0.astype(jnp.int8), jnp.int32)

        def requant(r0, r1, dst):
            if no_requant:
                dst[:] = xq_ref[0:GC // 4]
                return
            v = (acc_ref[r0:r1].astype(jnp.float32) * osc_ref[r0:r1]
                 + ob_ref[r0:r1])
            q = jnp.where(valid,
                          jnp.clip(jnp.round(F._lrelu(v)), -127.0, 127.0),
                          0.0)
            dst[:] = pltpu.bitcast(q.astype(jnp.int8), jnp.int32)

        accum_raw(xq_ref[:], wx_ref, acc_ref, NF, TPC_NF, 0, init=True)
        requant(0, 32, x1_ref)
        accum_raw(x1_ref[:], w1_ref, acc_ref, GC, TPC_GC, 32)
        requant(32, 64, x2_ref)
        accum_raw(x2_ref[:], w2_ref, acc_ref, GC, TPC_GC, 64)
        requant(64, 96, x3_ref)
        accum_raw(x3_ref[:], w3_ref, acc_ref, GC, TPC_GC, 96)
        requant(96, 128, x4_ref)
        accum_raw(x4_ref[:], w4_ref, acc_ref, GC, TPC_GC, 128)
        x5 = (acc_ref[128:NT].astype(jnp.float32) * osc_ref[128:NT]
              + ob_ref[128:NT])
        o_ref[0] = (0.2 * jnp.where(valid, x5, 0.0)).astype(jnp.bfloat16) + xm

    return kernel


def build(variant_kernel, nb, nw, wide):
    S, PX, NT, NF, GC = F.S, F.PX, F.NT, F.NF, F.GC
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=F._merge_in_specs(nb, nw)
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NT, PX), jnp.int32),
            pltpu.VMEM((NF // 2, PX), jnp.int32),
            pltpu.VMEM((NF // 4, PX), jnp.int32),
            pltpu.VMEM((GC // 4, PX), jnp.int32),
            pltpu.VMEM((GC // 4, PX), jnp.int32),
            pltpu.VMEM((GC // 4, PX), jnp.int32),
            pltpu.VMEM((GC // 4, PX), jnp.int32),
        ],
    )

    def call(extents, blocks):
        return pl.pallas_call(
            variant_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, NF, PX), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=F.VMEM_LIMIT),
        )(extents, wide["act_q"], *([blocks] * 9), wide["Wx"],
          wide["W1"], wide["W2"], wide["W3"], wide["W4"],
          wide["oscale"], wide["obias"])

    return call


def main():
    print("platform:", jax.devices()[0].platform,
          "TPC:", F.TPC_NF_I32, F.TPC_GC_I32)
    nh, nw = F._grid_dims(H, W)
    nb = nh * nw
    extents = jnp.asarray(F._block_extents(H, W, nh, nw))
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(
        rng.standard_normal((nb, F.NF, F.PX)) * 0.1, jnp.bfloat16)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0),
                           rrdb.RRDBConfig(num_block=1, scale=2),
                           dtype=jnp.bfloat16)
        rdbp = jax.device_get(params["body"][0]["rdb1"])
        amax = np.full((5,), 3.0, np.float32)
        wide = F.rdb_wide_weights_int8_i32(rdbp, act_amax=amax)
    wide = jax.device_put(wide, jax.devices()[0])

    variants = [
        ("full", {}),
        ("no_requant", dict(no_requant=True)),
        ("no_merge", dict(no_merge=True)),
        ("no_roll", dict(no_roll=True)),
        ("mxu_only", dict(no_requant=True, no_merge=True, no_roll=True)),
    ]
    results = {}
    for name, kw in variants:
        fn = jax.jit(build(make_kernel(**kw), nb, nw, wide))
        y = fn(extents, blocks)
        y.block_until_ready()
        t0 = time.time()
        for _ in range(REPS):
            y = fn(extents, blocks)
        y.block_until_ready()
        dt = (time.time() - t0) / REPS
        results[name] = dt * 1e3
        print(f"{name:12s}: {dt*1e3:7.3f} ms/sweep ({nb} blocks)")
    # re-run full to bound warmup drift
    fn = jax.jit(build(make_kernel(), nb, nw, wide))
    y = fn(extents, blocks); y.block_until_ready()
    t0 = time.time()
    for _ in range(REPS):
        y = fn(extents, blocks)
    y.block_until_ready()
    print(f"{'full(re)':12s}: {(time.time()-t0)/REPS*1e3:7.3f} ms/sweep")


if __name__ == "__main__":
    main()
