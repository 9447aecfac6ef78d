#!/usr/bin/env python
"""In-context A/B of the tail2 ENDING layout (the ~13.5 ms/frame ROOT
depth-to-space seen in the round-4 trace).

The standalone bench (bench_d2s.py) is useless: a jit whose whole body
is transpose/reshape compiles to a layout-change bitcast (0.02 ms for
100 MB).  Here each variant runs the FULL fast path (head + merge body
+ tail2 kernel) so the ending competes with a real producer layout.

Variants:
  nhwc      current ending: (b,4,4,8,h,w)[:, :, :, :3] -> (b,4h,4w,3)
  two_stage lane-interleave Q, then row-interleave P, then NHWC move
  cm        channel-major root (b,3,4h,4w)  [contract change; info only]
  u8        NHWC uint8 root (production no-yuv path folds the cast)
  yuv420    phase-space BT.601 -> (Y (b,4h,4w), U/V (b,2h,2w)) uint8

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_d2s_ctx.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb
from framewright_tpu.models.layers import conv2d
from framewright_tpu.ops import fused_tail as ft
from framewright_tpu.ops.fused_rrdb import rrdb_body_fast

H, W = 1080, 1920


def tail2_phases(params, fast_params, feat, body_out):
    """head..tail2 kernel -> phase tensor (b, 4, 4, 3, h, w) bf16."""
    feat = feat + conv2d(params["conv_body"], body_out.astype(feat.dtype))
    fcm = feat.transpose(0, 3, 1, 2).astype(jnp.bfloat16)
    b, _, h, w = fcm.shape
    nh, nw = -(-h // ft.BH2), -(-w // ft.BH2)
    hp, wp = nh * ft.BH2, nw * ft.BH2
    x = jnp.pad(fcm, ((0, 0), (0, 0), (ft.HALO2, hp - h + ft.HALO2),
                      (ft.HALO2, wp - w + ft.HALO2)))
    windows, extents = [], []
    for i in range(nh):
        for j in range(nw):
            windows.append(jax.lax.slice(
                x, (0, 0, i * ft.BH2, j * ft.BH2),
                (b, ft.NF, i * ft.BH2 + ft.S2, j * ft.BH2 + ft.S2)))
            extents.append((ft.HALO2 if i == 0 else 0,
                            min(ft.S2, ft.HALO2 + h - i * ft.BH2),
                            ft.HALO2 if j == 0 else 0,
                            min(ft.S2, ft.HALO2 + w - j * ft.BH2)))
    nt = nh * nw
    blocks = jnp.stack(windows, axis=1).reshape(b * nt, ft.NF, ft.PX2)
    ext = jnp.asarray(np.tile(np.asarray(extents, np.int32), (b, 1)))
    out = ft.fused_tail2_blocks(blocks, ext, fast_params["tail2_phase"])
    out = out.reshape(b, nt, 128, ft.S2, ft.S2)[
        :, :, :, ft.HALO2:ft.S2 - ft.HALO2, ft.HALO2:ft.S2 - ft.HALO2]
    out = out.reshape(b, nh, nw, 128, ft.BH2, ft.BH2)
    out = out.transpose(0, 3, 1, 4, 2, 5).reshape(b, 128, hp, wp)
    out = out[:, :, :h, :w]
    return out.reshape(b, 4, 4, 8, h, w)[:, :, :, :3]


def end_nhwc(t):
    b, _, _, _, h, w = t.shape
    return t.transpose(0, 4, 1, 5, 2, 3).reshape(b, 4 * h, 4 * w, 3)


def end_two_stage(t):
    b, _, _, _, h, w = t.shape
    y = t.transpose(0, 3, 1, 4, 5, 2).reshape(b, 3, 4, h, 4 * w)
    y = y.transpose(0, 1, 3, 2, 4).reshape(b, 3, 4 * h, 4 * w)
    return y.transpose(0, 2, 3, 1)


def end_cm(t):
    b, _, _, _, h, w = t.shape
    return t.transpose(0, 3, 4, 1, 5, 2).reshape(b, 3, 4 * h, 4 * w)


def end_u8(t):
    b, _, _, _, h, w = t.shape
    q = (jnp.clip(t.astype(jnp.float32), 0, 1) * 255 + 0.5
         ).astype(jnp.uint8)
    return q.transpose(0, 4, 1, 5, 2, 3).reshape(b, 4 * h, 4 * w, 3)


def end_yuv420(t):
    # BT.601 limited-range in PHASE space: the C=3-minor 4K NHWC array
    # never exists; every op's lane dim is w (960) or 4w.
    b, _, _, _, h, w = t.shape
    y = jnp.clip(t.astype(jnp.float32), 0, 1) * 255.0
    r, g, bb = y[:, :, :, 0], y[:, :, :, 1], y[:, :, :, 2]
    kr, kg, kb = 0.299, 0.587, 0.114
    yy = kr * r + kg * g + kb * bb                 # (b,4,4,h,w)
    uu = (bb - yy) / (2.0 * (1.0 - kb))
    vv = (r - yy) / (2.0 * (1.0 - kr))
    yy = yy * (219.0 / 255.0) + 16.0
    uu = uu * (224.0 / 255.0)
    vv = vv * (224.0 / 255.0)
    yp = jnp.clip(jnp.floor(yy + 0.5), 0, 255).astype(jnp.uint8)
    yp = yp.transpose(0, 3, 1, 4, 2).reshape(b, 4 * h, 4 * w)
    # chroma site (2i+p, 2j+q) averages phases (2p+a, 2q+c) at body (i,j)
    def chroma(u):
        u = u.reshape(b, 2, 2, 2, 2, h, w).mean(axis=(2, 4))  # (b,2,2,h,w)
        u = jnp.clip(jnp.floor(u + 128.5), 0, 255).astype(jnp.uint8)
        return u.transpose(0, 3, 1, 4, 2).reshape(b, 2 * h, 2 * w)
    return yp, chroma(uu), chroma(vv)


def sync(t):
    leaves = jax.tree_util.tree_leaves(t)
    return [float(jnp.mean(jnp.ravel(x)[::100001].astype(jnp.float32)))
            for x in leaves]


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = rrdb.RRDBConfig(num_block=23, scale=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        params = rrdb.stack_body(params)
        fast = rrdb.make_fast_params(jax.device_get(params))
    params, fast = jax.device_put((params, fast), jax.devices()[0])
    x = jnp.asarray(np.random.rand(1, H, W, 3), jnp.bfloat16)

    def make(ending):
        @jax.jit
        def fwd(p, fp, t):
            feat = rrdb._head(p, t, cfg)
            body = rrdb_body_fast(feat, fp)
            return ending(tail2_phases(p, fp, feat, body))
        return fwd

    results = {}
    order = [("nhwc", end_nhwc), ("two_stage", end_two_stage),
             ("cm", end_cm), ("u8", end_u8), ("yuv420", end_yuv420),
             ("nhwc#2", end_nhwc)]
    for name, ending in order:
        f = make(ending)
        y = f(params, fast, x)
        sync(y)
        t0 = time.time()
        for _ in range(8):
            y = f(params, fast, x)
        sync(y)
        dt = (time.time() - t0) / 8
        results[name] = dt
        print(f"{name:10s}: {dt*1000:7.1f} ms/frame ({1/dt:.2f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
