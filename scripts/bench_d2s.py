#!/usr/bin/env python
"""Decompose the tail's final depth-to-space cost at 4K.

The trace shows the ROOT reshape to (1,2160,3840,3) costs ~13.5
ms/frame (~100x off bandwidth). Which part — the P/Q phase
interleave, or the channel-minor (NHWC C=3) relayout? Times each
stage separately, plus candidate cheaper formulations.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_d2s.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

B, H, W = 1, 540, 960  # body res; output 4x = 2160x3840


def timeit(fn, x, reps=20):
    f = jax.jit(fn)
    y = f(x)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(reps):
        y = f(x)
    jax.block_until_ready(y)
    return (time.time() - t0) / reps * 1e3


def main():
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    # tail2 kernel output, channel-major phases: (B, P, Q, 3, h, w)
    t = jnp.asarray(rng.standard_normal((B, 4, 4, 3, H, W)),
                    jnp.bfloat16)

    def full(t):
        # current fused_tail2_image ending
        y = t.transpose(0, 4, 1, 5, 2, 3)          # (B,h,P,w,Q,3)
        return y.reshape(B, 4 * H, 4 * W, 3)

    def interleave_only(t):
        # phases -> channel-major 4K (no NHWC move)
        y = t.transpose(0, 3, 4, 1, 5, 2)          # (B,3,h,P,w,Q)
        return y.reshape(B, 3, 4 * H, 4 * W)

    cm = jnp.asarray(rng.standard_normal((B, 3, 4 * H, 4 * W)),
                     jnp.bfloat16)

    def nhwc_move(x):
        return x.transpose(0, 2, 3, 1)             # (B,4h,4w,3)

    def nhwc_move_u8(x):
        return (jnp.clip(x.astype(jnp.float32), 0, 1) * 255 + 0.5
                ).astype(jnp.uint8).transpose(0, 2, 3, 1)

    def full_u8(t):
        y = t.transpose(0, 4, 1, 5, 2, 3).reshape(B, 4 * H, 4 * W, 3)
        return (jnp.clip(y.astype(jnp.float32), 0, 1) * 255 + 0.5
                ).astype(jnp.uint8)

    def u8_first(t):
        q = (jnp.clip(t.astype(jnp.float32), 0, 1) * 255 + 0.5
             ).astype(jnp.uint8)
        y = q.transpose(0, 4, 1, 5, 2, 3)
        return y.reshape(B, 4 * H, 4 * W, 3)

    # P-interleave via one sublane-dim reshape after lane interleave?
    def two_stage(t):
        # stage 1: lane interleave Q into w (channel-major)
        y = t.transpose(0, 3, 1, 4, 5, 2).reshape(B, 3, 4, H, 4 * W)
        # stage 2: row interleave P
        y = y.transpose(0, 1, 3, 2, 4).reshape(B, 3, 4 * H, 4 * W)
        return y.transpose(0, 2, 3, 1)

    for name, fn, x in (
        ("full (current)", full, t),
        ("interleave_only (to chan-major)", interleave_only, t),
        ("nhwc_move (chan-major->NHWC)", nhwc_move, cm),
        ("nhwc_move_u8 (fused u8 cast)", nhwc_move_u8, cm),
        ("full_u8 (d2s then u8)", full_u8, t),
        ("u8_first (u8 then d2s)", u8_first, t),
        ("two_stage (lane then row)", two_stage, t),
    ):
        print(f"{name:34s}: {timeit(fn, x):7.2f} ms")


if __name__ == "__main__":
    main()
