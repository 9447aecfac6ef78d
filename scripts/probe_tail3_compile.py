#!/usr/bin/env python
"""Compile-probe the resident-tail (tail3) kernels on device, in
isolation from the full model.

History: the first tail3 was ONE ~120-dot kernel (ring-merge +
conv_body + skip + up1/up2/hr/last). At the body geometry (S=112,
PX=12544) it reproducibly crashed the axon remote compile helper
(HTTP 500, tpu_compile_helper exit 1) after ~14 min, both inside
apply_fast and kernel-alone. tail3 is now a two-kernel split
(ops/fused_tail3.py): K1 = merge + conv_body + skip (small), K2 = the
tail2 phase-tail kernel parametrized to s2=112. This probe compiles
each stage separately so a future failure is attributable.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_tail3_compile.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb
from framewright_tpu.ops import fused_rrdb as fr
from framewright_tpu.ops import fused_tail3 as t3


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = rrdb.RRDBConfig(num_block=2, scale=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        hp = jax.device_get(rrdb.stack_body(params))
        fast = rrdb.make_fast_params(hp)
    wts = jax.device_put(fast["tail3_phase"], jax.devices()[0])

    # production per-frame grid at 1080p x2: body 540x960 -> 6x10 blocks
    nh, nw = 6, 10
    nb = nh * nw
    rng = np.random.RandomState(0)
    blocks = jnp.asarray(rng.rand(nb, fr.NF, fr.PX), jnp.bfloat16)
    feat = jnp.asarray(rng.rand(nb, fr.NF, fr.PX), jnp.bfloat16)
    extents = jnp.asarray(fr._block_extents(540, 960, nh, nw))

    f = jax.jit(lambda b, ft_, e: t3.conv_body_skip_blocks(
        b, ft_, e, wts, nw))
    t0 = time.time()
    try:
        y = f(blocks, feat, extents)
        y.block_until_ready()
        print(f"K1 (conv_body+skip) compile+run OK in "
              f"{time.time()-t0:.0f}s, out {y.shape} {y.dtype}",
              flush=True)
    except Exception as e:
        print(f"K1 FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        return

    g = jax.jit(lambda b, ft_, e: t3.tail3_image(
        b, ft_, e, 1, nh, nw, 540, 960, wts))
    t0 = time.time()
    try:
        y = g(blocks, feat, extents)
        y.block_until_ready()
        dt = time.time() - t0
        t0 = time.time()
        for _ in range(8):
            y = g(blocks, feat, extents)
        y.block_until_ready()
        print(f"tail3_image (K1+K2+d2s) OK, compile {dt:.0f}s, run "
              f"{(time.time()-t0)/8*1000:.1f} ms/frame", flush=True)
    except Exception as e:
        print(f"tail3_image FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
