#!/usr/bin/env python
"""Does the tail2 phase-tail kernel compile at the BODY block geometry
(S2=112, PX2=12544)? That is the gating question for the two-kernel
resident tail (tail3b): K1 = ring-merge + conv_body + skip on resident
blocks, K2 = the existing tail2 kernel at S=112. The monolithic tail3
kernel dies in the remote compile helper; the body merge kernels (with
the same ring machinery, more dots) compile — so if tail2@112 also
compiles, the two-kernel split is viable.

Run: FW_TAIL2_S=112 PYTHONPATH=/root/repo:/root/.axon_site \
       python -u scripts/probe_tail2_s112.py
"""

import os
import time

os.environ["FW_TAIL2_S"] = "112"

import numpy as np
import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb
from framewright_tpu.ops import fused_tail as ft


def main():
    print("platform:", jax.devices()[0].platform,
          "S2:", ft.S2, flush=True)
    assert ft.S2 == 112
    cfg = rrdb.RRDBConfig(num_block=1, scale=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        wts = ft.tail2_phase_weights(
            params["conv_up1"], params["conv_up2"], params["conv_hr"],
            params["conv_last"])
    wts = jax.device_put(wts, jax.devices()[0])

    nb = 60
    rng = np.random.RandomState(0)
    blocks = jnp.asarray(rng.rand(nb, 64, ft.PX2), jnp.bfloat16)
    ext = jnp.asarray(
        np.tile(np.asarray([[0, 112, 0, 112]], np.int32), (nb, 1)))

    f = jax.jit(lambda b, e: ft.fused_tail2_blocks(b, e, wts))
    t0 = time.time()
    try:
        y = f(blocks, ext)
        y.block_until_ready()
        dt = time.time() - t0
        # then time it
        t0 = time.time()
        for _ in range(8):
            y = f(blocks, ext)
        y.block_until_ready()
        print(f"tail2@112 COMPILES ({dt:.0f}s); run "
              f"{(time.time()-t0)/8*1000:.1f} ms per 60-block frame",
              flush=True)
    except Exception as e:
        print(f"tail2@112 FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
