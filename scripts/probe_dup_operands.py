#!/usr/bin/env python
"""Attribute the ~9.8 ms/frame of XLA `copy` ops around the merge body.

Theory: _merge_in_specs passes THREE full-array views of the SAME
blocks buffer (self full(0), left full(-1), right full(+1)) to every
pallas_call; XLA's buffer assignment inserts a copy per duplicated
custom-call operand, so each of the 69 sweeps pays ~2-3 large copies
(round-5 trace: copy x258/step, avg ~113 us — full-blocks-array sized).

Probe: scan K sweeps of the int8-i32 merge kernel over resident blocks
  (a) as shipped (9 views of one buffer), vs
  (b) with left/right/diag/up/down views fed from a DISTINCT physical
      copy of the buffer (wrong semantics, same bytes + same kernel) —
      if (b) is materially faster per sweep, duplicate-operand copies
      are the cause and the fix is to widen the self BlockSpec to a
      (3, NF, PX) window (one operand = self+left+right).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python -u scripts/probe_dup_operands.py [reps] [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

H, W = 540, 960   # production x2 body geometry


def sync(t):
    return float(jnp.mean(jnp.ravel(t)[::100000].astype(jnp.float32)))


def main():
    from framewright_tpu.models import rrdb
    from framewright_tpu.ops import fused_rrdb as fr

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print("platform:", jax.devices()[0].platform, "S:", fr.S, flush=True)
    cfg = rrdb.RRDBConfig(num_block=23, scale=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        params_s = rrdb.stack_body(params)
        hp = jax.device_get(params_s)
    params_dev = jax.device_put(params_s, jax.devices()[0])
    amax = rrdb.calibrate_act_scales(
        params_dev, cfg, jnp.asarray(np.random.rand(1, 256, 256, 3),
                                     jnp.bfloat16))
    with jax.default_device(cpu):
        fast = rrdb.make_fast_params(hp, compute_dtype="int8",
                                     act_amax=np.asarray(amax),
                                     int8_scheme="i32")
    fast = jax.device_put(fast, jax.devices()[0])
    wide3 = fast["body_wide"]
    w1 = jax.tree_util.tree_map(lambda v: v[0][0], wide3)  # first RRDB, rdb0

    nh, nw = fr._grid_dims(H, W)
    nb = b * nh * nw
    ext = jnp.asarray(np.tile(fr._block_extents(H, W, nh, nw), (b, 1)))
    blocks = jnp.asarray(
        np.random.rand(nb, fr.NF, fr.PX) * 0.1, jnp.bfloat16)
    K = 69  # one frame's worth of sweeps

    def run_shared(blk):
        def step(c, _):
            return fr.fused_rdb_blocks_merge_int8_i32(
                c, ext, w1, nw), None
        o, _ = jax.lax.scan(step, blk, None, length=K)
        return o

    def run_split(blk, blk2):
        # neighbors read from a distinct buffer (semantics wrong; the
        # kernel + byte traffic identical) — isolates duplicate-operand
        # buffer copies
        def step(c, _):
            c1, c2 = c
            o = fr.fused_rdb_blocks_merge_int8_i32(
                c1, ext, w1, nw, neighbors=c2)
            return (o, c2), None
        (o, _), _ = jax.lax.scan(step, (blk, blk2), None, length=K)
        return o

    f1 = jax.jit(run_shared)
    y = f1(blocks); sync(y)
    t0 = time.time()
    for _ in range(reps):
        y = f1(blocks)
    sync(y)
    dt1 = (time.time() - t0) / reps
    print(f"shared-buffer: {dt1*1000:8.1f} ms / {K} sweeps "
          f"({dt1/K*1e6:7.1f} us/sweep)", flush=True)

    blocks2 = blocks + 0.001
    f2 = jax.jit(run_split)
    y = f2(blocks, blocks2); sync(y)
    t0 = time.time()
    for _ in range(reps):
        y = f2(blocks, blocks2)
    sync(y)
    dt2 = (time.time() - t0) / reps
    print(f"split-buffer:  {dt2*1000:8.1f} ms / {K} sweeps "
          f"({dt2/K*1e6:7.1f} us/sweep)  delta "
          f"{(dt1-dt2)*1000:+.1f} ms", flush=True)


if __name__ == "__main__":
    main()
