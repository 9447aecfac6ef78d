#!/usr/bin/env python
"""Compare RRDB tail variants on the real device at production shapes.

A: original _tail (nearest-2x + conv3x3 at high res)
B: folded upsample convs (conv3x3 64->256 at low res + pixel_shuffle)
C: B + conv_hr folded into phase space (conv_after_ps2_apply)
D: conv_body+up1 in XLA, then the fused Pallas phase-tail kernel
   (ops/fused_tail.py: up2+hr+last at 1080p, no shuffles)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from framewright_tpu.models import rrdb
from framewright_tpu.models.layers import conv2d, lrelu, pixel_shuffle
from framewright_tpu.ops.fused_rrdb import (
    conv_after_ps2_apply,
    fold_conv_after_ps2,
    fold_upconv_nearest2,
)

H, W = 540, 960
REPS = 8


def main():
    platform = jax.devices()[0].platform
    print("platform:", platform)
    cpu = jax.local_devices(backend="cpu")[0]
    cfg = rrdb.RRDBConfig(num_block=1, scale=2)
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        up1f = fold_upconv_nearest2(params["conv_up1"])
        up2f = fold_upconv_nearest2(params["conv_up2"])
        hrf = fold_conv_after_ps2(params["conv_hr"])
    dev = jax.devices()[0]
    tail_p = {k: params[k] for k in
              ("conv_body", "conv_up1", "conv_up2", "conv_hr", "conv_last")}
    folded = {"up1": {k: jnp.asarray(v) for k, v in up1f.items()},
              "up2": {k: jnp.asarray(v) for k, v in up2f.items()},
              "hr": {k: jnp.asarray(v) for k, v in hrf.items()}}
    tail_p, folded = jax.device_put((tail_p, folded), dev)

    def tail_a(p, f, feat, body_out):
        from framewright_tpu.models.layers import upsample_nearest
        feat = feat + conv2d(p["conv_body"], body_out)
        feat = lrelu(conv2d(p["conv_up1"], upsample_nearest(feat, 2)))
        feat = lrelu(conv2d(p["conv_up2"], upsample_nearest(feat, 2)))
        return conv2d(p["conv_last"], lrelu(conv2d(p["conv_hr"], feat)))

    def tail_b(p, f, feat, body_out):
        feat = feat + conv2d(p["conv_body"], body_out)
        feat = pixel_shuffle(lrelu(conv2d(f["up1"], feat)), 2)
        feat = pixel_shuffle(lrelu(conv2d(f["up2"], feat)), 2)
        return conv2d(p["conv_last"], lrelu(conv2d(p["conv_hr"], feat)))

    def tail_c(p, f, feat, body_out):
        feat = feat + conv2d(p["conv_body"], body_out)
        t = pixel_shuffle(lrelu(conv2d(f["up1"], feat)), 2)
        t2 = lrelu(conv2d(f["up2"], t))               # pre-shuffle 256ch
        hr = lrelu(conv_after_ps2_apply(f["hr"], t2))
        return conv2d(p["conv_last"], hr)

    feat = jnp.asarray(np.random.rand(1, H, W, 64), jnp.bfloat16)
    body = jnp.asarray(np.random.rand(1, H, W, 64), jnp.bfloat16)

    def sync(t):
        return float(jnp.mean(t[0, ::731, ::731, 0].astype(jnp.float32)))

    from framewright_tpu.ops.fused_tail import (
        fused_tail_image, tail_phase_weights)
    with jax.default_device(cpu):
        phase_wts = tail_phase_weights(
            params["conv_up2"], params["conv_hr"], params["conv_last"])
    phase_wts = jax.device_put(phase_wts, dev)

    def tail_d(p, f, feat, body_out):
        from framewright_tpu.models.layers import upsample_nearest
        feat = feat + conv2d(p["conv_body"], body_out)
        feat = lrelu(conv2d(p["conv_up1"], upsample_nearest(feat, 2)))
        fcm = feat.transpose(0, 3, 1, 2).astype(jnp.bfloat16)
        return fused_tail_image(fcm, phase_wts, 2 * H, 2 * W)

    def tail_d_jit(p, f, feat, body_out):
        return tail_d(p, f, feat, body_out)

    ref = None
    for name, fn in (("A_orig", tail_a), ("B_upfold", tail_b),
                     ("C_upfold_hrfold", tail_c),
                     ("D_pallas_phase", tail_d_jit)):
        jf = jax.jit(fn)
        y = jf(tail_p, folded, feat, body)
        sync(y)
        t0 = time.time()
        for _ in range(REPS):
            y = jf(tail_p, folded, feat, body)
        sync(y)
        dt = (time.time() - t0) / REPS
        yh = np.asarray(y.astype(jnp.float32))
        if ref is None:
            ref = yh
        print(f"{name}: {dt*1000:.2f} ms  maxdiff_vs_A={np.abs(yh-ref).max():.4f}")


if __name__ == "__main__":
    main()
