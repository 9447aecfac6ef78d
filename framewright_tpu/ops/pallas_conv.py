"""Row-band fused conv3x3(+bias+lrelu) Pallas kernel.

Companion to ops/fused_rrdb.py for the RRDB *tail* (conv_body,
conv_up1/2, conv_hr, conv_last) and other standalone 64-channel convs:
XLA runs these at ~11 TFLOP/s on v5e (channel dims half-fill the MXU);
this kernel reaches ~24 TFLOP/s by computing the conv as wide matmuls
(K = tap-pair chunks of 128) over row bands of a channel-major image,
with halo rows fetched by overlapping DMA windows from a zero-padded
flat HBM buffer (tap shifts become single lane rotations).

Numerics: bf16 operands, f32 accumulation — matches the conv path at
bf16 rounding (tested against XLA conv).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = tuple((di, dj) for di in range(3) for dj in range(3))
_PADC = 128      # zero columns split left/right; keeps offsets 128-aligned
_R = 3           # interior rows per band (VMEM-bound)


def conv_wide_weights(w_hwio: np.ndarray, bias: np.ndarray,
                      dtype=jnp.bfloat16):
    """(3,3,Cin,Cout) HWIO + (Cout,) -> target-major wide form
    ((Cout', 9*Cin), (Cout', 1)) with Cout padded to a multiple of 8."""
    kh, kw, cin, cout = w_hwio.shape
    cpad = -(-cout // 8) * 8
    wide = np.zeros((cpad, 9 * cin), np.float32)
    for t, (di, dj) in enumerate(TAPS):
        wide[:cout, t * cin:(t + 1) * cin] = np.asarray(w_hwio, np.float32)[di, dj].T
    b = np.zeros((cpad, 1), np.float32)
    b[:cout, 0] = np.asarray(bias, np.float32)
    return jnp.asarray(wide, dtype), jnp.asarray(b, jnp.float32), cpad


def _kernel(x_hbm, w_ref, b_ref, o_ref, xf_ref, acc_ref, sem, *,
            cin, wp, npx_in, npx_out, r, act):
    # double-buffered band fetch: start band i+1's DMA before computing
    # band i so HBM reads overlap the matmuls
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma(slot, band):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(band * r * wp, npx_in)], xf_ref.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    xf = xf_ref[i % 2].astype(jnp.float32)  # pltpu.roll requires 32-bit
    t = 0
    k = 0
    while t < len(TAPS):
        m = min(2, len(TAPS) - t)
        parts = []
        for u in range(m):
            di, dj = TAPS[t + u]
            shift = (1 - di) * wp + (1 - dj)
            parts.append(pltpu.roll(xf, shift % npx_in, axis=1) if shift else xf)
        chunk = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
        contrib = jnp.dot(
            w_ref[:, k:k + m * cin],
            chunk[:, wp:wp + npx_out].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        if t == 0:
            acc_ref[:] = contrib
        else:
            acc_ref[:] += contrib
        k += m * cin
        t += m
    y = acc_ref[:] + b_ref[:]
    if act == "lrelu":
        y = jnp.where(y >= 0, y, 0.2 * y)
    o_ref[:] = y.astype(jnp.bfloat16)


def band_conv3x3(x_cm: jnp.ndarray, w_wide: jnp.ndarray, b: jnp.ndarray,
                 act: Optional[str] = "lrelu", r: int = 8,
                 interpret: bool = False) -> jnp.ndarray:
    """conv3x3 over a channel-major image. x_cm: (Cin, H, W) bf16;
    w_wide: (Cout', 9*Cin) from conv_wide_weights. Returns
    (Cout', H, W) bf16 (caller crops padded output channels)."""
    cin, h, wd = x_cm.shape
    cout = w_wide.shape[0]
    # Wp must be a multiple of 128 (pallas block lane constraint); keep
    # at least 64 zero columns each side for tap wrap absorption
    wp = wd + _PADC + (-wd % 128)
    # adapt band height to the VMEM budget: per-row cost ~ wp*cin*14 B
    # (double-buffered bf16 input, f32 cast + roll temps, f32 acc)
    r_fit = int((15_000_000 / (wp * cin) - 32) // 14)
    r = max(1, min(r, r_fit, 8))
    hp = -(-h // r) * r
    nb = hp // r
    xp = jnp.zeros((cin, hp + 2, wp), jnp.bfloat16)
    xp = xp.at[:, 1:h + 1, _PADC // 2:_PADC // 2 + wd].set(x_cm.astype(jnp.bfloat16))
    flat = xp.reshape(cin, (hp + 2) * wp)

    npx_in = (r + 2) * wp
    npx_out = r * wp
    kern = functools.partial(_kernel, cin=cin, wp=wp, npx_in=npx_in,
                             npx_out=npx_out, r=r, act=act)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cout, npx_out), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, nb * npx_out), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, cin, npx_in), jnp.bfloat16),
            pltpu.VMEM((cout, npx_out), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(flat, w_wide, b)
    return out.reshape(cout, hp, wp)[:, :h, _PADC // 2:_PADC // 2 + wd]


class FastTail:
    """Fused RRDB tail: conv_body residual + 2x(upsample-nearest + conv
    + lrelu) + conv_hr + conv_last through band_conv3x3 kernels.
    Batch entries processed independently (B is 1 for large frames)."""

    def __init__(self, params, dtype=jnp.bfloat16, interpret: bool = False):
        self.interpret = interpret
        def cw(p):
            w, b, cpad = conv_wide_weights(np.asarray(p["w"], np.float32),
                                           np.asarray(p["b"], np.float32), dtype)
            return {"w": w, "b": b, "cpad": cpad,
                    "cout": p["w"].shape[-1]}

        self.body = cw(params["conv_body"])
        self.up1 = cw(params["conv_up1"])
        self.up2 = cw(params["conv_up2"])
        self.hr = cw(params["conv_hr"])
        self.last = cw(params["conv_last"])

    def __call__(self, feat: jnp.ndarray, body_out: jnp.ndarray) -> jnp.ndarray:
        """feat/body_out: (B, H, W, 64) -> (B, 4H, 4W, 3)."""
        outs = []
        for i in range(feat.shape[0]):
            outs.append(self._one(feat[i], body_out[i]))
        return jnp.stack(outs)

    def _one(self, feat, body_out):
        it = self.interpret
        f = feat.transpose(2, 0, 1).astype(jnp.bfloat16)        # (64, H, W)
        bo = body_out.transpose(2, 0, 1).astype(jnp.bfloat16)
        f = f + band_conv3x3(bo, self.body["w"], self.body["b"], act=None,
                             interpret=it)
        f = _up2x_cm(f)
        f = band_conv3x3(f, self.up1["w"], self.up1["b"], act="lrelu",
                         interpret=it)
        f = _up2x_cm(f)
        f = band_conv3x3(f, self.up2["w"], self.up2["b"], act="lrelu",
                         interpret=it)
        f = band_conv3x3(f, self.hr["w"], self.hr["b"], act="lrelu",
                         interpret=it)
        out = band_conv3x3(f, self.last["w"], self.last["b"], act=None,
                           interpret=it)
        out = out[: self.last["cout"]]                          # unpad channels
        return out.transpose(1, 2, 0)


def _up2x_cm(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample on (C, H, W)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
