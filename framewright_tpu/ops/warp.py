"""Backward warping / grid sampling for flow-based ops.

The RIFE interpolation path and flow-aligned temporal denoise both need
``warp(img, flow)`` — torch's ``F.grid_sample(..., mode='bilinear',
padding_mode='border', align_corners=True)`` semantics (what the RIFE
reference uses). Implemented as vectorized gathers; XLA lowers these to
TPU gather ops. Shapes are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = True) -> jnp.ndarray:
    """Bilinear sample img (B,H,W,C) at grid (B,Ho,Wo,2) of normalized
    coords in [-1,1] ((x, y) order, torch convention), border padding."""
    b, h, w, c = img.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]

    # clip each neighbor from the UNCLIPPED floor: for out-of-range
    # coords both neighbors collapse to the border texel (border pad)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    def gather(yi, xi):
        # (B, Ho, Wo) index pairs -> (B, Ho, Wo, C)
        return jax.vmap(lambda im, y, x: im[y, x])(img, yi, xi)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(img.dtype)


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray,
              padding_mode: str = "border") -> jnp.ndarray:
    """Backward-warp img by flow (B,H,W,2) in PIXELS ((x, y) order):
    out(p) = img(p + flow(p)). Matches the RIFE reference's warp().

    padding_mode: "border" (RIFE/SpyNet convention) or "zeros"
    (mmediting's propagation warp — out-of-frame samples vanish)."""
    b, h, w, c = img.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    base_x = jnp.broadcast_to(xs[None, None, :], (b, h, w))
    base_y = jnp.broadcast_to(ys[None, :, None], (b, h, w))
    fx = base_x + flow[..., 0].astype(jnp.float32)
    fy = base_y + flow[..., 1].astype(jnp.float32)
    # normalize to [-1,1] align_corners=True
    gx = 2.0 * fx / max(w - 1, 1) - 1.0
    gy = 2.0 * fy / max(h - 1, 1) - 1.0
    out = grid_sample(img, jnp.stack([gx, gy], axis=-1), align_corners=True)
    if padding_mode == "zeros":
        # grid_sample clamps to the border texel; multiplying by the
        # bilinear in-bounds weight reproduces torch's zeros padding
        # EXACTLY: at the clamp the sample is the border texel v0 and
        # torch's partial sum v0*(1-frac) equals v0 * this weight
        mask = (jnp.clip(jnp.minimum(fx + 1.0, w - fx), 0.0, 1.0)
                * jnp.clip(jnp.minimum(fy + 1.0, h - fy), 0.0, 1.0))
        out = out * mask[..., None].astype(out.dtype)
    return out
