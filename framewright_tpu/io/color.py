"""Colorspace conversion: planar YUV <-> interleaved RGB.

Numpy implementations for the host decode path (Y4M/ffmpeg rawvideo)
and jnp implementations for on-device conversion when frames arrive as
YUV and the model wants RGB (saves 2x host->device bandwidth vs
converting on host: 420 YUV is 1.5 bytes/px vs 3 for RGB).

Matrices: BT.601 limited range (the ffmpeg default for yuv420p SD
content, matching the reference's PNG round-trip semantics) and
full-range variants.
"""

from __future__ import annotations

import numpy as np

# BT.601 limited-range constants
_KR, _KG, _KB = 0.299, 0.587, 0.114


def _upsample_chroma(u: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor chroma upsample to (h, w)."""
    if u.shape == (h, w):
        return u
    ry = h // u.shape[0]
    rx = w // u.shape[1]
    return np.repeat(np.repeat(u, ry, axis=0), rx, axis=1)[:h, :w]


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                  full_range: bool = False) -> np.ndarray:
    """Planar YUV (uint8) -> RGB uint8 (H, W, 3), BT.601."""
    h, w = y.shape
    yf = y.astype(np.float32)
    uf = _upsample_chroma(u, h, w).astype(np.float32) - 128.0
    vf = _upsample_chroma(v, h, w).astype(np.float32) - 128.0
    if full_range:
        r = yf + 1.402 * vf
        g = yf - 0.344136 * uf - 0.714136 * vf
        b = yf + 1.772 * uf
    else:
        yf = (yf - 16.0) * (255.0 / 219.0)
        uf = uf * (255.0 / 224.0)
        vf = vf * (255.0 / 224.0)
        r = yf + 1.402 * vf
        g = yf - 0.344136 * uf - 0.714136 * vf
        b = yf + 1.772 * uf
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


def rgb_to_yuv420(rgb: np.ndarray, full_range: bool = False):
    """RGB uint8 (H, W, 3) -> planar YUV420 uint8 (y, u, v), BT.601.

    H and W must be even (standard 4:2:0 constraint; callers pad).
    """
    h, w = rgb.shape[:2]
    rf = rgb[..., 0].astype(np.float32)
    gf = rgb[..., 1].astype(np.float32)
    bf = rgb[..., 2].astype(np.float32)
    yf = _KR * rf + _KG * gf + _KB * bf
    uf = (bf - yf) / (2.0 * (1.0 - _KB))
    vf = (rf - yf) / (2.0 * (1.0 - _KR))
    if not full_range:
        yf = yf * (219.0 / 255.0) + 16.0
        uf = uf * (224.0 / 255.0)
        vf = vf * (224.0 / 255.0)
    y = np.clip(yf + 0.5, 0, 255).astype(np.uint8)
    # 2x2 box average for chroma subsampling
    uf = uf.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    vf = vf.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    u = np.clip(uf + 128.5, 0, 255).astype(np.uint8)
    v = np.clip(vf + 128.5, 0, 255).astype(np.uint8)
    return y, u, v


# ---------------------------------------------------------------------------
# JAX variants (device-side, float pipelines). Imported lazily so host-only
# tools don't pull in jax.
# ---------------------------------------------------------------------------

def yuv_to_rgb_jax(yuv, full_range: bool = False):
    """(..., H, W, 3) float YUV in [0,255] -> float RGB in [0,1]."""
    import jax.numpy as jnp

    y = yuv[..., 0]
    u = yuv[..., 1] - 128.0
    v = yuv[..., 2] - 128.0
    if not full_range:
        y = (y - 16.0) * (255.0 / 219.0)
        u = u * (255.0 / 224.0)
        v = v * (255.0 / 224.0)
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    rgb = jnp.stack([r, g, b], axis=-1) / 255.0
    return jnp.clip(rgb, 0.0, 1.0)


def rgb_to_yuv_jax(rgb, full_range: bool = False):
    """(..., H, W, 3) float RGB in [0,1] -> float YUV in [0,255] (4:4:4)."""
    import jax.numpy as jnp

    rgb = rgb * 255.0
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = _KR * r + _KG * g + _KB * b
    u = (b - y) / (2.0 * (1.0 - _KB))
    v = (r - y) / (2.0 * (1.0 - _KR))
    if not full_range:
        y = y * (219.0 / 255.0) + 16.0
        u = u * (224.0 / 255.0)
        v = v * (224.0 / 255.0)
    return jnp.stack([y, u + 128.0, v + 128.0], axis=-1)
