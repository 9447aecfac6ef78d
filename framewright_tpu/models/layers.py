"""Functional neural-net building blocks (NHWC, HWIO).

Design: plain parameter pytrees (nested dicts of jnp arrays) and pure
apply functions — no flax/haiku modules. NHWC activations and HWIO
kernels are the native layouts for XLA:TPU convolutions; torch OIHW
weights are transposed once at load time (torch_port.py).

Convs accumulate in float32 (``preferred_element_type``) regardless of
the bf16 activation dtype, which is what keeps PSNR parity with the
fp32 CUDA reference while running the MXU at bf16 rate.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def conv_init(key, k: int, c_in: int, c_out: int, dtype=jnp.float32,
              gain: float = 1.0) -> dict:
    """Kaiming-uniform init (torch Conv2d default) in HWIO layout."""
    wkey, bkey = jax.random.split(key)
    fan_in = k * k * c_in
    bound = gain * np.sqrt(1.0 / fan_in) * np.sqrt(3.0)
    w = jax.random.uniform(wkey, (k, k, c_in, c_out), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (c_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _conv_precision(x: jnp.ndarray):
    """Precision policy: float32 activations demand full-precision
    convolution (TPU default would silently round passes to bf16 and
    break PSNR parity with the fp32 CUDA reference); bf16 activations
    take the fast MXU path."""
    if x.dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def conv2d(p: dict, x: jnp.ndarray, stride: int = 1, padding="SAME",
           dilation: int = 1) -> jnp.ndarray:
    """2D convolution, NHWC x HWIO -> NHWC, f32 accumulation."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_conv_precision(x),
        preferred_element_type=jnp.float32,
    )
    y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv2d_transpose(p: dict, x: jnp.ndarray, stride: int = 2,
                     kernel: int = 4, pad: int = 1,
                     out_pad: int = 0) -> jnp.ndarray:
    """Transposed conv with TORCH ConvTranspose2d semantics
    (kernel=4/stride=2/padding=1 is the RIFE/GAN 2x idiom;
    kernel=3/stride=2/padding=1/output_padding=1 is the NAFNet/LaMa
    one). Kernel stored HWIO like regular convs (ported torch weights
    transpose (2,3,0,1) from torch's (in, out, kH, kW)).

    Implemented as input dilation + flipped-kernel conv, which is the
    definition of transposed convolution: insert (s-1) zeros between
    inputs, pad (k-1-p) low / (k-1-p+out_pad) high, correlate with the
    flipped kernel.
    """
    w = p["w"].astype(x.dtype)
    w_flipped = w[::-1, ::-1, :, :]
    edge = kernel - 1 - pad
    y = jax.lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=((edge, edge + out_pad), (edge, edge + out_pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_conv_precision(x),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Channel-wise PReLU (alpha shape (C,))."""
    return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


def lrelu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(N, H, W, C*r*r) -> (N, H*r, W*r, C), torch-compatible ordering.

    torch's NCHW pixel_shuffle reads channel c*r*r + i*r + j for output
    offset (i, j); replicate that ordering in NHWC.
    """
    n, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(n, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, c_out
    return x.reshape(n, h * r, w * r, c_out)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(N, H*r, W*r, C) -> (N, H, W, C*r*r), torch-compatible ordering."""
    n, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, r, r
    return x.reshape(n, h, w, c * r * r)


def upsample_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Nearest-neighbor 2x/3x/4x upsample (torch F.interpolate 'nearest')."""
    n, h, w, c = x.shape
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize matching torch F.interpolate semantics.

    align_corners=False uses half-pixel centers (jax.image 'linear'
    matches this convention).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if align_corners:
        # sample positions: i * (h-1)/(oh-1)
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wy = (ys - y0)[None, :, None, None]
        wx = (xs - x0)[None, None, :, None]
        g00 = x[:, y0][:, :, x0]
        g01 = x[:, y0][:, :, x1]
        g10 = x[:, y1][:, :, x0]
        g11 = x[:, y1][:, :, x1]
        top = g00 * (1 - wx) + g01 * wx
        bot = g10 * (1 - wx) + g11 * wx
        return (top * (1 - wy) + bot * wy).astype(x.dtype)
    if oh < h or ow < w:
        # DOWNSAMPLING: torch interpolate (antialias=False) samples at
        # half-pixel centers WITHOUT prefiltering; jax.image.resize
        # would antialias — implement torch's gather exactly
        # (src = scale*(dst+0.5)-0.5, clamped at 0)
        ys = jnp.maximum((jnp.arange(oh) + 0.5) * (h / oh) - 0.5, 0.0)
        xs = jnp.maximum((jnp.arange(ow) + 0.5) * (w / ow) - 0.5, 0.0)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wy = (ys - y0)[None, :, None, None].astype(x.dtype)
        wx = (xs - x0)[None, None, :, None].astype(x.dtype)
        g00 = x[:, y0][:, :, x0]
        g01 = x[:, y0][:, :, x1]
        g10 = x[:, y1][:, :, x0]
        g11 = x[:, y1][:, :, x1]
        top = g00 * (1 - wx) + g01 * wx
        bot = g10 * (1 - wx) + g11 * wx
        return (top * (1 - wy) + bot * wy).astype(x.dtype)
    return jax.image.resize(x, (n, oh, ow, c), method="linear").astype(x.dtype)


def resize_bicubic(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    n, h, w, c = x.shape
    oh, ow = out_hw
    return jax.image.resize(x, (n, oh, ow, c), method="cubic").astype(x.dtype)


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the channel axis (NHWC last dim)."""
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * p["gamma"] + p["beta"]


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def tree_astype(params, dtype):
    return jax.tree_util.tree_map(lambda p: p.astype(dtype), params)


def spectral_pad(x: jnp.ndarray, pad: int, mode: str = "reflect") -> jnp.ndarray:
    """Pad H and W only."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)
