"""NAFNet (Nonlinear Activation Free Network) in functional JAX.

The denoising backbone behind the reference's TAP denoiser
(processors/tap_denoise.py:156: Restormer/NAFNet temporal-attention
denoise, claimed +4-6 dB over filter denoisers — docs/roadmap.md:68).
Published architecture (NAFNet, ECCV 2022): U-shaped encoder/decoder of
NAFBlocks; each block is LayerNorm -> 1x1 conv (2x ch) -> 3x3 depthwise
-> SimpleGate -> simplified channel attention -> 1x1, plus an
activation-free FFN (LayerNorm -> 1x1 -> SimpleGate -> 1x1), both with
learned residual scales (beta/gamma). Param names mirror the official
state_dict for weight porting.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import conv_init, pixel_shuffle


@dataclass(frozen=True)
class NAFNetConfig:
    width: int = 32
    in_ch: int = 3
    enc_blocks: Tuple[int, ...] = (2, 2, 4, 8)
    middle_blocks: int = 12
    dec_blocks: Tuple[int, ...] = (2, 2, 2, 2)


def _conv(key, k, cin, cout, groups=1):
    p = conv_init(key, k, cin // groups, cout)
    return p


def _conv2d(p, x, stride=1, groups=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:   # official ups convs are bias-free
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _ln(p, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


def _simple_gate(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * b


def _naf_block_init(key, c):
    ks = jax.random.split(key, 8)
    dw = 2 * c
    ffn = 2 * c
    return {
        "norm1": {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,))},
        "conv1": _conv(ks[0], 1, c, dw),
        "conv2": _conv(ks[1], 3, dw, dw, groups=dw),  # depthwise: HWIO (3,3,1,dw)
        "conv3": _conv(ks[2], 1, dw // 2, c),
        "sca": _conv(ks[3], 1, dw // 2, dw // 2),
        "norm2": {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,))},
        "conv4": _conv(ks[4], 1, c, ffn),
        "conv5": _conv(ks[5], 1, ffn // 2, c),
        "beta": jnp.zeros((1, 1, 1, c)),
        "gamma": jnp.zeros((1, 1, 1, c)),
    }


def _naf_block(p, x):
    c = x.shape[-1]
    dw = 2 * c
    y = _ln(p["norm1"], x)
    y = _conv2d(p["conv1"], y)
    y = _conv2d(p["conv2"], y, groups=dw)       # depthwise 3x3
    y = _simple_gate(y)
    # simplified channel attention: global avg pool -> 1x1 -> scale
    att = y.mean(axis=(1, 2), keepdims=True)
    att = _conv2d(p["sca"], att)
    y = y * att
    y = _conv2d(p["conv3"], y)
    x = x + y * p["beta"].astype(x.dtype)

    y = _ln(p["norm2"], x)
    y = _conv2d(p["conv4"], y)
    y = _simple_gate(y)
    y = _conv2d(p["conv5"], y)
    return x + y * p["gamma"].astype(x.dtype)


def init(key, cfg: NAFNetConfig = NAFNetConfig(), dtype=jnp.float32) -> Dict:
    n_stages = len(cfg.enc_blocks)
    total = 4 + sum(cfg.enc_blocks) + cfg.middle_blocks + sum(cfg.dec_blocks) \
        + 2 * n_stages
    keys = iter(jax.random.split(key, total + 4))
    c = cfg.width
    params: Dict = {
        "intro": _conv(next(keys), 3, cfg.in_ch, c),
        "encoders": [], "downs": [], "decoders": [], "ups": [],
        "middles": [],
    }
    ch = c
    for nb in cfg.enc_blocks:
        params["encoders"].append([_naf_block_init(next(keys), ch) for _ in range(nb)])
        params["downs"].append(_conv(next(keys), 2, ch, 2 * ch))
        ch *= 2
    params["middles"] = [_naf_block_init(next(keys), ch) for _ in range(cfg.middle_blocks)]
    for nb in cfg.dec_blocks:
        params["ups"].append(_conv(next(keys), 1, ch, 2 * ch))  # then pixelshuffle(2) -> ch//2
        ch //= 2
        params["decoders"].append([_naf_block_init(next(keys), ch) for _ in range(nb)])
    params["ending"] = _conv(next(keys), 3, c, cfg.in_ch)
    return jax.tree_util.tree_map(lambda v: jnp.asarray(v, dtype), params)


def apply(params: Dict, x: jnp.ndarray, cfg: NAFNetConfig = NAFNetConfig()) -> jnp.ndarray:
    """Denoise x (B, H, W, C) in [0,1]; H, W must divide by
    2^len(enc_blocks) (use apply_padded otherwise)."""
    inp = x
    y = _conv2d(params["intro"], x)
    skips = []
    for enc, down in zip(params["encoders"], params["downs"]):
        for bp in enc:
            y = _naf_block(bp, y)
        skips.append(y)
        y = _conv2d(down, y, stride=2)
    for bp in params["middles"]:
        y = _naf_block(bp, y)
    for up, dec, skip in zip(params["ups"], params["decoders"], reversed(skips)):
        y = _conv2d(up, y)
        y = pixel_shuffle(y, 2)
        y = y + skip
        for bp in dec:
            y = _naf_block(bp, y)
    y = _conv2d(params["ending"], y)
    return inp + y


def apply_padded(params, x, cfg: NAFNetConfig = NAFNetConfig()) -> jnp.ndarray:
    div = 2 ** len(cfg.enc_blocks)
    b, h, w, c = x.shape
    hp, wp = -(-h // div) * div, -(-w // div) * div
    if (hp, wp) != (h, w):
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="reflect")
    return apply(params, x, cfg)[:, :h, :w, :]
