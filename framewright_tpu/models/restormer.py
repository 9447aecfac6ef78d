"""Restormer (efficient transformer restoration) in functional JAX.

The second TAP-denoise backbone in the reference
(processors/tap_denoise.py:156 offers Restormer|NAFNet). Published
architecture (CVPR 2022): 4-level U-shape of transformer blocks where

- MDTA: multi-Dconv-head "transposed" attention — attention computed
  across the CHANNEL dimension (C x C attention matrix instead of
  HW x HW), making cost linear in pixels — the property that makes
  Restormer practical at video resolutions, and conveniently an
  MXU-friendly matmul shape on TPU;
- GDFN: gated depthwise-conv feed-forward.

Param names mirror the official state_dict layout for weight porting.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import conv_init, pixel_shuffle, pixel_unshuffle


@dataclass(frozen=True)
class RestormerConfig:
    in_ch: int = 3
    dim: int = 16                      # official: 48
    num_blocks: Tuple[int, ...] = (1, 1, 1, 2)   # official: (4, 6, 6, 8)
    num_refinement: int = 1            # official: 4
    heads: Tuple[int, ...] = (1, 2, 4, 8)
    ffn_expansion: float = 2.66
    bias: bool = False


def _conv(p, x, stride=1, groups=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _conv_init_nb(key, k, cin, cout, groups=1):
    p = conv_init(key, k, cin // groups, cout)
    del p["b"]  # bias-free (official default)
    return p


def _ln_bias_free(p, x, eps=1e-5):
    # official BiasFree_LayerNorm: variance is computed about the mean
    # but the OUTPUT is x (not x - mu) scaled by rsqrt(var) — the mean
    # passes through (restormer_arch.py: `x / torch.sqrt(sigma+1e-5)`)
    var = (x * x).mean(-1, keepdims=True) - x.mean(-1, keepdims=True) ** 2
    return x * jax.lax.rsqrt(var + eps) * p["gamma"]


def _block_init(key, dim, heads, ffn_exp):
    ks = jax.random.split(key, 8)
    hidden = int(dim * ffn_exp)
    return {
        "norm1": {"gamma": jnp.ones((dim,))},
        "qkv": _conv_init_nb(ks[0], 1, dim, dim * 3),
        "qkv_dw": _conv_init_nb(ks[1], 3, dim * 3, dim * 3, groups=dim * 3),
        "proj": _conv_init_nb(ks[2], 1, dim, dim),
        "temperature": jnp.ones((heads, 1, 1)),
        "norm2": {"gamma": jnp.ones((dim,))},
        "ffn_in": _conv_init_nb(ks[3], 1, dim, hidden * 2),
        "ffn_dw": _conv_init_nb(ks[4], 3, hidden * 2, hidden * 2, groups=hidden * 2),
        "ffn_out": _conv_init_nb(ks[5], 1, hidden, dim),
    }


def _mdta(p, x, heads):
    """Channel attention: softmax((Q K^T)/t) over CxC."""
    b, h, w, c = x.shape
    qkv = _conv(p["qkv_dw"], _conv(p["qkv"], x), groups=c * 3)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = c // heads

    def reshape(t):  # (B, H, W, C) -> (B, heads, hd, HW)
        t = t.reshape(b, h * w, heads, hd)
        return t.transpose(0, 2, 3, 1)

    q, k, v = reshape(q), reshape(k), reshape(v)
    # torch F.normalize semantics: v / max(||v||, eps)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    att = jnp.einsum("bhcn,bhdn->bhcd", q, k) * p["temperature"].astype(x.dtype)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhcd,bhdn->bhcn", att, v)
    out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
    return _conv(p["proj"], out)


def _gdfn(p, x):
    c2 = p["ffn_in"]["w"].shape[-1]
    y = _conv(p["ffn_dw"], _conv(p["ffn_in"], x), groups=c2)
    a, g = jnp.split(y, 2, axis=-1)
    # exact (erf) GELU — torch F.gelu default; jax defaults to tanh approx
    return _conv(p["ffn_out"], jax.nn.gelu(a, approximate=False) * g)


def _block(p, x, heads):
    x = x + _mdta(p, _ln_bias_free(p["norm1"], x), heads)
    x = x + _gdfn(p, _ln_bias_free(p["norm2"], x))
    return x


def init(key, cfg: RestormerConfig = RestormerConfig(), dtype=jnp.float32) -> Dict:
    n_levels = len(cfg.num_blocks)
    keys = iter(jax.random.split(key, 64))
    dim = cfg.dim
    params: Dict = {
        # official OverlapPatchEmbed/output convs are bias-free
        "embed": _conv_init_nb(next(keys), 3, cfg.in_ch, dim),
        "enc": [], "down": [], "dec": [], "up": [], "reduce": [],
        "latent": [], "refine": [],
    }
    dims = [dim * (2 ** i) for i in range(n_levels)]
    for lv in range(n_levels - 1):
        params["enc"].append([
            _block_init(next(keys), dims[lv], cfg.heads[lv], cfg.ffn_expansion)
            for _ in range(cfg.num_blocks[lv])])
        # downsample: conv to dim/2 then pixel_unshuffle(2) -> 2*dim
        params["down"].append(_conv_init_nb(next(keys), 3, dims[lv], dims[lv] // 2))
    params["latent"] = [
        _block_init(next(keys), dims[-1], cfg.heads[-1], cfg.ffn_expansion)
        for _ in range(cfg.num_blocks[-1])]
    for lv in range(n_levels - 2, -1, -1):
        # upsample (official): conv(dim -> dim*2) + PixelShuffle(2)
        # => spatial x2, channels dim/2 = dims[lv]
        params["up"].append(_conv_init_nb(next(keys), 3, dims[lv + 1],
                                          dims[lv + 1] * 2))
        cat_dim = dims[lv] * 2
        out_dim = dims[lv] if lv > 0 else dims[0] * 2  # level0 keeps concat dim
        params["reduce"].append(
            None if lv == 0 else _conv_init_nb(next(keys), 1, cat_dim, out_dim))
        dec_dim = out_dim if lv > 0 else cat_dim
        params["dec"].append([
            _block_init(next(keys), dec_dim, cfg.heads[lv], cfg.ffn_expansion)
            for _ in range(cfg.num_blocks[lv])])
    params["refine"] = [
        _block_init(next(keys), dims[0] * 2, cfg.heads[0], cfg.ffn_expansion)
        for _ in range(cfg.num_refinement)]
    params["output"] = _conv_init_nb(next(keys), 3, dims[0] * 2, cfg.in_ch)
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if hasattr(v, "astype") else v, params)


def apply(params: Dict, x: jnp.ndarray,
          cfg: RestormerConfig = RestormerConfig()) -> jnp.ndarray:
    """Denoise/restore x (B, H, W, C) in [0,1]; dims must divide by
    2^(levels-1). Residual learning: output = x + delta."""
    n_levels = len(cfg.num_blocks)
    feat = _conv(params["embed"], x)
    skips = []
    for lv in range(n_levels - 1):
        for bp in params["enc"][lv]:
            feat = _block(bp, feat, cfg.heads[lv])
        skips.append(feat)
        feat = pixel_unshuffle(_conv(params["down"][lv], feat), 2)
    for bp in params["latent"]:
        feat = _block(bp, feat, cfg.heads[-1])
    for i, lv in enumerate(range(n_levels - 2, -1, -1)):
        feat = pixel_shuffle(_conv(params["up"][i], feat), 2)
        feat = jnp.concatenate([feat, skips[lv]], axis=-1)
        if params["reduce"][i] is not None:
            feat = _conv(params["reduce"][i], feat)
        for bp in params["dec"][i]:
            feat = _block(bp, feat, cfg.heads[lv])
    for bp in params["refine"]:
        feat = _block(bp, feat, cfg.heads[0])
    return x + _conv(params["output"], feat)


def apply_padded(params, x, cfg: RestormerConfig = RestormerConfig()) -> jnp.ndarray:
    div = 2 ** (len(cfg.num_blocks) - 1)
    b, h, w, c = x.shape
    hp, wp = -(-h // div) * div, -(-w // div) * div
    if (hp, wp) != (h, w):
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="reflect")
    return apply(params, x, cfg)[:, :h, :w, :]
