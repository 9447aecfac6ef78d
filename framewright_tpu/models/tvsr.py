"""TVSR — VRT-class temporal window-attention video super-resolution.

Fills the reference's transformer-VSR slot (VRT in
processors/advanced_models.py:768; SURVEY §2.D lists it among the SR
families): joint spatio-temporal self-attention inside shifted local
windows, so detail aggregates ACROSS frames without explicit flow
(VRT's TMSA idea), then pixel-shuffle reconstruction over a bicubic
residual.

TPU-first design decisions:
- Tokens are (T · window²) per spatial window — one big batched MXU
  attention per block, static shapes, no per-frame Python loops.
- The block stack runs under ``lax.scan`` over stacked params
  (compile once per depth-2 pair: plain + shifted window).
- Shifted windows use the Swin roll + tiled attention mask (the mask
  is spatial-only — frames are fully connected in time — so the
  win²-mask tiles across T).
- No deformable alignment: VRT's parallel warping is optional and
  flow-free TMSA is the part that carries most of its PSNR; the
  recurrent BasicVSR family (models/vsr.py) covers the flow-aligned
  regime.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import (
    conv2d,
    conv_init,
    pixel_shuffle,
    resize_bicubic,
)


@dataclass(frozen=True)
class TVSRConfig:
    dim: int = 64
    heads: int = 4
    window: int = 8
    depth: int = 6          # must be even (pairs: plain + shifted)
    mlp_ratio: int = 2
    scale: int = 4


def _lin_init(key, ci, co):
    return {"w": jax.random.normal(key, (ci, co)) * (ci ** -0.5),
            "b": jnp.zeros((co,))}


def _block_init(key, cfg: TVSRConfig):
    k = jax.random.split(key, 4)
    d = cfg.dim
    return {
        "ln1_g": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "qkv": _lin_init(k[0], d, 3 * d),
        "proj": _lin_init(k[1], d, d),
        "ln2_g": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
        "fc1": _lin_init(k[2], d, cfg.mlp_ratio * d),
        "fc2": _lin_init(k[3], cfg.mlp_ratio * d, d),
    }


def init(key, cfg: TVSRConfig = TVSRConfig(), dtype=jnp.float32) -> Dict:
    assert cfg.depth % 2 == 0, "depth must be even (shift pairs)"
    keys = iter(jax.random.split(key, cfg.depth + 8))
    pairs = []
    for _ in range(cfg.depth // 2):
        pairs.append({"a": _block_init(next(keys), cfg),
                      "b": _block_init(next(keys), cfg)})
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pairs)
    p = {
        "conv_first": conv_init(next(keys), 3, 3, cfg.dim),
        "pairs": stacked,
        "conv_body": conv_init(next(keys), 3, cfg.dim, cfg.dim),
        "up1": conv_init(next(keys), 3, cfg.dim, cfg.dim * 4),
        "up2": conv_init(next(keys), 3, cfg.dim, cfg.dim * 4),
        "conv_hr": conv_init(next(keys), 3, cfg.dim, cfg.dim),
        "conv_last": conv_init(next(keys), 3, cfg.dim, 3),
    }
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if hasattr(v, "astype") else v, p)


def _ln(x, g, b, eps=1e-5):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * g + b


def _lin(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _spatial_shift_mask(h: int, w: int, win: int, shift: int, t: int):
    """Swin attention mask for rolled windows, tiled across T frames.
    Returns (num_windows, L, L) additive mask, L = t * win^2."""
    img = jnp.zeros((h, w), jnp.int32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img = img.at[hs, ws].set(cnt)
            cnt += 1
    img = img.reshape(h // win, win, w // win, win)
    img = img.transpose(0, 2, 1, 3).reshape(-1, win * win)
    same = (img[:, :, None] == img[:, None, :])
    mask_sp = jnp.where(same, 0.0, -1e9).astype(jnp.float32)
    # tile across temporal tokens: token = t_idx * win^2 + s
    return jnp.tile(mask_sp, (1, t, t))


def _tmsa(blk, x, cfg: TVSRConfig, shift: int, mask):
    """Temporal-spatial window attention. x: (B, T, h, w, C)."""
    b, t, h, w, c = x.shape
    win = cfg.window
    heads = cfg.heads
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(2, 3))
    nh, nw = h // win, w // win
    tok = x.reshape(b, t, nh, win, nw, win, c)
    tok = tok.transpose(0, 2, 4, 1, 3, 5, 6).reshape(
        b * nh * nw, t * win * win, c)
    ln = _ln(tok, blk["ln1_g"].astype(x.dtype), blk["ln1_b"].astype(x.dtype))
    qkv = _lin(blk["qkv"], ln)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    L = t * win * win
    hd = c // heads

    def split_heads(z):
        return z.reshape(-1, L, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    att = jnp.einsum("bhld,bhmd->bhlm", q, k,
                     preferred_element_type=jnp.float32) * (hd ** -0.5)
    if shift and mask is not None:
        att = att.reshape(b, nh * nw, heads, L, L) + \
            mask[None, :, None].astype(att.dtype)
        att = att.reshape(b * nh * nw, heads, L, L)
    att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhlm,bhmd->bhld", att, v)
    out = out.transpose(0, 2, 1, 3).reshape(-1, L, c)
    out = _lin(blk["proj"], out)
    out = out.reshape(b, nh, nw, t, win, win, c)
    out = out.transpose(0, 3, 1, 4, 2, 5, 6).reshape(b, t, h, w, c)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(2, 3))
    return out


def _mlp(blk, x):
    h = _ln(x, blk["ln2_g"].astype(x.dtype), blk["ln2_b"].astype(x.dtype))
    return _lin(blk["fc2"], jax.nn.gelu(_lin(blk["fc1"], h)))


def apply(params: Dict, frames: jnp.ndarray,
          cfg: TVSRConfig = TVSRConfig()) -> jnp.ndarray:
    """(B, T, H, W, 3) in [0,1] -> (B, T, sH, sW, 3). H, W must be
    multiples of cfg.window (the VSR processor pads to 32)."""
    b, t, h, w, _ = frames.shape
    win = cfg.window
    shift = win // 2
    flat = frames.reshape(b * t, h, w, 3)
    x = conv2d(params["conv_first"], flat).reshape(b, t, h, w, cfg.dim)
    x0 = x
    mask = _spatial_shift_mask(h, w, win, shift, t)

    def pair_step(z, pair):
        z = z + _tmsa(pair["a"], z, cfg, 0, None)
        z = z + _mlp(pair["a"], z)
        z = z + _tmsa(pair["b"], z, cfg, shift, mask)
        z = z + _mlp(pair["b"], z)
        return z, None

    x, _ = jax.lax.scan(pair_step, x, params["pairs"])
    feat = conv2d(params["conv_body"], x.reshape(b * t, h, w, cfg.dim))
    feat = feat + x0.reshape(b * t, h, w, cfg.dim)
    y = jax.nn.leaky_relu(
        pixel_shuffle(conv2d(params["up1"], feat), 2), 0.1)
    if cfg.scale == 4:
        y = jax.nn.leaky_relu(
            pixel_shuffle(conv2d(params["up2"], y), 2), 0.1)
    y = conv2d(params["conv_last"],
               jax.nn.leaky_relu(conv2d(params["conv_hr"], y), 0.1))
    base = resize_bicubic(flat, (h * cfg.scale, w * cfg.scale))
    out = base + y
    return out.reshape(b, t, h * cfg.scale, w * cfg.scale, 3)
