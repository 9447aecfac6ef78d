"""RAFT: Recurrent All-Pairs Field Transforms optical flow in JAX.

TPU-first re-design of the reference's RAFT flow estimator
(reference processors/raft_flow.py:70-407, which shells out to
torchvision / princeton-vl RAFT on CUDA).  Design choices:

- the all-pairs correlation volume is ONE ``(H1*W1, C) @ (C, H2*W2)``
  matmul per image — the MXU's favourite shape — with the 4-level
  pyramid built by 2x average pooling;
- the iterative GRU refinement runs as a ``lax.scan`` (one compiled
  program, static trip count — no data-dependent Python control flow);
- correlation lookup is a vectorized bilinear gather over
  ``levels * (2r+1)^2`` taps;
- convex upsampling (softmax-mask-weighted 3x3 neighbourhood of the
  coarse flow) is pure XLA.

Architecture follows the published RAFT "basic" model
(arXiv:2003.12039): feature/context encoders at 1/8 resolution
(residual units, instance norm), 4-level correlation pyramid with
lookup radius 4, SepConvGRU update block, convex 8x upsampling.
Weight port: princeton-vl state-dict naming (``fnet.* cnet.*
update_block.*``) via ``torch_port.port_raft`` — context-encoder
BatchNorms fold into their convs (inference-exact).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import conv2d, conv_init


@dataclass(frozen=True)
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    # encoder channel plan (BasicEncoder): stem 64 -> 64, 96, 128 -> out
    enc_dims: Tuple[int, int, int] = (64, 96, 128)
    fnet_out: int = 256


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------

def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-image per-channel normalization, no affine (torch
    InstanceNorm2d(affine=False) — RAFT's fnet norm)."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _res_unit_init(key, c_in: int, c_out: int) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"conv1": conv_init(k1, 3, c_in, c_out),
         "conv2": conv_init(k2, 3, c_out, c_out)}
    if c_in != c_out:
        p["down"] = conv_init(k3, 1, c_in, c_out)
    return p


def _res_unit(p: Dict, x: jnp.ndarray, stride: int, norm: bool) -> jnp.ndarray:
    def n(v):
        return _instance_norm(v) if norm else v

    # torch pads strided 3x3 convs symmetrically (1,1); XLA SAME would
    # pad (0,1) at stride 2 — one-pixel misalignment vs the checkpoint
    pad = ((1, 1), (1, 1)) if stride > 1 else "SAME"
    y = jax.nn.relu(n(conv2d(p["conv1"], x, stride=stride, padding=pad)))
    y = jax.nn.relu(n(conv2d(p["conv2"], y)))
    if "down" in p:
        x = n(conv2d(p["down"], x, stride=stride))
    return jax.nn.relu(x + y)


def _encoder_init(key, cfg: RAFTConfig, out_dim: int) -> Dict:
    d1, d2, d3 = cfg.enc_dims
    keys = jax.random.split(key, 8)
    return {
        "conv1": conv_init(keys[0], 7, 3, d1),
        "layer1": [_res_unit_init(keys[1], d1, d1),
                   _res_unit_init(keys[2], d1, d1)],
        "layer2": [_res_unit_init(keys[3], d1, d2),
                   _res_unit_init(keys[4], d2, d2)],
        "layer3": [_res_unit_init(keys[5], d2, d3),
                   _res_unit_init(keys[6], d3, d3)],
        "conv2": conv_init(keys[7], 1, d3, out_dim),
    }


def _encoder(p: Dict, x: jnp.ndarray, norm: bool) -> jnp.ndarray:
    """BasicEncoder: 1/8-res features. x: (B, H, W, 3) in [-1, 1]."""
    y = conv2d(p["conv1"], x, stride=2, padding=((3, 3), (3, 3)))
    y = jax.nn.relu(_instance_norm(y) if norm else y)
    for layer, stride in ((p["layer1"], 1), (p["layer2"], 2),
                          (p["layer3"], 2)):
        y = _res_unit(layer[0], y, stride, norm)
        y = _res_unit(layer[1], y, 1, norm)
    return conv2d(p["conv2"], y)


# ---------------------------------------------------------------------------
# Correlation pyramid
# ---------------------------------------------------------------------------

def corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                 levels: int) -> Tuple[jnp.ndarray, ...]:
    """All-pairs correlation + pooled pyramid.

    fmap*: (B, H, W, C). Returns tuples of (B*H*W, Hl, Wl) volumes.
    The big matmul runs in bf16 on the MXU with f32 accumulation.
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c).astype(jnp.bfloat16)
    f2 = fmap2.reshape(b, h * w, c).astype(jnp.bfloat16)
    corr = jnp.einsum("bpc,bqc->bpq", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(c))
    vol = corr.reshape(b * h * w, h, w)
    pyramid = [vol]
    for _ in range(levels - 1):
        vol = jax.lax.reduce_window(
            vol, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID") * 0.25
        pyramid.append(vol)
    return tuple(pyramid)


def _bilinear_gather(vol: jnp.ndarray, cx: jnp.ndarray,
                     cy: jnp.ndarray) -> jnp.ndarray:
    """Sample (N, Hl, Wl) volumes at float coords (N, P) with zero
    out-of-bounds (grid_sample align_corners=True semantics)."""
    n, hl, wl = vol.shape
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    flat = vol.reshape(n, hl * wl)

    def tap(yi, xi, wgt):
        valid = (yi >= 0) & (yi < hl) & (xi >= 0) & (xi < wl)
        idx = (jnp.clip(yi, 0, hl - 1) * wl
               + jnp.clip(xi, 0, wl - 1)).astype(jnp.int32)
        v = jnp.take_along_axis(flat, idx, axis=1)
        return v * wgt * valid.astype(vol.dtype)

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    return (tap(y0i, x0i, (1 - fy) * (1 - fx))
            + tap(y0i, x0i + 1, (1 - fy) * fx)
            + tap(y0i + 1, x0i, fy * (1 - fx))
            + tap(y0i + 1, x0i + 1, fy * fx))


def corr_lookup(pyramid: Tuple[jnp.ndarray, ...], coords: jnp.ndarray,
                radius: int) -> jnp.ndarray:
    """Lookup windows around ``coords`` at every level.

    coords: (B, H, W, 2) in level-0 feature pixels (x, y).
    Returns (B, H, W, levels*(2r+1)^2) correlation features.
    """
    b, h, w, _ = coords.shape
    n = b * h * w
    r = radius
    d = jnp.arange(-r, r + 1, dtype=coords.dtype)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    dx = dx.reshape(-1)                      # (P,) with P = (2r+1)^2
    dy = dy.reshape(-1)
    cx = coords[..., 0].reshape(n, 1)
    cy = coords[..., 1].reshape(n, 1)
    outs = []
    for lvl, vol in enumerate(pyramid):
        scale = 2.0 ** lvl
        outs.append(_bilinear_gather(
            vol, cx / scale + dx[None, :], cy / scale + dy[None, :]))
    return jnp.concatenate(outs, axis=1).reshape(b, h, w, -1)


# ---------------------------------------------------------------------------
# Update block
# ---------------------------------------------------------------------------

def _update_init(key, cfg: RAFTConfig) -> Dict:
    cor_planes = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    hd = cfg.hidden_dim
    keys = jax.random.split(key, 12)
    gru_in = hd + cfg.context_dim + hd       # h + (inp ++ motion)

    def sep(key, kh, kw):
        # separable-GRU convs use non-square (1x5 / 5x1) kernels
        bound = float(3.0 / (kh * kw * gru_in)) ** 0.5
        wkey, bkey = jax.random.split(key)
        return {"w": jax.random.uniform(wkey, (kh, kw, gru_in, hd),
                                        jnp.float32, -bound, bound),
                "b": jax.random.uniform(bkey, (hd,), jnp.float32,
                                        -bound, bound)}

    return {
        "convc1": conv_init(keys[0], 1, cor_planes, 256),
        "convc2": conv_init(keys[1], 3, 256, 192),
        "convf1": conv_init(keys[2], 7, 2, 128),
        "convf2": conv_init(keys[3], 3, 128, 64),
        "conv": conv_init(keys[4], 3, 192 + 64, hd - 2),
        "convz1": sep(keys[5], 1, 5), "convr1": sep(keys[6], 1, 5),
        "convq1": sep(keys[7], 1, 5),
        "convz2": sep(keys[8], 5, 1), "convr2": sep(keys[9], 5, 1),
        "convq2": sep(keys[10], 5, 1),
        "flow1": conv_init(keys[11], 3, hd, 256),
        "flow2": conv_init(jax.random.fold_in(key, 99), 3, 256, 2),
        "mask1": conv_init(jax.random.fold_in(key, 98), 3, hd, 256),
        "mask2": conv_init(jax.random.fold_in(key, 97), 1, 256, 64 * 9),
    }


def _motion_encoder(p: Dict, flow: jnp.ndarray,
                    corr: jnp.ndarray) -> jnp.ndarray:
    c = jax.nn.relu(conv2d(p["convc1"], corr))
    c = jax.nn.relu(conv2d(p["convc2"], c))
    f = jax.nn.relu(conv2d(p["convf1"], flow))
    f = jax.nn.relu(conv2d(p["convf2"], f))
    m = jax.nn.relu(conv2d(p["conv"], jnp.concatenate([c, f], -1)))
    return jnp.concatenate([m, flow], -1)


def _sep_gru(p: Dict, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    for axis in ("1", "2"):
        hx = jnp.concatenate([h, x], -1)
        z = jax.nn.sigmoid(conv2d(p["convz" + axis], hx))
        r = jax.nn.sigmoid(conv2d(p["convr" + axis], hx))
        q = jnp.tanh(conv2d(p["convq" + axis],
                            jnp.concatenate([r * h, x], -1)))
        h = (1 - z) * h + z * q
    return h


def _update(p: Dict, net: jnp.ndarray, inp: jnp.ndarray,
            corr: jnp.ndarray, flow: jnp.ndarray):
    motion = _motion_encoder(p, flow, corr)
    net = _sep_gru(p, net, jnp.concatenate([inp, motion], -1))
    d = jax.nn.relu(conv2d(p["flow1"], net))
    delta = conv2d(p["flow2"], d)
    m = jax.nn.relu(conv2d(p["mask1"], net))
    mask = 0.25 * conv2d(p["mask2"], m)
    return net, mask, delta


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """8x upsample of (B, H, W, 2) flow by mask-weighted combination of
    each coarse pixel's 3x3 neighbourhood (RAFT eq. upsample_flow)."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    # 3x3 neighbourhood of the (scaled) coarse flow: (B, H, W, 9, 2)
    f = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [f[:, i:i + h, j:j + w, :] for i in range(3) for j in range(3)]
    nbhd = jnp.stack(taps, axis=3)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, nbhd)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def init(key, cfg: RAFTConfig = RAFTConfig(), dtype=jnp.float32) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "fnet": _encoder_init(k1, cfg, cfg.fnet_out),
        "cnet": _encoder_init(k2, cfg, cfg.hidden_dim + cfg.context_dim),
        "update": _update_init(k3, cfg),
    }
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(lambda v: v.astype(dtype), params)
    return params


def _coords_grid(b: int, h: int, w: int, dtype) -> jnp.ndarray:
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype),
                          jnp.arange(w, dtype=dtype), indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1)
    return jnp.broadcast_to(grid, (b, h, w, 2))


def apply(params: Dict, img0: jnp.ndarray, img1: jnp.ndarray,
          cfg: RAFTConfig = RAFTConfig()) -> jnp.ndarray:
    """Dense flow img0 -> img1 in pixels, (B, H, W, 2) (x, y), i.e.
    img0[p] corresponds to img1[p + flow[p]]. Inputs (B, H, W, 3) in
    [0, 1]; H, W must be multiples of 8 (see estimate_flow for the
    padded entry point)."""
    b, h, w, _ = img0.shape
    x = jnp.concatenate([img0, img1], axis=0) * 2.0 - 1.0
    fmaps = _encoder(params["fnet"], x, norm=True)
    fmap1, fmap2 = fmaps[:b], fmaps[b:]
    # context encoder: BatchNorm folded at port time => no runtime norm
    ctx = _encoder(params["cnet"], img0 * 2.0 - 1.0, norm=False)
    net = jnp.tanh(ctx[..., :cfg.hidden_dim])
    inp = jax.nn.relu(ctx[..., cfg.hidden_dim:])

    pyramid = corr_pyramid(fmap1, fmap2, cfg.corr_levels)
    h8, w8 = fmap1.shape[1], fmap1.shape[2]
    coords0 = _coords_grid(b, h8, w8, jnp.float32)

    def step(carry, _):
        net, coords1 = carry
        corr = corr_lookup(pyramid, coords1, cfg.corr_radius)
        flow = coords1 - coords0
        net, mask, delta = _update(params["update"], net,
                                   inp, corr.astype(net.dtype),
                                   flow.astype(net.dtype))
        coords1 = coords1 + delta.astype(jnp.float32)
        return (net, coords1), mask

    (net, coords1), masks = jax.lax.scan(
        step, (net, coords0), None, length=cfg.iters)
    flow8 = (coords1 - coords0).astype(jnp.float32)
    return convex_upsample(flow8, masks[-1].astype(jnp.float32))


def estimate_flow(params: Dict, img0: jnp.ndarray, img1: jnp.ndarray,
                  cfg: RAFTConfig = RAFTConfig()) -> jnp.ndarray:
    """Padded entry point (any H, W): pad to /8, run, crop. Matches
    ifnet.estimate_flow's convention: ``warp(img1, flow) ~ img0``."""
    b, h, w, _ = img0.shape
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
        img0 = jnp.pad(img0, pad, mode="edge")
        img1 = jnp.pad(img1, pad, mode="edge")
    return apply(params, img0, img1, cfg)[:, :h, :w, :]
