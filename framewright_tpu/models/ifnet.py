"""IFNet: real-time intermediate flow estimation (RIFE-class) in JAX.

Replaces the reference's `rife-ncnn-vulkan` subprocess interpolation
(reference processors/interpolation.py:628-645, model rife-v4.6) with
an in-process coarse-to-fine flow network, following the published
RIFE v4 IFNet design (arXiv:2011.06294; Practical-RIFE IFNet_HDv3):

- 4 IFBlocks at scales [8, 4, 2, 1], channels [192, 128, 96, 64];
- each block: 2 stride-2 conv+PReLU downs (torch-parity symmetric
  padding), an 8-conv PReLU chain with ONE residual skip around it,
  ConvTranspose2d(c, 4*6, 4, 2, 1) -> PixelShuffle(2) head emitting a
  flow residual (4ch: flow0 xy + flow1 xy), mask logit, and an unused
  aux channel (the v4.6 head layout);
- between blocks both inputs are backward-warped by the current flow;
- output frame = warp(img0, f0)*sigmoid(mask) + warp(img1, f1)*(1-m).

Weight port: state-dict paths mirror the Practical-RIFE naming
(block0.conv0.0.0.weight ...); exact released-checkpoint ingestion is
best-effort until validated against a real .pkl (torch_port maps the
structure; a divergence in head channel counts is auto-detected).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import (
    conv2d,
    conv2d_transpose,
    conv_init,
    prelu,
    resize_bilinear,
)
from framewright_tpu.ops.warp import flow_warp


@dataclass(frozen=True)
class IFNetConfig:
    channels: Tuple[int, ...] = (192, 128, 96, 64)
    scales: Tuple[int, ...] = (8, 4, 2, 1)
    num_res_convs: int = 8


def _conv_prelu_init(key, k, cin, cout):
    p = conv_init(key, k, cin, cout)
    p["alpha"] = jnp.full((cout,), 0.25, jnp.float32)
    return p


def init(key, cfg: IFNetConfig = IFNetConfig(), dtype=jnp.float32) -> Dict:
    """Build IFNet params. Block b input channels: images(6) + timestep
    (1) [+ mask(1) + warped instead of raw for b>0] + flow(4 for b>0)."""
    blocks = []
    keys = jax.random.split(key, len(cfg.channels))
    for b, c in enumerate(cfg.channels):
        in_ch = 7 if b == 0 else 8 + 4
        bk = jax.random.split(keys[b], cfg.num_res_convs + 4)
        conv0 = [
            _conv_prelu_init(bk[0], 3, in_ch, c // 2),
            _conv_prelu_init(bk[1], 3, c // 2, c),
        ]
        convblock = [
            _conv_prelu_init(bk[2 + i], 3, c, c)
            for i in range(cfg.num_res_convs)
        ]
        # head: ConvTranspose2d(c, 6*4, 4, 2, 1) + PixelShuffle(2):
        # net 4x upsample back to block input res, 6 channels out
        # (flow 4 + mask 1 + aux 1 — IFNet_HDv3 v4.6 layout)
        wkey = bk[-1]
        head = {
            "w": jax.random.normal(wkey, (4, 4, c, 24), jnp.float32) * 0.01,
            "b": jnp.zeros((24,), jnp.float32),
        }
        blocks.append({"conv0": conv0, "convblock": convblock, "head": head})
    params = {"blocks": blocks}
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if hasattr(v, "astype") else v, params
    )


def _apply_conv_prelu(p, x, stride=1):
    # torch RIFE pads its stride-2 3x3 convs (1,1); XLA SAME at stride
    # 2 would pad (0,1) — explicit padding keeps checkpoint parity
    k = p["w"].shape[0]
    pad = "SAME" if stride == 1 else ((k // 2, k // 2), (k // 2, k // 2))
    y = conv2d({"w": p["w"], "b": p["b"]}, x, stride=stride, padding=pad)
    return prelu(y, p["alpha"])


def _ifblock(p, x, cfg) -> jnp.ndarray:
    feat = _apply_conv_prelu(p["conv0"][0], x, stride=2)
    feat = _apply_conv_prelu(p["conv0"][1], feat, stride=2)
    # IFNet_HDv3 (v4.6): ONE residual skip around the whole conv chain
    # (`self.convblock(feat) + feat`), not per-conv residuals
    y = feat
    for rp in p["convblock"]:
        y = _apply_conv_prelu(rp, y)
    feat = y + feat
    from framewright_tpu.models.layers import pixel_shuffle

    out = conv2d_transpose(p["head"], feat, stride=2, kernel=4, pad=1)
    out = pixel_shuffle(out, 2)  # (B, h, w, 6) at block input res
    return out


def _pyramid(params, img0, img1, timestep, cfg):
    """Run the coarse-to-fine refinement; returns (flow, mask, w0, w1)."""
    b, h, w, _ = img0.shape
    flow = jnp.zeros((b, h, w, 4), img0.dtype)
    mask = jnp.zeros((b, h, w, 1), img0.dtype)
    warped0, warped1 = img0, img1
    tmap = jnp.full((b, h, w, 1), timestep, img0.dtype)

    for bi, (blk, scale) in enumerate(zip(params["blocks"], cfg.scales)):
        sh, sw = h // scale, w // scale
        if bi == 0:
            x = jnp.concatenate([img0, img1, tmap], axis=-1)
        else:
            x = jnp.concatenate([warped0, warped1, tmap, mask], axis=-1)
            x = jnp.concatenate([x, flow], axis=-1)
        xs = resize_bilinear(x, (sh, sw))
        if bi > 0:
            # rescale the flow channels to the pyramid level
            xs = xs.at[..., -4:].multiply(1.0 / scale)
        out = _ifblock(blk, xs, cfg)
        out = resize_bilinear(out, (h, w))
        flow = flow + out[..., :4] * scale
        mask = out[..., 4:5]
        warped0 = flow_warp(img0, flow[..., 0:2])
        warped1 = flow_warp(img1, flow[..., 2:4])

    return flow, mask, warped0, warped1


def apply(
    params: Dict,
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    timestep: float = 0.5,
    cfg: IFNetConfig = IFNetConfig(),
) -> jnp.ndarray:
    """Interpolate the frame at ``timestep`` between img0 and img1.

    img0/img1: (B, H, W, 3) float [0,1]; H, W must be multiples of 32
    (callers pad; scale-8 block downsamples by 32 total).
    Returns (B, H, W, 3).
    """
    flow, mask, warped0, warped1 = _pyramid(params, img0, img1, timestep, cfg)
    m = jax.nn.sigmoid(mask)
    return jnp.clip(warped0 * m + warped1 * (1.0 - m), 0.0, 1.0)


def estimate_flow(
    params: Dict,
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    cfg: IFNetConfig = IFNetConfig(),
) -> jnp.ndarray:
    """Optical flow on img0's grid sampling INTO img1 (pixels, (x, y)):
    ``flow_warp(img1, flow) ~ img0``. This is the alignment flow the
    temporal denoiser uses (timestep 0 => the t-frame is img0 itself).
    Pads to multiples of 32 internally."""
    b, h, w, c = img0.shape
    hp, wp = -(-h // 32) * 32, -(-w // 32) * 32
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
        img0 = jnp.pad(img0, pad, mode="edge")
        img1 = jnp.pad(img1, pad, mode="edge")
    flow, _, _, _ = _pyramid(params, img0, img1, 0.0, cfg)
    return flow[:, :h, :w, 2:4]


def interpolate_padded(params, img0, img1, timestep=0.5,
                       cfg: IFNetConfig = IFNetConfig()) -> jnp.ndarray:
    """Pad inputs to multiples of 32, run, crop (the user-facing API)."""
    b, h, w, c = img0.shape
    hp = -(-h // 32) * 32
    wp = -(-w // 32) * 32
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
        img0 = jnp.pad(img0, pad, mode="edge")
        img1 = jnp.pad(img1, pad, mode="edge")
    out = apply(params, img0, img1, timestep, cfg)
    return out[:, :h, :w, :]
