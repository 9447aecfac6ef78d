"""BasicVSR-class recurrent video super-resolution in functional JAX.

Fills the reference's video-SR slot (its SR facade lists BasicVSR++
among the backends, processors/enhancement/super_resolution.py:85-1194;
SURVEY §2.D). Architecture follows BasicVSR
(Chan et al., CVPR 2021): SpyNet optical flow between neighbouring
low-res frames, bidirectional recurrent feature propagation with
flow-warped hidden states, 30 residual blocks per direction, and a
pixel-shuffle upsampling tail over the fused features.

TPU-first mapping (this is why the layout differs from the torch
original):

- Temporal recurrence is a ``lax.scan`` over time with the hidden
  state as carry — one compiled step regardless of clip length, static
  shapes throughout.
- The 30 residual blocks are weight-stacked and run as an inner
  ``lax.scan`` so XLA compiles ONE block body (same trick as the RRDB
  body, models/rrdb.py).
- SpyNet flows for all T-1 neighbour pairs are computed as one batched
  conv stack (B·(T-1) batch) — big MXU-friendly convs instead of a
  Python loop over pairs.
- The upsampling tail runs once over the (B·T) batch.

State-dict naming for the weight port mirrors mmediting's BasicVSR
(``spynet.basic_module.{l}.basic_module.{j}``,
``backward_resblocks.main.*``, ``upsample1.upsample_conv`` …) — see
torch_port.port_basicvsr.
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
    resize_bilinear,
)
from framewright_tpu.ops.warp import flow_warp

# ImageNet normalisation used by SpyNet (official preprocessing)
_SPY_MEAN = (0.485, 0.456, 0.406)
_SPY_STD = (0.229, 0.224, 0.225)

# SpyNet basic module: 5 convs 7x7 over concat(ref, warped_supp, flow)
_SPY_CHANNELS = ((8, 32), (32, 64), (64, 32), (32, 16), (16, 2))


@dataclass(frozen=True)
class BasicVSRConfig:
    mid_channels: int = 64
    num_blocks: int = 30
    scale: int = 4                 # fixed 4x (official BasicVSR)
    spynet_levels: int = 6


def _trunk_init(key, c_in: int, mid: int, num_blocks: int, dtype):
    """ResidualBlocksWithInputConv: input conv + stacked res blocks."""
    keys = jax.random.split(key, 1 + 2 * num_blocks)
    head = conv_init(keys[0], 3, c_in, mid, dtype)

    def stack(ks, cin, cout):
        ps = [conv_init(k, 3, cin, cout, dtype) for k in ks]
        return {
            "w": jnp.stack([p["w"] for p in ps]),
            "b": jnp.stack([p["b"] for p in ps]),
        }

    return {
        "head": head,
        "conv1": stack(keys[1 : 1 + num_blocks], mid, mid),
        "conv2": stack(keys[1 + num_blocks :], mid, mid),
    }


def init(key, cfg: BasicVSRConfig = BasicVSRConfig(), dtype=jnp.float32) -> Dict:
    mid = cfg.mid_channels
    keys = iter(jax.random.split(key, 16 + cfg.spynet_levels))
    spynet = []
    for _ in range(cfg.spynet_levels):
        k = jax.random.split(next(keys), len(_SPY_CHANNELS))
        spynet.append(
            [conv_init(kk, 7, ci, co, dtype) for kk, (ci, co) in zip(k, _SPY_CHANNELS)]
        )
    return {
        "spynet": spynet,
        "backward": _trunk_init(next(keys), 3 + mid, mid, cfg.num_blocks, dtype),
        "forward": _trunk_init(next(keys), 3 + mid, mid, cfg.num_blocks, dtype),
        "fusion": conv_init(next(keys), 1, 2 * mid, mid, dtype),
        "upsample1": conv_init(next(keys), 3, mid, mid * 4, dtype),
        "upsample2": conv_init(next(keys), 3, mid, 64 * 4, dtype),
        "conv_hr": conv_init(next(keys), 3, 64, 64, dtype),
        "conv_last": conv_init(next(keys), 3, 64, 3, dtype),
    }


# ---------------------------------------------------------------------------
# SpyNet
# ---------------------------------------------------------------------------

def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _spy_module(params, x: jnp.ndarray) -> jnp.ndarray:
    for i, p in enumerate(params):
        x = conv2d(p, x)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def spynet_flow(params, ref: jnp.ndarray, supp: jnp.ndarray,
                levels: int = 6) -> jnp.ndarray:
    """Coarse-to-fine flow from ref -> supp. (B,H,W,3) in [0,1], H and W
    multiples of 2^(levels-1). Returns (B,H,W,2) flow in pixels (x, y)."""
    mean = jnp.asarray(_SPY_MEAN, ref.dtype)
    std = jnp.asarray(_SPY_STD, ref.dtype)
    ref_p = [(ref - mean) / std]
    supp_p = [(supp - mean) / std]
    for _ in range(levels - 1):
        ref_p.append(_avg_pool2(ref_p[-1]))
        supp_p.append(_avg_pool2(supp_p[-1]))
    b, h, w, _ = ref_p[-1].shape
    flow = jnp.zeros((b, h, w, 2), ref.dtype)
    for lv in range(levels - 1, -1, -1):
        if flow.shape[1] != ref_p[lv].shape[1]:
            flow = (
                resize_bilinear(flow, ref_p[lv].shape[1:3], align_corners=True) * 2.0
            )
        warped = flow_warp(supp_p[lv], flow)
        inp = jnp.concatenate([ref_p[lv], warped, flow], axis=-1)
        # official module order is coarse -> fine (module 0 = coarsest)
        mi = min(levels - 1 - lv, len(params) - 1)
        flow = flow + _spy_module(params[mi], inp)
    return flow


# ---------------------------------------------------------------------------
# Propagation trunk
# ---------------------------------------------------------------------------

def _trunk(params, x: jnp.ndarray) -> jnp.ndarray:
    """Input conv + lrelu + scanned residual blocks (ReLU inside,
    no BN, residual scale 1 — ResidualBlockNoBN)."""
    h = jax.nn.leaky_relu(conv2d(params["head"], x), 0.1)

    def block(carry, wb):
        w1, b1, w2, b2 = wb
        y = jax.nn.relu(conv2d({"w": w1, "b": b1}, carry))
        y = conv2d({"w": w2, "b": b2}, y)
        return carry + y, None

    h, _ = jax.lax.scan(
        block,
        h,
        (params["conv1"]["w"], params["conv1"]["b"],
         params["conv2"]["w"], params["conv2"]["b"]),
    )
    return h


def _propagate(trunk_params, frames_t, flows_t, reverse: bool):
    """Recurrent pass: frames_t (T,B,H,W,3), flows_t (T-1,B,H,W,2).
    For reverse=True flows_t[t] warps h from t+1 into t; for forward,
    flows_t[t] warps h from t into t+1."""
    t, b, h, w, _ = frames_t.shape
    mid = trunk_params["head"]["b"].shape[0]
    h0 = jnp.zeros((b, h, w, mid), frames_t.dtype)
    # pair each frame with the flow that aligns the incoming state;
    # the terminal frame gets a zero flow (no incoming state anyway)
    zero = jnp.zeros((1, b, h, w, 2), frames_t.dtype)
    if reverse:
        flows = jnp.concatenate([flows_t, zero], axis=0)  # t -> t+1
        xs = (frames_t[::-1], flows[::-1])
    else:
        flows = jnp.concatenate([zero, flows_t], axis=0)  # t-1 -> t
        xs = (frames_t, flows)

    def step(carry, inp):
        x, flow = inp
        # mmediting's propagation warp uses zeros padding (SpyNet's own
        # internal warp stays border) — checkpoint parity at frame edges
        warped = flow_warp(carry, flow, padding_mode="zeros")
        out = _trunk(trunk_params, jnp.concatenate([x, warped], axis=-1))
        return out, out

    _, feats = jax.lax.scan(step, h0, xs)
    return feats[::-1] if reverse else feats


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def apply(params: Dict, frames: jnp.ndarray,
          cfg: BasicVSRConfig = BasicVSRConfig()) -> jnp.ndarray:
    """(B, T, H, W, 3) in [0,1] -> (B, T, 4H, 4W, 3). H, W multiples of
    2^(spynet_levels-1) = 32 (callers pad, see processors/video_sr.py)."""
    b, t, h, w, c = frames.shape
    flat = frames.reshape(b * (t), h, w, c)

    # all neighbour flows in one batched SpyNet evaluation
    ref_fw = frames[:, 1:].reshape(b * (t - 1), h, w, c)
    sup_fw = frames[:, :-1].reshape(b * (t - 1), h, w, c)
    # forward flow: frame t -> t-1 content motion (ref=t, supp=t-1)
    flow_fw = spynet_flow(params["spynet"], ref_fw, sup_fw, cfg.spynet_levels)
    # backward flow: ref=t, supp=t+1
    flow_bw = spynet_flow(params["spynet"], sup_fw, ref_fw, cfg.spynet_levels)
    flow_fw = flow_fw.reshape(b, t - 1, h, w, 2).transpose(1, 0, 2, 3, 4)
    flow_bw = flow_bw.reshape(b, t - 1, h, w, 2).transpose(1, 0, 2, 3, 4)

    frames_t = frames.transpose(1, 0, 2, 3, 4)  # (T,B,H,W,3)
    feat_bw = _propagate(params["backward"], frames_t, flow_bw, reverse=True)
    feat_fw = _propagate(params["forward"], frames_t, flow_fw, reverse=False)

    # mmediting BasicVSR fuses cat([backward, forward]) — keep that input
    # channel order so ported pretrained fusion weights line up
    feats = jnp.concatenate([feat_bw, feat_fw], axis=-1)  # (T,B,H,W,2*mid)
    feats = feats.transpose(1, 0, 2, 3, 4).reshape(b * t, h, w, -1)

    y = jax.nn.leaky_relu(conv2d(params["fusion"], feats), 0.1)
    y = jax.nn.leaky_relu(pixel_shuffle(conv2d(params["upsample1"], y), 2), 0.1)
    y = jax.nn.leaky_relu(pixel_shuffle(conv2d(params["upsample2"], y), 2), 0.1)
    y = jax.nn.leaky_relu(conv2d(params["conv_hr"], y), 0.1)
    y = conv2d(params["conv_last"], y)
    base = resize_bilinear(flat, (h * 4, w * 4))
    out = (y.astype(jnp.float32) + base.astype(jnp.float32)).astype(frames.dtype)
    return out.reshape(b, t, h * 4, w * 4, c)
