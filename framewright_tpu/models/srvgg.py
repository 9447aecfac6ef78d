"""SRVGGNetCompact in functional JAX.

The compact VGG-style SR network behind realesr-animevideov3 and
realesr-general-x4v3 (the reference's "fast" video models — its model
table at processors/pytorch_realesrgan.py:118-127 routes these names;
officially they are SRVGGNetCompact, and loading the released weights
requires this arch). ~30x fewer FLOPs than RRDBNet: the 'fast' preset
backbone.

Structure (state_dict-compatible naming): body.0 conv, then
(num_conv) x [activation, conv] pairs, final conv to out_ch*scale^2,
pixel_shuffle, plus nearest-upsampled input residual.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import (
    conv2d,
    conv_init,
    lrelu,
    pixel_shuffle,
    upsample_nearest,
)


@dataclass(frozen=True)
class SRVGGConfig:
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 32          # 16 for animevideov3, 32 for general-x4v3
    scale: int = 4
    act_type: str = "prelu"


def init(key, cfg: SRVGGConfig = SRVGGConfig(), dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, cfg.num_conv + 4))
    body = [conv_init(next(keys), 3, cfg.num_in_ch, cfg.num_feat, dtype)]
    acts = []
    for _ in range(cfg.num_conv):
        body.append(conv_init(next(keys), 3, cfg.num_feat, cfg.num_feat, dtype))
        acts.append({"alpha": jnp.full((cfg.num_feat,), 0.25, dtype)})
    last = conv_init(next(keys), 3, cfg.num_feat,
                     cfg.num_out_ch * cfg.scale * cfg.scale, dtype)
    # PReLU after the first conv too
    acts = [{"alpha": jnp.full((cfg.num_feat,), 0.25, dtype)}] + acts
    return {"body": body, "act": acts, "conv_last": last}


def _prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


def apply(params: Dict, x: jnp.ndarray, cfg: SRVGGConfig = SRVGGConfig()) -> jnp.ndarray:
    """x: (N, H, W, C) in [0,1] -> (N, H*scale, W*scale, C)."""
    feat = x
    for i, conv_p in enumerate(params["body"]):
        feat = conv2d(conv_p, feat)
        act = params["act"][i] if i < len(params["act"]) else None
        if act is not None:
            if cfg.act_type == "prelu":
                feat = _prelu(feat, act["alpha"])
            else:
                feat = lrelu(feat, 0.1)
    out = conv2d(params["conv_last"], feat)
    out = pixel_shuffle(out, cfg.scale)
    base = upsample_nearest(x, cfg.scale)
    return out + base
