"""DDColor-class query-based colorization network in functional JAX.

The reference's premier colorization backend (restoration/
colorization.py lists DDColor above DeOldify/ECCV16). Architecture
follows DDColor (Kang et al., ICCV 2023): a ConvNeXt-style encoder over
the L channel, an FPN pixel decoder producing a full-resolution pixel
embedding, and a color decoder in which K learnable "color queries"
cross-attend to multi-scale encoder features; the ab output is the
correlation volume between pixel embeddings and the refined queries,
projected to 2 channels.

TPU notes: attention here is tiny (K=100 queries x <=4096 keys) and
lands on the MXU as plain batched matmuls; the encoder is dwconv7x7 +
1x1 convs (ConvNeXt block) which XLA fuses well in NHWC. All shapes
static; works under jit at any multiple-of-32 input.

This is a from-scratch implementation sized by config; the ``large``
preset mirrors official DDColor dims (queries=100, embed 256) so a
state-dict port can slot in later (torch_port round 2).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import conv_init, resize_bilinear

_DEF_DIMS = (32, 64, 128, 256)


@dataclass(frozen=True)
class DDColorConfig:
    dims: Tuple[int, ...] = _DEF_DIMS      # encoder stage channels
    depths: Tuple[int, ...] = (1, 1, 2, 1)  # ConvNeXt blocks per stage
    num_queries: int = 64
    embed_dim: int = 128                    # query/attention dim
    pixel_dim: int = 32                     # full-res pixel embedding
    num_heads: int = 4
    dec_layers_per_scale: int = 1           # cross-attn rounds per scale


def large_config() -> DDColorConfig:
    """Official-DDColor-sized variant (for eventual weight port)."""
    return DDColorConfig(dims=(96, 192, 384, 768), depths=(3, 3, 9, 3),
                         num_queries=100, embed_dim=256, pixel_dim=64,
                         num_heads=8, dec_layers_per_scale=3)


def _ln_init(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


def _lin_init(key, ci, co, scale=1.0):
    w = jax.random.normal(key, (ci, co)) * (scale / jnp.sqrt(ci))
    return {"w": w, "b": jnp.zeros((co,))}


def _block_init(key, dim):
    k = jax.random.split(key, 4)
    return {
        "dw": conv_init(k[0], 7, 1, dim),   # depthwise: per-channel 7x7
        "ln": _ln_init(dim),
        "fc1": _lin_init(k[1], dim, dim * 4),
        "fc2": _lin_init(k[2], dim * 4, dim, scale=0.2),
        "gamma": jnp.full((dim,), 1e-2),
    }


def init(key, cfg: DDColorConfig = DDColorConfig(), dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 256))
    p: Dict = {"stem": conv_init(next(keys), 4, 1, cfg.dims[0])}
    p["stages"] = []
    p["downs"] = []
    for si, dim in enumerate(cfg.dims):
        p["stages"].append([_block_init(next(keys), dim)
                            for _ in range(cfg.depths[si])])
        if si + 1 < len(cfg.dims):
            p["downs"].append({"ln": _ln_init(dim),
                               "conv": conv_init(next(keys), 2, dim,
                                                 cfg.dims[si + 1])})
    # FPN pixel decoder: lateral 1x1 from each stage + output conv
    p["lateral"] = [conv_init(next(keys), 1, d, cfg.pixel_dim)
                    for d in cfg.dims]
    p["fpn_out"] = [conv_init(next(keys), 3, cfg.pixel_dim, cfg.pixel_dim)
                    for _ in cfg.dims]
    p["pix_up"] = conv_init(next(keys), 3, cfg.pixel_dim, cfg.pixel_dim)
    # color decoder
    p["queries"] = jax.random.normal(next(keys), (cfg.num_queries,
                                                  cfg.embed_dim)) * 0.02
    p["feat_proj"] = [_lin_init(next(keys), d, cfg.embed_dim)
                      for d in cfg.dims[1:]]      # scales 1/8,1/16,1/32
    p["dec"] = []
    for _ in range(3 * cfg.dec_layers_per_scale):
        k = jax.random.split(next(keys), 6)
        p["dec"].append({
            "q": _lin_init(k[0], cfg.embed_dim, cfg.embed_dim),
            "k": _lin_init(k[1], cfg.embed_dim, cfg.embed_dim),
            "v": _lin_init(k[2], cfg.embed_dim, cfg.embed_dim),
            "o": _lin_init(k[3], cfg.embed_dim, cfg.embed_dim, scale=0.5),
            "ln1": _ln_init(cfg.embed_dim),
            "ffn1": _lin_init(k[4], cfg.embed_dim, cfg.embed_dim * 2),
            "ffn2": _lin_init(k[5], cfg.embed_dim * 2, cfg.embed_dim, scale=0.5),
            "ln2": _ln_init(cfg.embed_dim),
        })
    p["q_final"] = _lin_init(next(keys), cfg.embed_dim, cfg.pixel_dim)
    out = conv_init(next(keys), 1, cfg.num_queries, 2)
    # near-zero final projection: an untrained net must start
    # chroma-neutral, not tanh-saturated (the correlation volume has
    # large magnitude at init)
    p["out"] = {"w": out["w"] * 0.01, "b": out["b"] * 0.0}
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if hasattr(v, "astype") else v, p)


# ---------------------------------------------------------------------------


def _ln(p, x, eps=1e-6):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["g"] + p["b"]


def _lin(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _dwconv(p, x):
    # depthwise 7x7: feature_group_count = channels; kernel (7,7,1,C)
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + p["b"].astype(x.dtype)


def _convnext_block(p, x):
    y = _dwconv(p["dw"], x)
    y = _ln(p["ln"], y)
    y = _lin(p["fc2"], jax.nn.gelu(_lin(p["fc1"], y)))
    return x + p["gamma"].astype(x.dtype) * y


def _conv(p, x, stride=1):
    return (jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _encode(p, cfg, x) -> List[jnp.ndarray]:
    """L (B,H,W,1) -> features at 1/4, 1/8, 1/16, 1/32."""
    feats = []
    h = _conv(p["stem"], x, stride=4)
    for si in range(len(cfg.dims)):
        for blk in p["stages"][si]:
            h = _convnext_block(blk, h)
        feats.append(h)
        if si + 1 < len(cfg.dims):
            h = _conv(p["downs"][si]["conv"],
                      _ln(p["downs"][si]["ln"], h), stride=2)
    return feats


def _cross_attn(layer, q, kv, heads):
    """q (B,K,D) attends to kv (B,N,D)."""
    b, kq, d = q.shape
    hd = d // heads

    def split(t):
        return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    qq = split(_lin(layer["q"], q))
    kk = split(_lin(layer["k"], kv))
    vv = split(_lin(layer["v"], kv))
    att = jax.nn.softmax(
        (qq.astype(jnp.float32) @ kk.transpose(0, 1, 3, 2).astype(jnp.float32))
        / jnp.sqrt(hd), axis=-1).astype(q.dtype)
    o = (att @ vv).transpose(0, 2, 1, 3).reshape(b, kq, d)
    q = _ln(layer["ln1"], q + _lin(layer["o"], o))
    f = _lin(layer["ffn2"], jax.nn.gelu(_lin(layer["ffn1"], q)))
    return _ln(layer["ln2"], q + f)


def apply(params: Dict, l_channel: jnp.ndarray,
          cfg: DDColorConfig = DDColorConfig()) -> jnp.ndarray:
    """L (B,H,W,1) in [0,100] -> ab (B,H,W,2) in [-110,110]. H, W must
    be multiples of 32."""
    b, h, w, _ = l_channel.shape
    x = (l_channel.astype(jnp.float32) / 100.0 - 0.5).astype(l_channel.dtype)
    feats = _encode(params, cfg, x)

    # pixel decoder: top-down FPN to 1/4, then upsample to full res
    pix = _conv(params["lateral"][-1], feats[-1])
    for si in range(len(feats) - 2, -1, -1):
        lat = _conv(params["lateral"][si], feats[si])
        pix = lat + resize_bilinear(pix, lat.shape[1:3])
        pix = _conv(params["fpn_out"][si], pix)
    pix = resize_bilinear(pix, (h, w))
    pix = _conv(params["pix_up"], pix)          # (B,H,W,pixel_dim)

    # color decoder: queries refine over scales coarse -> fine
    q = jnp.broadcast_to(params["queries"].astype(pix.dtype),
                         (b,) + params["queries"].shape)
    li = 0
    for scale_idx in (2, 1, 0):                 # feats[3],[2],[1] = 1/32..1/8
        feat = feats[scale_idx + 1]
        kv = _lin(params["feat_proj"][scale_idx],
                  feat.reshape(b, -1, feat.shape[-1]))
        for _ in range(cfg.dec_layers_per_scale):
            q = _cross_attn(params["dec"][li], q, kv, cfg.num_heads)
            li += 1

    # correlation volume: (B,H,W,pixel_dim) x (B,K,pixel_dim) -> (B,H,W,K)
    qp = _lin(params["q_final"], q)
    vol = jnp.einsum("bhwd,bkd->bhwk", pix.astype(jnp.float32),
                     qp.astype(jnp.float32)).astype(pix.dtype)
    ab = _conv(params["out"], vol)
    return jnp.tanh(ab.astype(jnp.float32)).astype(l_channel.dtype) * 110.0
