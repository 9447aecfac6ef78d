"""HAT — Hybrid Attention Transformer SR in functional JAX.

The reference ships HAT as one of its SR backends
(processors/hat_upscaler.py:120 HATUpscaler; enhancement/
super_resolution.py:85-1194 lists it among 11 backends). Architecture
follows HAT (Chen et al., CVPR 2023): shallow conv -> residual hybrid
attention groups (each: HAB blocks = window MSA with relative position
bias + parallel channel-attention conv branch + MLP, closed by an
overlapping cross-attention block and a conv) -> conv -> pixel-shuffle
upsample.

TPU mapping:
- Window attention is reshape-to-(B·nW, win², C) batched matmuls —
  pure MXU work; shifted windows via jnp.roll (a cheap HBM shuffle XLA
  pipelines); padding to window multiples keeps every shape static.
- The overlapping K/V windows of OCAB come from
  lax.conv_general_dilated_patches (strided patch extraction — an XLA
  gather), not torch unfold.
- Channel attention pools to (B,1,1,C): tiny VPU work fused around the
  convs.

Param names mirror the official state_dict (conv_first,
layers.{g}.residual_group.blocks.{b}.attn.qkv …) so port_hat in
torch_port.py maps released weights mechanically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import conv_init, pixel_shuffle

# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HATConfig:
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2)      # blocks per group
    num_heads: int = 4
    window: int = 8
    overlap_ratio: float = 0.5            # OCAB kv window = win*(1+r)
    mlp_ratio: float = 2.0
    cab_squeeze: int = 4                  # channel-attention reduction
    conv_scale: float = 0.01              # CAB branch weight (official)
    scale: int = 4
    img_range: float = 1.0                # official input scaling
    rgb_mean: Tuple[float, float, float] = (0.4488, 0.4371, 0.4040)


def official_config() -> HATConfig:
    """Official HAT_SRx4 dims (released-weight port): embed 180,
    compress_ratio 3 (the cab mid = dim//3), squeeze_factor 30."""
    return HATConfig(embed_dim=180, depths=(6,) * 6, num_heads=6,
                     window=16, mlp_ratio=2.0, cab_squeeze=30, scale=4)


def _lin_init(key, ci, co):
    w = jax.random.normal(key, (ci, co)) * (0.02)
    return {"w": w, "b": jnp.zeros((co,))}


def _ln_init(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


def _attn_init(key, dim, heads, win_q, win_kv):
    k = jax.random.split(key, 3)
    n_rel = (win_q + win_kv - 1) ** 2
    return {
        "qkv": _lin_init(k[0], dim, dim * 3),
        "proj": _lin_init(k[1], dim, dim),
        "rpb": jax.random.normal(k[2], (n_rel, heads)) * 0.02,
    }


def _cab_init(key, dim, squeeze):
    k = jax.random.split(key, 4)
    mid = max(1, dim // 3)
    return {
        "conv1": conv_init(k[0], 3, dim, mid),
        "conv2": conv_init(k[1], 3, mid, dim),
        "att_down": _lin_init(k[2], dim, max(1, dim // squeeze)),
        "att_up": _lin_init(k[3], max(1, dim // squeeze), dim),
    }


def _block_init(key, cfg: HATConfig):
    k = jax.random.split(key, 5)
    hidden = int(cfg.embed_dim * cfg.mlp_ratio)
    return {
        "norm1": _ln_init(cfg.embed_dim),
        "attn": _attn_init(k[0], cfg.embed_dim, cfg.num_heads,
                           cfg.window, cfg.window),
        "cab": _cab_init(k[1], cfg.embed_dim, cfg.cab_squeeze),
        "norm2": _ln_init(cfg.embed_dim),
        "fc1": _lin_init(k[2], cfg.embed_dim, hidden),
        "fc2": _lin_init(k[3], hidden, cfg.embed_dim),
    }


def init(key, cfg: HATConfig = HATConfig(), dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 64 + sum(cfg.depths)))
    d = cfg.embed_dim
    kv_win = int(cfg.window * (1 + cfg.overlap_ratio))
    p: Dict = {
        "conv_first": conv_init(next(keys), 3, 3, d),
        # official HAT (SwinIR lineage): patch_embed LayerNorm after
        # conv_first tokens (patch_norm=True default) and a final
        # LayerNorm before conv_after_body
        "patch_norm": _ln_init(d),
        "norm": _ln_init(d),
        "layers": [],
        "conv_after_body": conv_init(next(keys), 3, d, d),
        "conv_before_upsample": conv_init(next(keys), 3, d, 64),
        "upsample": [conv_init(next(keys), 3, 64, 64 * 4)
                     for _ in range(max(1, cfg.scale // 2))],
        "conv_last": conv_init(next(keys), 3, 64, 3),
    }
    for depth in cfg.depths:
        group = {
            "blocks": [_block_init(next(keys), cfg) for _ in range(depth)],
            "ocab": {
                "norm1": _ln_init(d),
                "attn": _attn_init(next(keys), d, cfg.num_heads,
                                   cfg.window, kv_win),
                "norm2": _ln_init(d),
                "fc1": _lin_init(next(keys), d, int(d * cfg.mlp_ratio)),
                "fc2": _lin_init(next(keys), int(d * cfg.mlp_ratio), d),
            },
            "conv": conv_init(next(keys), 3, d, d),
        }
        p["layers"].append(group)
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if hasattr(v, "astype") else v, p)


# ---------------------------------------------------------------------------


def _gelu(x):
    # exact (erf) GELU: torch nn.GELU default; jax.nn.gelu defaults to
    # the tanh approximation, which diverges visibly over 40+ blocks
    # (caught by the full-model twin, tests/test_hat.py)
    return jax.nn.gelu(x, approximate=False)


def _ln(p, x, eps=1e-5):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["g"].astype(x.dtype) \
        + p["b"].astype(x.dtype)


def _lin(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _conv(p, x, stride=1):
    return (jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _rel_bias(rpb, win_q: int, win_kv: int, heads: int):
    """Relative position bias (win_q², win_kv², heads) from the table."""
    span = win_q + win_kv - 1
    yq, xq = jnp.mgrid[0:win_q, 0:win_q]
    yk, xk = jnp.mgrid[0:win_kv, 0:win_kv]
    dq = jnp.stack([yq.ravel(), xq.ravel()], -1)          # (Q,2)
    dk = jnp.stack([yk.ravel(), xk.ravel()], -1)          # (K,2)
    off = dq[:, None, :] - dk[None, :, :] + (win_kv - 1)  # in [0, span)
    idx = off[..., 0] * span + off[..., 1]
    return rpb[idx]                                        # (Q,K,heads)


def _windows(x, win):
    """(B,H,W,C) -> (B·nW, win², C); H,W divisible by win."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)


def _unwindows(x, win, b, h, w):
    c = x.shape[-1]
    x = x.reshape(b, h // win, w // win, win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _msa(attn, q_tok, kv_tok, heads, win_q, win_kv, mask=None,
         kv_projected=False):
    """q_tok (N,Q,C), kv_tok (N,K,C) -> (N,Q,C).

    ``kv_projected``: kv_tok already holds [k|v] (N,K,2C) — the OCAB
    path projects BEFORE window unfolding so border padding zeroes the
    projected values, matching the official unfold-after-qkv order."""
    n, qn, c = q_tok.shape
    hd = c // heads
    if kv_tok is q_tok:
        qkv = _lin(attn["qkv"], q_tok).reshape(n, qn, 3, heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    else:
        wq = attn["qkv"]["w"].astype(q_tok.dtype)
        bq = attn["qkv"]["b"].astype(q_tok.dtype)
        q = (q_tok @ wq[:, :c] + bq[:c]).reshape(n, qn, heads, hd).transpose(0, 2, 1, 3)
        if kv_projected:
            kv = kv_tok.reshape(n, -1, 2, heads, hd)
        else:
            kv = (kv_tok @ wq[:, c:] + bq[c:]).reshape(n, -1, 2, heads, hd)
        k, v = kv[:, :, 0].transpose(0, 2, 1, 3), kv[:, :, 1].transpose(0, 2, 1, 3)
    logits = (q.astype(jnp.float32) @ k.transpose(0, 1, 3, 2).astype(jnp.float32)
              ) / jnp.sqrt(hd)
    bias = _rel_bias(attn["rpb"].astype(jnp.float32), win_q, win_kv,
                     heads).transpose(2, 0, 1)
    logits = logits + bias[None]
    if mask is not None:
        logits = logits + mask
    a = jax.nn.softmax(logits, axis=-1).astype(q_tok.dtype)
    o = (a @ v).transpose(0, 2, 1, 3).reshape(n, qn, c)
    return _lin(attn["proj"], o)


def _shift_mask(h, w, win, shift, dtype):
    """SW-MSA attention mask: -inf across wrapped-window region pairs."""
    img = jnp.zeros((1, h, w, 1), jnp.float32)
    cnt = 0
    regions = []
    for ys in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for xs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            regions.append((ys, xs))
    for ys, xs in regions:
        img = img.at[:, ys, xs, :].set(cnt)
        cnt += 1
    tok = _windows(img, win)[..., 0]                 # (nW, win²)
    diff = tok[:, :, None] - tok[:, None, :]
    return jnp.where(diff == 0, 0.0, -1e9)[:, None]  # (nW,1,Q,K)


def _cab(p, x):
    y = _conv(p["conv2"], _gelu(_conv(p["conv1"], x)))
    s = y.mean(axis=(1, 2))                          # (B,C) global pool
    s = jax.nn.sigmoid(_lin(p["att_up"], jax.nn.relu(_lin(p["att_down"], s))))
    return y * s[:, None, None, :]


def _hab(block, x, cfg: HATConfig, shift: int, mask):
    b, h, w, c = x.shape
    win = cfg.window
    xn = _ln(block["norm1"], x)
    conv_x = _cab(block["cab"], xn)
    if shift:
        xs = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
    else:
        xs = xn
    tok = _windows(xs, win)
    # mask is per-window (nW,1,Q,K); tokens are (B·nW,...) — tile over B
    mask_b = jnp.tile(mask, (b, 1, 1, 1)) if shift else None
    att = _msa(block["attn"], tok, tok, cfg.num_heads, win, win,
               mask=mask_b)
    att = _unwindows(att, win, b, h, w)
    if shift:
        att = jnp.roll(att, (shift, shift), axis=(1, 2))
    x = x + att + cfg.conv_scale * conv_x
    return x + _lin(block["fc2"], _gelu(
        _lin(block["fc1"], _ln(block["norm2"], x))))


def _ocab(p, x, cfg: HATConfig):
    """Overlapping cross-attention: queries from win x win windows,
    keys/values from enlarged centred windows."""
    b, h, w, c = x.shape
    win = cfg.window
    kv_win = int(win * (1 + cfg.overlap_ratio))
    pad = (kv_win - win) // 2
    xn = _ln(p["norm1"], x)
    q_tok = _windows(xn, win)
    # project k/v at full resolution FIRST, then zero-pad + unfold:
    # official OCAB order (qkv -> unfold), so out-of-frame kv tokens
    # are zero, not the kv bias (caught by the full-model twin)
    wq = p["attn"]["qkv"]["w"].astype(x.dtype)
    bq = p["attn"]["qkv"]["b"].astype(x.dtype)
    kv_full = xn @ wq[:, c:] + bq[c:]                  # (B,H,W,2C)
    kvp = jnp.pad(kv_full, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    # strided overlapping patches: (B, 2C·kv², nH, nW), channel-major
    patches = jax.lax.conv_general_dilated_patches(
        kvp.transpose(0, 3, 1, 2), (kv_win, kv_win), (win, win), "VALID")
    nh, nw = patches.shape[-2:]
    kv_tok = patches.reshape(b, 2 * c, kv_win * kv_win, nh * nw) \
        .transpose(0, 3, 2, 1).reshape(b * nh * nw, kv_win * kv_win, 2 * c)
    att = _msa(p["attn"], q_tok, kv_tok, cfg.num_heads, win, kv_win,
               kv_projected=True)
    att = _unwindows(att, win, b, h, w)
    x = x + att
    return x + _lin(p["fc2"], _gelu(
        _lin(p["fc1"], _ln(p["norm2"], x))))


def apply(params: Dict, x: jnp.ndarray, cfg: HATConfig = HATConfig()) -> jnp.ndarray:
    """RGB (B,H,W,3) in [0,1] -> (B, H·scale, W·scale, 3).

    Follows the official HAT forward exactly (verified by the
    full-model torch twin in tests/test_hat.py): mean/img_range input
    normalization, patch_embed LayerNorm after conv_first, final
    LayerNorm before conv_after_body, un-normalization at the end."""
    b, h0, w0, _ = x.shape
    win = cfg.window
    mean = jnp.asarray(cfg.rgb_mean, x.dtype)
    x = (x - mean) * cfg.img_range
    ph, pw = -h0 % win, -w0 % win
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    h, w = x.shape[1:3]
    shift = win // 2
    mask = _shift_mask(h, w, win, shift, x.dtype)

    feat = _conv(params["conv_first"], x)
    body = _ln(params["patch_norm"], feat)
    for group in params["layers"]:
        g = body
        for bi, block in enumerate(group["blocks"]):
            g = _hab(block, g, cfg, shift if bi % 2 else 0, mask)
        g = _ocab(group["ocab"], g, cfg)
        body = body + _conv(group["conv"], g)
    body = _ln(params["norm"], body)
    feat = feat + _conv(params["conv_after_body"], body)

    y = jax.nn.leaky_relu(_conv(params["conv_before_upsample"], feat), 0.01)
    for up in params["upsample"]:
        y = pixel_shuffle(_conv(up, y), 2)
    y = _conv(params["conv_last"], y)
    y = y / cfg.img_range + mean
    return y[:, : h0 * cfg.scale, : w0 * cfg.scale, :]
