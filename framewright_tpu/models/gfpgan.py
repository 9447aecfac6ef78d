"""GFPGAN (clean variant) in functional JAX: generative face restoration.

The reference's face restorer loads GFPGAN through gfpgan/facexlib
(processors/face_restore.py:46, restoration/faces.py UnifiedFaceRestorer
backends). This implements the published *clean* architecture
(GFPGANv1Clean — the pure-PyTorch variant shipped with GFPGANv1.4):

- a degradation-removal U-Net encoder over the 512x512 face crop that
  produces (a) a latent style code and (b) per-resolution SFT
  condition maps (scale, shift);
- a StyleGAN2 decoder (modulated convs with weight demodulation,
  bilinear-upsample variant) whose features are modulated by the
  encoder conditions on half the channels (CS-SFT, sft_half=True).

Param names mirror the official state_dict for weight porting. At
random init the generator emits plausible-statistics noise; with
released weights it performs identity-preserving restoration. The
pipeline-facing wrapper lives in processors/faces.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import conv_init, lrelu, resize_bilinear


@dataclass(frozen=True)
class GFPGANConfig:
    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: int = 2
    num_mlp: int = 8
    narrow: float = 1.0
    sft_half: bool = True


def _channels(cfg: GFPGANConfig) -> Dict[int, int]:
    n = cfg.narrow
    cm = cfg.channel_multiplier
    return {
        4: int(512 * n), 8: int(512 * n), 16: int(512 * n), 32: int(512 * n),
        64: int(256 * cm * n), 128: int(128 * cm * n),
        256: int(64 * cm * n), 512: int(32 * cm * n), 1024: int(16 * cm * n),
    }


def _linear_init(key, din, dout):
    k1, k2 = jax.random.split(key)
    lim = 1.0 / math.sqrt(din)
    return {"w": jax.random.uniform(k1, (din, dout), jnp.float32, -lim, lim),
            "b": jax.random.uniform(k2, (dout,), jnp.float32, -lim, lim)}


def _linear(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _conv(p, x, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# StyleGAN2 (clean) building blocks
# ---------------------------------------------------------------------------

def _modconv_init(key, cin, cout, k, num_style):
    k1, k2 = jax.random.split(key)
    return {
        # official clean arch stores weight (1, cout, cin, k, k); we keep
        # HWIO (k, k, cin, cout) and transpose at port time
        "weight": jax.random.normal(k1, (k, k, cin, cout), jnp.float32)
        / math.sqrt(cin * k * k),
        "modulation": _linear_init(k2, num_style, cin),
    }


def _modulated_conv(p, x, style, demodulate=True):
    """Modulated conv (batch=1 fast path; vmap for batches).

    x: (B, H, W, Cin); style: (B, num_style). Weight is scaled per
    input channel by the style projection, then demodulated per output
    channel (StyleGAN2)."""
    w = p["weight"]                      # (k, k, cin, cout)
    s = _linear(p["modulation"], style) + 0.0  # official init bias=1 at port

    def one(xi, si):
        wi = w * si[None, None, :, None]
        if demodulate:
            d = jax.lax.rsqrt((wi.astype(jnp.float32) ** 2).sum((0, 1, 2)) + 1e-8)
            wi = wi * d[None, None, None, :]
        y = jax.lax.conv_general_dilated(
            xi[None].astype(jnp.float32), wi.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[0]

    return jax.vmap(one)(x, s).astype(x.dtype)


def _style_conv_init(key, cin, cout, k, num_style):
    k1, k2 = jax.random.split(key)
    return {
        "modulated_conv": _modconv_init(k1, cin, cout, k, num_style),
        "noise_weight": jnp.zeros(()),
        "bias": jnp.zeros((cout,)),
    }


def _style_conv(p, x, style, upsample=False, noise=None):
    if upsample:
        b, h, w, c = x.shape
        x = resize_bilinear(x, (h * 2, w * 2))
    # official clean StyleConv: the sqrt-2 "conversion" gain scales the
    # CONV OUTPUT only (before noise/bias), then plain LeakyReLU(0.2)
    y = _modulated_conv(p["modulated_conv"], x, style) * math.sqrt(2.0)
    if noise is not None:
        y = y + p["noise_weight"].astype(y.dtype) * noise
    y = y + p["bias"].astype(y.dtype)
    return jnp.where(y >= 0, y, 0.2 * y)


def _to_rgb_init(key, cin, num_style):
    return {"modulated_conv": _modconv_init(key, cin, 3, 1, num_style),
            "bias": jnp.zeros((3,))}


def _to_rgb(p, x, style, skip=None):
    y = _modulated_conv(p["modulated_conv"], x, style, demodulate=False)
    y = y + p["bias"].astype(y.dtype)
    if skip is not None:
        b, h, w, c = skip.shape
        y = y + resize_bilinear(skip, (h * 2, w * 2))
    return y


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init(key, cfg: GFPGANConfig = GFPGANConfig(), dtype=jnp.float32) -> Dict:
    ch = _channels(cfg)
    log_size = int(math.log2(cfg.out_size))
    keys = iter(jax.random.split(key, 256))
    nsf = cfg.num_style_feat

    # encoder (U-Net down): conv_body_first + one ResBlock per halving
    enc_res = [2 ** i for i in range(log_size, 2, -1)]  # out_size .. 8
    params: Dict = {
        "conv_body_first": conv_init(next(keys), 1, 3, ch[cfg.out_size]),
        "conv_body_down": [],
        "final_conv": conv_init(next(keys), 3, ch[4], ch[4]),
        # different_w=True (released GFPGANv1Clean): one w PER decoder
        # layer -> (log2(out)*2 - 2) * nsf outputs, used directly as
        # latents (input_is_latent=True; the style MLP is bypassed)
        "final_linear": _linear_init(next(keys), ch[4] * 4 * 4,
                                     (log_size * 2 - 2) * nsf),
        "style_mlp": [_linear_init(next(keys), nsf, nsf)
                      for _ in range(cfg.num_mlp)],
        "conv_body_up": [],
        "condition_scale": [],
        "condition_shift": [],
        "toRGB": [],
    }
    for res in enc_res:
        cin, cout = ch[res], ch[res // 2]
        params["conv_body_down"].append({
            "conv1": conv_init(next(keys), 3, cin, cin),
            "conv2": conv_init(next(keys), 3, cin, cout),   # stride-2 at apply
            "skip": conv_init(next(keys), 1, cin, cout),
        })
    # decoder-side conditions (U-Net up): 8 .. out_size
    for res in reversed(enc_res):
        cin, cout = ch[res // 2], ch[res]
        params["conv_body_up"].append({
            "conv1": conv_init(next(keys), 3, cin, cin),
            "conv2": conv_init(next(keys), 3, cin, cout),   # after 2x upsample
            "skip": conv_init(next(keys), 1, cin, cout),
        })
        sft_out = ch[res] // 2 if cfg.sft_half else ch[res]
        params["condition_scale"].append({
            "c1": conv_init(next(keys), 3, ch[res], ch[res]),
            "c2": conv_init(next(keys), 3, ch[res], sft_out),
        })
        params["condition_shift"].append({
            "c1": conv_init(next(keys), 3, ch[res], ch[res]),
            "c2": conv_init(next(keys), 3, ch[res], sft_out),
        })
        params["toRGB"].append(conv_init(next(keys), 1, ch[res], 3))

    # StyleGAN2 decoder
    sg: Dict = {
        "constant_input": jax.random.normal(next(keys), (1, 4, 4, ch[4]), jnp.float32),
        "style_conv1": _style_conv_init(next(keys), ch[4], ch[4], 3, nsf),
        "to_rgb1": _to_rgb_init(next(keys), ch[4], nsf),
        "style_convs": [],
        "to_rgbs": [],
    }
    cin = ch[4]
    for i in range(3, log_size + 1):
        cout = ch[2 ** i]
        sg["style_convs"].append(_style_conv_init(next(keys), cin, cout, 3, nsf))
        sg["style_convs"].append(_style_conv_init(next(keys), cout, cout, 3, nsf))
        sg["to_rgbs"].append(_to_rgb_init(next(keys), cout, nsf))
        cin = cout
    params["stylegan_decoder"] = sg
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if hasattr(v, "astype") else v, params)


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _resblock_down(p, x):
    """basicsr GFPGANv1Clean ResBlock(mode='down'): conv1 -> lrelu ->
    bilinear x0.5 -> conv2 -> lrelu; skip = skip_conv(bilinear x0.5(x));
    sum WITHOUT sqrt-2 normalization (clean arch drops it)."""
    b, h, w, c = x.shape
    y = lrelu(_conv(p["conv1"], x), 0.2)
    y = lrelu(_conv(p["conv2"], resize_bilinear(y, (h // 2, w // 2))), 0.2)
    skip = _conv(p["skip"], resize_bilinear(x, (h // 2, w // 2)))
    return y + skip


def _resblock_up(p, x):
    b, h, w, c = x.shape
    y = lrelu(_conv(p["conv1"], x), 0.2)
    up = resize_bilinear(x, (h * 2, w * 2))
    y = lrelu(_conv(p["conv2"], resize_bilinear(y, (h * 2, w * 2))), 0.2)
    skip = _conv(p["skip"], up)
    return y + skip


def apply(params: Dict, x: jnp.ndarray,
          cfg: GFPGANConfig = GFPGANConfig()) -> jnp.ndarray:
    """Restore a face crop. x: (B, out_size, out_size, 3) in [-1, 1]
    (official normalization). Returns same shape in [-1, 1]."""
    ch = _channels(cfg)
    log_size = int(math.log2(cfg.out_size))

    # encoder
    feat = lrelu(_conv(params["conv_body_first"], x), 0.2)
    unet_skips: List[jnp.ndarray] = []
    for blk in params["conv_body_down"]:
        feat = _resblock_down(blk, feat)
        unet_skips.insert(0, feat)       # official: record AFTER the block
    feat = lrelu(_conv(params["final_conv"], feat), 0.2)

    # style code — torch flattens NCHW (channel-major); transpose so the
    # ported final_linear weights see the same input ordering
    code = _linear(params["final_linear"],
                   feat.transpose(0, 3, 1, 2).reshape(feat.shape[0], -1))

    # decoder conditions from the U-Net up path
    conditions: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    for i, blk in enumerate(params["conv_body_up"]):
        feat = feat + unet_skips[i]
        feat = _resblock_up(blk, feat)
        sc = params["condition_scale"][i]
        sh = params["condition_shift"][i]
        scale = _conv(sc["c2"], lrelu(_conv(sc["c1"], feat), 0.2))
        shift = _conv(sh["c2"], lrelu(_conv(sh["c1"], feat), 0.2))
        conditions.append((scale, shift))

    # stylegan decoder with CS-SFT
    sg = params["stylegan_decoder"]
    b = x.shape[0]
    num_latent = log_size * 2 - 2
    if code.shape[-1] == cfg.num_style_feat:
        # legacy single-w form: refine through the MLP, share across layers
        style = code
        for mlp in params["style_mlp"]:
            h = _linear(mlp, style)
            style = jnp.where(h >= 0, h, 0.2 * h)
        latent = jnp.tile(style[:, None, :], (1, num_latent, 1))
    else:
        # different_w + input_is_latent (released checkpoints): the
        # encoder emits per-layer latents directly; style MLP bypassed
        latent = code.reshape(b, num_latent, cfg.num_style_feat)
    out = jnp.broadcast_to(sg["constant_input"],
                           (b,) + sg["constant_input"].shape[1:]).astype(x.dtype)
    out = _style_conv(sg["style_conv1"], out, latent[:, 0])
    skip = _to_rgb(sg["to_rgb1"], out, latent[:, 1])
    ci = 0
    li = 1
    for i in range(len(sg["to_rgbs"])):
        out = _style_conv(sg["style_convs"][2 * i], out, latent[:, li],
                          upsample=True)
        if ci < len(conditions):
            scale, shift = conditions[ci]
            if cfg.sft_half:
                # basicsr CSFT multiplies by the RAW scale condition
                # (no +1 convention)
                half = out.shape[-1] // 2
                mod = out[..., half:] * scale + shift
                out = jnp.concatenate([out[..., :half], mod], axis=-1)
            else:
                out = out * scale + shift
            ci += 1
        out = _style_conv(sg["style_convs"][2 * i + 1], out, latent[:, li + 1])
        skip = _to_rgb(sg["to_rgbs"][i], out, latent[:, li + 2], skip=skip)
        li += 2
    return skip  # official returns the raw accumulated RGB
