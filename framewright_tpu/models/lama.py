"""LaMa-class inpainting: FFC (Fast Fourier Convolution) ResNet in JAX.

Replaces the reference's simple-lama-inpainting dependency used for
watermark/subtitle removal (processors/watermark_removal.py:109-175,
subtitle_removal.py) with an in-process network following the published
LaMa design (WACV 2022): mask-concatenated input, 3 stride-2 downsample
convs, N FFC residual blocks (local conv branch + global spectral
branch: rfft2 -> 1x1 conv on stacked real/imag -> irfft2), 3 upsample
blocks, sigmoid-free output composited through the mask. TPU note: 2D
FFTs lower to XLA's native FFT — the global receptive field comes free
of giant convs, which is exactly why this family suits TPUs.

BatchNorm appears as stored inference-time affine params
(gamma/beta/mean/var), matching torch eval semantics for weight ports.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import conv_init


@dataclass(frozen=True)
class LamaConfig:
    ngf: int = 64
    n_down: int = 3
    n_blocks: int = 9
    global_ratio: float = 0.5   # channel fraction in the global branch
    in_ch: int = 4              # RGB + mask


def _bn_init(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    return ((x - p["mean"]) * inv * p["gamma"] + p["beta"]).astype(x.dtype)


def _conv(p, x, stride=1, reflect=0):
    """Conv wrapper; ``reflect`` pads that much reflection + VALID conv
    (the official ReflectionPad2d(3) + 7x7 head/tail)."""
    if reflect:
        x = jnp.pad(x, ((0, 0), (reflect, reflect), (reflect, reflect),
                        (0, 0)), mode="reflect")
        padding = "VALID"
    elif stride == 1:
        padding = "SAME"
    else:
        # torch pads k//2 both sides; XLA SAME at stride 2 pads (0,1) -
        # explicit padding keeps released-checkpoint parity
        padding = ((p["w"].shape[0] // 2,) * 2, (p["w"].shape[1] // 2,) * 2)
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:                # FFC-body convs are bias-free (official)
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _fourier_unit_init(key, c):
    # operates on stacked (real, imag): 2c -> 2c via 1x1 conv
    return {"conv": conv_init(key, 1, 2 * c, 2 * c), "bn": _bn_init(2 * c)}


def _fourier_unit(p, x):
    """x (B,H,W,C) -> global-context features via spectral 1x1 conv."""
    b, h, w, c = x.shape
    fx = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
    z = jnp.concatenate([fx.real, fx.imag], axis=-1)  # (B, H, W//2+1, 2C)
    z = jax.nn.relu(_bn(p["bn"], _conv(p["conv"], z)))
    real, imag = jnp.split(z, 2, axis=-1)
    fy = jax.lax.complex(real, imag)
    y = jnp.fft.irfft2(fy, s=(h, w), axes=(1, 2), norm="ortho")
    return y.astype(x.dtype)


def _spectral_transform_init(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    mid = cout // 2
    return {
        "conv1": conv_init(k1, 1, cin, mid), "bn1": _bn_init(mid),
        "fu": _fourier_unit_init(k2, mid),
        "conv2": conv_init(k3, 1, mid, cout),
    }


def _spectral_transform(p, x):
    y = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x)))
    y = y + _fourier_unit(p["fu"], y)
    return _conv(p["conv2"], y)


def _ffc_init(key, cin, cout, ratio_g):
    cg_in = int(cin * ratio_g)
    cl_in = cin - cg_in
    cg_out = int(cout * ratio_g)
    cl_out = cout - cg_out
    ks = jax.random.split(key, 4)
    p = {}
    if cl_in and cl_out:
        p["ll"] = conv_init(ks[0], 3, cl_in, cl_out)
    if cl_in and cg_out:
        p["lg"] = conv_init(ks[1], 3, cl_in, cg_out)
    if cg_in and cl_out:
        p["gl"] = conv_init(ks[2], 3, cg_in, cl_out)
    if cg_in and cg_out:
        p["gg"] = _spectral_transform_init(ks[3], cg_in, cg_out)
    p["bn_l"] = _bn_init(cl_out) if cl_out else None
    p["bn_g"] = _bn_init(cg_out) if cg_out else None
    return p


def _ffc(p, xl, xg):
    """Fast Fourier Convolution on (local, global) channel splits."""
    out_l = 0.0
    out_g = 0.0
    if "ll" in p:
        out_l = out_l + _conv(p["ll"], xl)
    if "gl" in p and xg is not None:
        out_l = out_l + _conv(p["gl"], xg)
    if "lg" in p:
        out_g = out_g + _conv(p["lg"], xl)
    if "gg" in p and xg is not None:
        out_g = out_g + _spectral_transform(p["gg"], xg)
    yl = jax.nn.relu(_bn(p["bn_l"], out_l)) if p["bn_l"] is not None else None
    yg = jax.nn.relu(_bn(p["bn_g"], out_g)) if p["bn_g"] is not None else None
    return yl, yg


def config_from_params(params: Dict) -> LamaConfig:
    """Recover the architecture config from a (ported) param tree —
    released checkpoints differ (paper: LaMa-Fourier 9 blocks,
    Big-LaMa 18; both ratio 0.75), so callers loading an npz should
    derive dims from the tree instead of assuming the default."""
    head_w = params["head"]["w"]
    blk = params["blocks"][0]["ffc1"]
    cl = int(blk["bn_l"]["gamma"].shape[0])
    cg = int(blk["bn_g"]["gamma"].shape[0])
    return LamaConfig(
        ngf=int(head_w.shape[-1]),
        n_down=len(params["downs"]),
        n_blocks=len(params["blocks"]),
        global_ratio=cg / (cl + cg),
        in_ch=int(head_w.shape[-2]),
    )


def init(key, cfg: LamaConfig = LamaConfig(), dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 8 + cfg.n_down * 2 + cfg.n_blocks * 2))
    ngf = cfg.ngf
    params: Dict = {
        "head": conv_init(next(keys), 7, cfg.in_ch, ngf),
        "head_bn": _bn_init(ngf),
        "downs": [], "blocks": [], "ups": [],
    }
    ch = ngf
    for _ in range(cfg.n_down):
        params["downs"].append({
            "conv": conv_init(next(keys), 3, ch, ch * 2),
            "bn": _bn_init(ch * 2),
        })
        ch *= 2
    for _ in range(cfg.n_blocks):
        params["blocks"].append({
            "ffc1": _ffc_init(next(keys), ch, ch, cfg.global_ratio),
            "ffc2": _ffc_init(next(keys), ch, ch, cfg.global_ratio),
        })
    for _ in range(cfg.n_down):
        params["ups"].append({
            "conv": conv_init(next(keys), 3, ch, ch // 2),
            "bn": _bn_init(ch // 2),
        })
        ch //= 2
    params["tail"] = conv_init(next(keys), 7, ngf, 3)
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if hasattr(v, "astype") else v, params)


def apply(params: Dict, image: jnp.ndarray, mask: jnp.ndarray,
          cfg: LamaConfig = LamaConfig()) -> jnp.ndarray:
    """Inpaint. image (B,H,W,3) in [0,1]; mask (B,H,W,1), 1 = hole.
    Returns composited output (holes filled, rest passed through).
    H, W must be multiples of 2^n_down (use apply_padded)."""
    x = jnp.concatenate([image * (1.0 - mask), mask], axis=-1)
    y = jax.nn.relu(_bn(params["head_bn"],
                        _conv(params["head"], x, reflect=3)))
    for d in params["downs"]:
        y = jax.nn.relu(_bn(d["bn"], _conv(d["conv"], y, stride=2)))

    cg = int(y.shape[-1] * cfg.global_ratio)
    cl = y.shape[-1] - cg
    yl, yg = y[..., :cl], y[..., cl:]
    for blk in params["blocks"]:
        rl, rg = yl, yg
        yl, yg = _ffc(blk["ffc1"], yl, yg)
        yl, yg = _ffc(blk["ffc2"], yl, yg)
        yl = rl + yl
        yg = rg + yg
    y = jnp.concatenate([yl, yg], axis=-1)

    from framewright_tpu.models.layers import conv2d_transpose

    for u in params["ups"]:
        # official upsample: ConvTranspose2d(3, s2, p1, op1) + BN + ReLU
        y = jax.nn.relu(_bn(u["bn"], conv2d_transpose(
            u["conv"], y, stride=2, kernel=3, pad=1, out_pad=1)))
    out = jax.nn.sigmoid(_conv(params["tail"], y, reflect=3))
    return image * (1.0 - mask) + out * mask


def apply_padded(params, image, mask, cfg: LamaConfig = LamaConfig()) -> jnp.ndarray:
    div = 2 ** cfg.n_down
    b, h, w, c = image.shape
    hp, wp = -(-h // div) * div, -(-w // div) * div
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
        image = jnp.pad(image, pad, mode="reflect")
        mask = jnp.pad(mask, pad)
    return apply(params, image, mask, cfg)[:, :h, :w, :]
