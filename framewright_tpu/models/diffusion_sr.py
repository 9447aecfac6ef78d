"""Diffusion super-resolution (StableSR/FlashVSR-class slot) in JAX.

The reference lists diffusion VSR among its SR backends
(enhancement/super_resolution.py:85-1194; SURVEY §2.A "Diffusion VSR
(FlashVSR/StableSR)"). This is a compact, self-contained pixel-space
take on that capability: a conditional UNet denoiser (x0-prediction)
conditioned on the bicubic-upsampled LR frame, sampled with DDIM.

Video mode gets temporal coherence the diffusion-native way: frame t
starts from the flow-warped previous output partially re-noised to an
intermediate step (SDEdit-style propagation), so consecutive frames
share their low-frequency solution instead of being sampled
independently.

TPU mapping: the DDIM loop is a ``lax.scan`` over steps (one compiled
step body); the UNet is NHWC convs + per-block time modulation
(scale/shift), all static shapes. With random weights the sampler
machinery is still fully exercisable — the oracle-model tests in
tests/test_diffusion.py prove the DDIM algebra independently of
training. Released latent-diffusion checkpoints are NOT portable into
this compact pixel-space net; training/distillation is the route to
quality here (out of scope this round, documented in COMPONENTS.md).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import conv_init, resize_bicubic

# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DiffusionSRConfig:
    scale: int = 4
    base_ch: int = 32
    ch_mults: Tuple[int, ...] = (1, 2, 4)
    time_dim: int = 64
    steps: int = 8                  # DDIM sampling steps
    train_steps: int = 1000         # diffusion schedule length
    propagate_t: float = 0.35       # video: re-noise warped prev to this
                                    # fraction of the chain (0 disables)


def alphas_cumprod(n: int) -> jnp.ndarray:
    """Cosine schedule (Nichol & Dhariwal)."""
    t = jnp.linspace(0.0, 1.0, n + 1)
    f = jnp.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    a = f[1:] / f[0]
    return jnp.clip(a, 1e-5, 1.0)


def _time_embed(t_frac: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding of t in [0,1] -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / max(half - 1, 1))
    ang = t_frac[:, None] * freqs[None] * 1000.0
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _res_init(key, cin, cout, time_dim):
    k = jax.random.split(key, 4)
    return {
        "conv1": conv_init(k[0], 3, cin, cout),
        "conv2": conv_init(k[1], 3, cout, cout),
        "temb": {"w": jax.random.normal(k[2], (time_dim, cout * 2)) * 0.02,
                 "b": jnp.zeros((cout * 2,))},
        "skip": (conv_init(k[3], 1, cin, cout) if cin != cout else None),
    }


def init(key, cfg: DiffusionSRConfig = DiffusionSRConfig(),
         dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 64))
    ch = [cfg.base_ch * m for m in cfg.ch_mults]
    p: Dict = {
        "temb": {"w1": jax.random.normal(next(keys), (cfg.time_dim, cfg.time_dim)) * 0.02,
                 "b1": jnp.zeros((cfg.time_dim,)),
                 "w2": jax.random.normal(next(keys), (cfg.time_dim, cfg.time_dim)) * 0.02,
                 "b2": jnp.zeros((cfg.time_dim,))},
        # input: noisy x (3) + bicubic condition (3)
        "conv_in": conv_init(next(keys), 3, 6, ch[0]),
        "down": [], "mid": [], "up": [],
    }
    for i in range(len(ch)):
        cin = ch[max(0, i - 1)]
        p["down"].append({
            "res": _res_init(next(keys), cin if i else ch[0], ch[i], cfg.time_dim),
            "pool": conv_init(next(keys), 3, ch[i], ch[i]) if i + 1 < len(ch) else None,
        })
    p["mid"] = _res_init(next(keys), ch[-1], ch[-1], cfg.time_dim)
    # style conditioning (guided SR): projects a STYLE_DIM vector into
    # the FiLM/time-embedding pathway. Zero-init => no-op until trained
    # (same zero-init contract as conv_out).
    p["style_proj"] = {"w": jnp.zeros((16, cfg.time_dim)),
                       "b": jnp.zeros((cfg.time_dim,))}
    for i in range(len(ch) - 1, -1, -1):
        cout = ch[max(0, i - 1)]
        p["up"].append({
            "res": _res_init(next(keys), ch[i] * 2, cout, cfg.time_dim),
        })
    out = conv_init(next(keys), 3, ch[0], 3)
    p["conv_out"] = {"w": out["w"] * 0.0, "b": out["b"] * 0.0}  # zero-init
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if hasattr(v, "astype") else v, p)


def _conv(p, x, stride=1):
    return (jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _norm(x, eps=1e-5):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps)


def _res(p, x, temb):
    h = _conv(p["conv1"], jax.nn.silu(_norm(x)))
    ss = temb @ p["temb"]["w"].astype(x.dtype) + p["temb"]["b"].astype(x.dtype)
    scale, shift = jnp.split(ss[:, None, None, :], 2, axis=-1)
    h = _conv(p["conv2"], jax.nn.silu(_norm(h) * (1 + scale) + shift))
    skip = _conv(p["skip"], x) if p["skip"] is not None else x
    return skip + h


def denoise(params: Dict, x_noisy: jnp.ndarray, cond_up: jnp.ndarray,
            t_frac: jnp.ndarray, cfg: DiffusionSRConfig,
            style: jnp.ndarray = None) -> jnp.ndarray:
    """Predict x0 from (noisy HR, bicubic condition, t). All (B,H,W,3),
    data range [-1, 1]; returns predicted x0 (residual from condition,
    zero-init head => untrained net predicts the bicubic upsample).
    ``style`` (B, 16) enters through the FiLM pathway (guided SR)."""
    temb = _time_embed(t_frac, cfg.time_dim).astype(x_noisy.dtype)
    temb = jax.nn.silu(temb @ params["temb"]["w1"].astype(temb.dtype)
                       + params["temb"]["b1"].astype(temb.dtype))
    temb = temb @ params["temb"]["w2"].astype(temb.dtype) \
        + params["temb"]["b2"].astype(temb.dtype)
    if style is not None and "style_proj" in params:
        sp = params["style_proj"]
        temb = temb + (style.astype(temb.dtype)
                       @ sp["w"].astype(temb.dtype)
                       + sp["b"].astype(temb.dtype))

    h = _conv(params["conv_in"], jnp.concatenate([x_noisy, cond_up], -1))
    skips = []
    for down in params["down"]:
        h = _res(down["res"], h, temb)
        skips.append(h)
        if down["pool"] is not None:
            h = _conv(down["pool"], h, stride=2)
    h = _res(params["mid"], h, temb)
    for up in params["up"]:
        skip = skips.pop()
        if h.shape[1] != skip.shape[1]:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, skip.shape[1], skip.shape[2], c),
                                 "nearest")
        h = _res(up["res"], jnp.concatenate([h, skip], -1), temb)
    return cond_up + _conv(params["conv_out"], h)


# ---------------------------------------------------------------------------
# DDIM sampling
# ---------------------------------------------------------------------------

def ddim_sample(params: Dict, lr: jnp.ndarray,
                cfg: DiffusionSRConfig = DiffusionSRConfig(),
                key=None, init_hr: jnp.ndarray = None,
                t_start_frac: float = 1.0,
                model_fn=None, style: jnp.ndarray = None,
                guidance_scale: float = 1.0) -> jnp.ndarray:
    """lr (B,h,w,3) in [0,1] -> (B, h·scale, w·scale, 3) in [0,1].

    init_hr + t_start_frac < 1 implement SDEdit-style partial
    re-noising (video propagation). model_fn overrides the denoiser
    (oracle tests)."""
    b, h, w, _ = lr.shape
    hh, ww = h * cfg.scale, w * cfg.scale
    key = key if key is not None else jax.random.PRNGKey(0)
    cond = resize_bicubic(lr, (hh, ww)) * 2.0 - 1.0
    acp = alphas_cumprod(cfg.train_steps).astype(jnp.float32)
    n_steps = max(1, int(cfg.steps * t_start_frac))
    # descending timesteps from t_start to 0
    t_hi = int((cfg.train_steps - 1) * t_start_frac)
    ts = jnp.linspace(t_hi, 0, n_steps + 1).astype(jnp.int32)

    a0 = acp[ts[0]]
    noise = jax.random.normal(key, (b, hh, ww, 3), jnp.float32)
    if init_hr is not None:
        base = init_hr * 2.0 - 1.0
        x = jnp.sqrt(a0) * base + jnp.sqrt(1 - a0) * noise
    else:
        x = noise
    if model_fn is not None:
        fn = model_fn
    elif style is not None and guidance_scale != 1.0:
        # classifier-free guidance: extrapolate conditional vs
        # unconditional x0 predictions (reference guided_sr.py:773
        # guidance_scale semantics)
        def fn(xt, tf):
            c = cond.astype(xt.dtype)
            x0_c = denoise(params, xt, c, tf, cfg, style=style)
            x0_u = denoise(params, xt, c, tf, cfg, style=None)
            g = jnp.asarray(guidance_scale, jnp.float32)
            return (x0_u + g * (x0_c.astype(jnp.float32)
                                - x0_u.astype(jnp.float32))).astype(
                                    jnp.float32)
    else:
        def fn(xt, tf):
            return denoise(params, xt, cond.astype(xt.dtype), tf, cfg,
                           style=style).astype(jnp.float32)

    def step(x, i):
        t_cur, t_nxt = ts[i], ts[i + 1]
        a_t = acp[t_cur]
        # final step lands on clean x0 (standard DDIM terminal alpha=1)
        a_n = jnp.where(i == n_steps - 1, 1.0, acp[t_nxt])
        tf = jnp.full((b,), t_cur / cfg.train_steps, jnp.float32)
        x0 = jnp.clip(fn(x.astype(cond.dtype), tf), -1.0, 1.0)
        eps = (x - jnp.sqrt(a_t) * x0) * jax.lax.rsqrt(1 - a_t)
        x = jnp.sqrt(a_n) * x0 + jnp.sqrt(1 - a_n) * eps
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(n_steps))
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0).astype(lr.dtype)


def apply(params: Dict, x: jnp.ndarray,
          cfg: DiffusionSRConfig = DiffusionSRConfig()) -> jnp.ndarray:
    """Registry-compatible forward: full DDIM sampling (deterministic
    seed — restoration must be reproducible)."""
    return ddim_sample(params, x, cfg, key=jax.random.PRNGKey(0))


def sample_video(params: Dict, frames: jnp.ndarray,
                 cfg: DiffusionSRConfig = DiffusionSRConfig(),
                 flow_fn=None) -> jnp.ndarray:
    """(B,T,h,w,3) -> (B,T,H,W,3) with SDEdit propagation: frame 0
    samples from pure noise; each next frame re-noises the (optionally
    flow-warped) previous output to propagate_t of the chain."""
    b, t, h, w, _ = frames.shape

    def step(prev_hr, ft):
        warped = prev_hr if flow_fn is None else flow_fn(prev_hr, ft)
        out = ddim_sample(params, ft, cfg, key=jax.random.PRNGKey(1),
                          init_hr=warped, t_start_frac=cfg.propagate_t)
        return out, out

    first = ddim_sample(params, frames[:, 0], cfg, key=jax.random.PRNGKey(0))
    if t == 1:
        return first[:, None]
    _, rest = jax.lax.scan(step, first, frames[:, 1:].transpose(1, 0, 2, 3, 4))
    return jnp.concatenate([first[:, None], rest.transpose(1, 0, 2, 3, 4)], 1)
