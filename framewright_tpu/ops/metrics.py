"""Quality metrics: PSNR and SSIM.

The reference computes these by shelling out to ffmpeg's psnr/ssim
filters (validators.py:332-393) and gates output on min_ssim=0.85 /
min_psnr=25 (config.py:327-328). Here they are jit-compiled JAX
reductions that can run on-device right after a stage, or on host via
numpy inputs — no subprocess, no extra decode pass.

SSIM follows the standard Wang et al. formulation: 11x11 Gaussian
window, sigma 1.5, K1=0.01, K2=0.03, computed per channel and averaged
(matching ffmpeg's "All" aggregate semantics).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """PSNR in dB over all pixels of matching-shape arrays."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10((max_val * max_val) / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def _filter2(x: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """Depthwise valid-mode 2D filter on (N, H, W, C)."""
    c = x.shape[-1]
    k = jnp.asarray(kern)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("max_val",))
def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM over (H,W,C) or (N,H,W,C) images."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 3:
        a = a[None]
        b = b[None]
    kern = _gaussian_kernel()
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _filter2(a, kern)
    mu_b = _filter2(b, kern)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = _filter2(a * a, kern) - mu_aa
    s_bb = _filter2(b * b, kern) - mu_bb
    s_ab = _filter2(a * b, kern) - mu_ab
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den)


def psnr_per_frame(a: jnp.ndarray, b: jnp.ndarray,
                   max_val: float = 1.0) -> jnp.ndarray:
    """(N,H,W,C) pairs -> (N,) PSNR dB — traceable inside larger jits
    (the SR program computes the quality gate's stats in the same
    device pass as the model forward; restorer device_stats path)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10((max_val * max_val) / jnp.maximum(mse, 1e-12))


def ssim_per_frame(a: jnp.ndarray, b: jnp.ndarray,
                   max_val: float = 1.0) -> jnp.ndarray:
    """(N,H,W,C) pairs -> (N,) mean SSIM, traceable."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    kern = _gaussian_kernel()
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _filter2(a, kern)
    mu_b = _filter2(b, kern)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = _filter2(a * a, kern) - mu_aa
    s_bb = _filter2(b * b, kern) - mu_bb
    s_ab = _filter2(a * b, kern) - mu_ab
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


def ms_ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
            levels: int = 3) -> jnp.ndarray:
    """Multi-scale SSIM (reduced-level variant of Wang et al. MS-SSIM;
    the reference exposes VMAF/SSIM via ffmpeg filters — this is the
    in-process multi-scale structural metric)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 3:
        a = a[None]
        b = b[None]
    weights = {3: (0.25, 0.35, 0.40), 2: (0.4, 0.6), 1: (1.0,)}[levels]
    total = 1.0
    for lv in range(levels):
        s = ssim(a, b, max_val=max_val)
        total = total * (jnp.clip(s, 1e-6, 1.0) ** weights[lv])
        if lv < levels - 1:
            # 2x downsample via average pooling
            a = jax.lax.reduce_window(a, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID") / 4.0
            b = jax.lax.reduce_window(b, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID") / 4.0
    return total


def psnr_np(a: np.ndarray, b: np.ndarray, max_val: float = 255.0) -> float:
    """Host-side PSNR for uint8 frames."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse <= 1e-12:
        return float("inf")
    return float(10.0 * np.log10(max_val * max_val / mse))


def ssim_np(a: np.ndarray, b: np.ndarray, max_val: float = 255.0) -> float:
    """Host-side SSIM for single uint8 frames (delegates to the jit
    path; adds the batch dim and scales to [0,1])."""
    aj = jnp.asarray(a.astype(np.float32) / max_val)[None]
    bj = jnp.asarray(b.astype(np.float32) / max_val)[None]
    return float(ssim(aj, bj, max_val=1.0))


def quality_gate(
    out_frames: jnp.ndarray,
    ref_frames: jnp.ndarray,
    min_psnr: float = 25.0,
    min_ssim: float = 0.85,
) -> Tuple[bool, dict]:
    """Apply the reference's validation thresholds; returns (ok, metrics).

    ``ref_frames`` is the pre-stage content resized to output resolution
    (validation compares structural fidelity, not the raw source).
    """
    p = float(psnr(out_frames, ref_frames))
    s = float(ssim(out_frames, ref_frames))
    ok = p >= min_psnr and s >= min_ssim
    return ok, {"psnr": p, "ssim": s, "min_psnr": min_psnr, "min_ssim": min_ssim}
