"""VMAF-class perceptual quality metric, on device.

Fills the reference's VMAF slot (quality/vmaf.py:133 VMAFCalculator,
which shells out to libvmaf via ffmpeg). TPU-native redesign: the
elementary features VMAF fuses — multi-scale VIF (visual information
fidelity), a detail-loss measure (ADM-like), and temporal motion — are
computed as jitted JAX programs (Gaussian pyramids = small depthwise
convs), then fused with a fixed linear head calibrated to the 0-100
VMAF range. Without libvmaf's trained SVM the fusion is approximate, so
the class is named honestly (VMAFProxy) and scores are labelled
``vmaf_proxy``; the FEATURES are the standard ones, and scores are
monotone in real degradations (noise, blur, blocking), which is what a
quality gate needs.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_SIGMA_N = 2.0          # VIF noise variance (HVS model)


def _luma(frames: np.ndarray) -> np.ndarray:
    f = frames.astype(np.float32)
    if f.ndim == 4 and f.shape[-1] == 3:
        return f @ np.asarray([0.299, 0.587, 0.114], np.float32)
    return f[..., 0] if f.ndim == 4 else f


def _build_jit():
    import jax
    import jax.numpy as jnp

    def gauss_kernel(sigma):
        r = int(3 * sigma)
        ax = np.arange(-r, r + 1, dtype=np.float32)
        g = np.exp(-0.5 * (ax / sigma) ** 2)
        return jnp.asarray(g / g.sum())

    def blur(x, k):
        # separable gaussian on (N, H, W)
        kx = k[None, :, None, None]
        ky = k[:, None, None, None]
        x = x[..., None]
        x = jax.lax.conv_general_dilated(
            x, kx, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(
            x, ky, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x[..., 0]

    def down2(x):
        n, h, w = x.shape
        return x[:, : h // 2 * 2, : w // 2 * 2].reshape(
            n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    k = gauss_kernel(1.2)

    def vif_scale(ref, dis):
        """VIF numerator/denominator at one scale (per frame)."""
        mu_r, mu_d = blur(ref, k), blur(dis, k)
        s_rr = blur(ref * ref, k) - mu_r * mu_r
        s_dd = blur(dis * dis, k) - mu_d * mu_d
        s_rd = blur(ref * dis, k) - mu_r * mu_d
        s_rr = jnp.maximum(s_rr, 0.0)
        s_dd = jnp.maximum(s_dd, 0.0)
        g = s_rd / (s_rr + 1e-4)
        sv = jnp.maximum(s_dd - g * s_rd, 0.0)
        num = jnp.log1p(g * g * s_rr / (sv + _SIGMA_N))
        den = jnp.log1p(s_rr / _SIGMA_N)
        return (jnp.sum(num, axis=(1, 2)) + 1e-6,
                jnp.sum(den, axis=(1, 2)) + 1e-6)

    @jax.jit
    def features(ref, dis, prev_ref):
        """ref/dis: (N, H, W) float luma 0-255. Returns per-frame
        feature dict."""
        ref = ref / 255.0 * 255.0  # keep scale; clarity only
        vifs = []
        r, d = ref, dis
        for _ in range(4):
            num, den = vif_scale(r, d)
            vifs.append(num / den)
            r, d = down2(r), down2(d)
        vif = jnp.stack(vifs, axis=0)                 # (4, N)
        # detail loss (ADM-like): high-frequency energy retained
        hf_r = ref - blur(ref, k)
        hf_d = dis - blur(dis, k)
        keep = jnp.sum(jnp.minimum(jnp.abs(hf_d), jnp.abs(hf_r)),
                       axis=(1, 2))
        total = jnp.sum(jnp.abs(hf_r), axis=(1, 2)) + 1e-6
        dlm = keep / total
        # motion: mean abs diff of blurred ref luma vs previous frame
        motion = jnp.mean(jnp.abs(blur(ref, k) - blur(prev_ref, k)),
                          axis=(1, 2))
        return {"vif": vif, "dlm": dlm, "motion": motion}

    return features


@dataclass
class VMAFResult:
    score: float = 0.0                       # 0-100, higher = better
    per_frame: List[float] = field(default_factory=list)
    vif: float = 0.0
    dlm: float = 0.0
    motion: float = 0.0

    def to_dict(self) -> dict:
        return {"vmaf_proxy": round(self.score, 2),
                "vif": round(self.vif, 4), "dlm": round(self.dlm, 4),
                "motion": round(self.motion, 3),
                "frames": len(self.per_frame)}


class VMAFProxy:
    """Batched reference/distorted scorer (reference VMAFCalculator,
    quality/vmaf.py:133). Call score(ref_frames, dis_frames) with uint8
    (N, H, W[, 3]) arrays of identical shape."""

    # linear fusion head: calibrated so pristine -> ~100,
    # heavy degradation -> <30 (scale weights follow VMAF's emphasis on
    # coarse scales; motion mildly forgives high-motion content)
    W_VIF = (8.0, 10.0, 12.0, 14.0)
    W_DLM = 46.0
    BIAS = 6.0
    MOTION_RELIEF = 0.06

    def __init__(self):
        self._features = None

    def score(self, ref: np.ndarray, dis: np.ndarray) -> VMAFResult:
        import jax.numpy as jnp

        if ref.shape != dis.shape:
            raise ValueError(f"shape mismatch {ref.shape} vs {dis.shape}")
        if self._features is None:
            self._features = _build_jit()
        r = jnp.asarray(_luma(ref))
        d = jnp.asarray(_luma(dis))
        prev = jnp.concatenate([r[:1], r[:-1]], axis=0)
        f = self._features(r, d, prev)
        vif = np.asarray(f["vif"])               # (4, N)
        dlm = np.asarray(f["dlm"])               # (N,)
        motion = np.asarray(f["motion"])         # (N,)
        per = self.BIAS + dlm * self.W_DLM
        for s, w in enumerate(self.W_VIF):
            per = per + np.clip(vif[s], 0, 1.2) * w
        per = per + np.minimum(motion * self.MOTION_RELIEF, 2.0)
        per = np.clip(per, 0.0, 100.0)
        res = VMAFResult(
            score=float(per.mean()),
            per_frame=[float(v) for v in per],
            vif=float(vif.mean()), dlm=float(dlm.mean()),
            motion=float(motion.mean()))
        return res
