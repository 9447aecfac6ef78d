"""Output quality validation.

Reference behavior (validators.py:332-393 + config.py:327-328): after
restore, compute PSNR/SSIM between output and a scaled reference via
ffmpeg filters, gate on min_psnr=25 / min_ssim=0.85, and validate
temporal consistency (no dropped/black frames). TPU version: sampled
(input, output) frame pairs are collected during the streaming pass and
scored on-device with the jit metrics — no second decode pass, no
subprocess.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from framewright_tpu.ops import metrics

logger = logging.getLogger(__name__)


@dataclass
class QualityReport:
    psnr: float = 0.0
    ssim: float = 0.0
    vmaf: float = 0.0                      # vmaf_proxy; 0 = not computed
    min_psnr: float = 25.0
    min_ssim: float = 0.85
    min_vmaf: float = 0.0
    samples: int = 0
    passed: bool = False
    per_sample_psnr: List[float] = field(default_factory=list)
    temporal_ok: bool = True
    notes: List[str] = field(default_factory=list)

    def to_dict(self) -> dict:
        d = {
            "psnr": round(self.psnr, 3),
            "ssim": round(self.ssim, 4),
            "samples": self.samples,
            "passed": self.passed,
            "temporal_ok": self.temporal_ok,
            "notes": self.notes,
        }
        if self.vmaf:
            d["vmaf_proxy"] = round(self.vmaf, 2)
        return d


class QualityValidator:
    """Collects sampled pairs during streaming, scores at the end.

    The comparison reference is the bicubic upscale of the input frame
    (structural fidelity check — catches corruption, color shifts, tile
    seams; enhancement should INCREASE detail, so thresholds are gates
    against breakage, mirroring the reference's use)."""

    def __init__(self, min_psnr: float = 25.0, min_ssim: float = 0.85,
                 sample_every: int = 25, max_samples: int = 24,
                 min_vmaf: float = 0.0):
        self.min_psnr = min_psnr
        self.min_ssim = min_ssim
        self.min_vmaf = min_vmaf
        self.sample_every = max(1, sample_every)
        self.max_samples = max_samples
        self._pairs: List[Tuple[np.ndarray, np.ndarray]] = []
        self._frame_count = 0
        self._luma_track: List[float] = []
        self._device_psnr: List[float] = []
        self._device_ssim: List[float] = []
        self.integrity_failures: List[Tuple[int, str]] = []

    def observe(self, in_frame: np.ndarray, out_frame: np.ndarray) -> None:
        """Call with (pre-stage, post-stage) uint8 frames."""
        i = self._frame_count
        self._frame_count += 1
        self._luma_track.append(float(out_frame.mean()))
        if i % self.sample_every == 0 and len(self._pairs) < self.max_samples:
            self._pairs.append((in_frame.copy(), out_frame.copy()))

    def observe_scores(self, psnr, ssim, luma, std=None,
                       finite=None) -> None:
        """Feed per-frame scores computed ON DEVICE inside the SR jit
        (SRConfig.device_stats): the gate then costs a few scalars per
        frame of transfer and composes with the YUV420 fast path.
        ``std``/``finite`` carry the frame-integrity signals (reference
        validate_frame_integrity: NaN/Inf and flat/black frames)."""
        base = self._frame_count
        self._frame_count += len(psnr)
        self._device_psnr.extend(float(v) for v in psnr)
        self._device_ssim.extend(float(v) for v in ssim)
        self._luma_track.extend(float(v) for v in luma)
        if finite is not None:
            for k, ok in enumerate(finite):
                if not bool(ok):
                    self.integrity_failures.append(
                        (base + k, "non-finite pixels"))
        if std is not None:
            for k, s in enumerate(std):
                if float(s) < 0.5 and float(luma[k]) < 4.0:
                    self.integrity_failures.append(
                        (base + k, "black/flat frame"))

    def validate(self) -> QualityReport:
        import jax.numpy as jnp

        from framewright_tpu.models.layers import resize_bicubic

        rep = QualityReport(min_psnr=self.min_psnr, min_ssim=self.min_ssim,
                            samples=len(self._pairs))
        if self.integrity_failures:
            for idx, why in self.integrity_failures[:8]:
                rep.notes.append(f"frame {idx} integrity: {why}")
        if self._device_psnr and not self._pairs:
            # scores already computed on device inside the SR program
            rep.samples = len(self._device_psnr)
            rep.per_sample_psnr = [round(p, 2) for p in self._device_psnr]
            rep.psnr = float(np.mean(self._device_psnr))
            rep.ssim = float(np.mean(self._device_ssim))
            rep.temporal_ok = self._check_temporal()
            if not rep.temporal_ok:
                rep.notes.append(
                    "luma discontinuity: possible dropped/black frames")
            rep.passed = (rep.psnr >= self.min_psnr
                          and rep.ssim >= self.min_ssim and rep.temporal_ok
                          and not self.integrity_failures)
            return rep
        if not self._pairs:
            rep.passed = True
            rep.notes.append("no samples collected")
            return rep
        psnrs, ssims = [], []
        for inp, out in self._pairs:
            oh, ow = out.shape[:2]
            ref = resize_bicubic(
                jnp.asarray(inp[None], jnp.float32) / 255.0, (oh, ow))
            o = jnp.asarray(out[None], jnp.float32) / 255.0
            psnrs.append(float(metrics.psnr(o, ref)))
            ssims.append(float(metrics.ssim(o, ref)))
        rep.per_sample_psnr = [round(p, 2) for p in psnrs]
        rep.psnr = float(np.mean(psnrs))
        rep.ssim = float(np.mean(ssims))
        if self.min_vmaf > 0:
            from framewright_tpu.quality.vmaf import VMAFProxy

            refs = np.stack([
                np.asarray(np.clip(resize_bicubic(
                    jnp.asarray(i[None], jnp.float32), o.shape[:2])[0],
                    0, 255)).astype(np.uint8)
                for i, o in self._pairs])
            outs = np.stack([o for _, o in self._pairs])
            rep.vmaf = VMAFProxy().score(refs, outs).score
            rep.min_vmaf = self.min_vmaf
            if rep.vmaf < self.min_vmaf:
                rep.notes.append(
                    f"vmaf_proxy {rep.vmaf:.1f} < gate {self.min_vmaf}")
        rep.temporal_ok = self._check_temporal()
        if not rep.temporal_ok:
            rep.notes.append("luma discontinuity: possible dropped/black frames")
        rep.passed = (
            rep.psnr >= self.min_psnr and rep.ssim >= self.min_ssim
            and rep.temporal_ok
            and (self.min_vmaf <= 0 or rep.vmaf >= self.min_vmaf)
        )
        return rep

    def _check_temporal(self) -> bool:
        """Flag sudden full-frame blackouts/whiteouts (reference
        validate_temporal_consistency analog)."""
        lum = np.asarray(self._luma_track)
        if len(lum) < 3:
            return True
        # black/white frames sandwiched between normal ones
        for i in range(1, len(lum) - 1):
            if lum[i] < 2.0 and lum[i - 1] > 20 and lum[i + 1] > 20:
                return False
        return True
