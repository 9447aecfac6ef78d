"""Watermark/logo/subtitle removal via mask inpainting.

Reference behavior (processors/watermark_removal.py:109-788: LaMA
backend with OpenCV-inpaint fallback, auto-detection of static overlay
positions, custom masks; subtitle_removal.py: burnt-in subtitle region
removal): auto-detect = regions that stay high-edge/static while the
scene moves; inpaint = LaMa-class FFC net, or a classical diffusion
fill when no weights are available.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

import numpy as np

from framewright_tpu.processors.base import to_float, to_uint8

logger = logging.getLogger(__name__)


@dataclass
class InpaintConfig:
    method: str = "lama"          # lama | diffusion (classical fill)
    auto_detect: bool = True
    detect_frames: int = 30
    static_threshold: float = 6.0   # max temporal std for "static"
    edge_threshold: float = 18.0    # min edge energy for overlay-ish
    dilate: int = 3
    custom_masks: List[Tuple[int, int, int, int]] = field(default_factory=list)
    subtitle_band: bool = False     # restrict auto-detect to bottom third
    weights_dir: Optional[str] = None


class WatermarkRemover:
    def __init__(self, config: Optional[InpaintConfig] = None):
        self.config = config or InpaintConfig()
        self._mask: Optional[np.ndarray] = None
        self._fn = None
        self._params = None

    # ------------------------------------------------------------------
    def detect_mask(self, frames: List[np.ndarray]) -> np.ndarray:
        """Static-overlay mask: per-pixel temporal std low AND spatial
        edge energy high (logos/subtitles persist while content moves)."""
        cfg = self.config
        stack = np.stack([f.astype(np.float32).mean(-1) for f in frames])
        tstd = stack.std(axis=0)
        mean = stack.mean(axis=0)
        gx = np.abs(np.diff(mean, axis=1, prepend=mean[:, :1]))
        gy = np.abs(np.diff(mean, axis=0, prepend=mean[:1]))
        edges = gx + gy
        mask = (tstd < cfg.static_threshold) & (edges > cfg.edge_threshold)
        if cfg.subtitle_band:
            h = mask.shape[0]
            band = np.zeros_like(mask)
            band[int(h * 2 / 3):] = True
            mask &= band
        # reject if "overlay" covers most of the frame (static scene)
        if mask.mean() > 0.2:
            return np.zeros_like(mask, dtype=bool)
        for _ in range(cfg.dilate):
            mask = (
                mask | np.roll(mask, 1, 0) | np.roll(mask, -1, 0)
                | np.roll(mask, 1, 1) | np.roll(mask, -1, 1)
            )
        return mask

    def _build_mask(self, frames: List[np.ndarray]) -> np.ndarray:
        h, w = frames[0].shape[:2]
        mask = np.zeros((h, w), bool)
        if self.config.auto_detect and len(frames) >= 3:
            mask |= self.detect_mask(frames)
        for (x0, y0, x1, y1) in self.config.custom_masks:
            mask[y0:y1, x0:x1] = True
        return mask

    # ------------------------------------------------------------------
    def setup(self, height: int, width: int) -> None:
        if self.config.method != "lama":
            return
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import lama

        arch = lama.LamaConfig(ngf=32, n_down=2, n_blocks=3)
        params = None
        if self.config.weights_dir:
            from pathlib import Path

            from framewright_tpu.models import torch_port

            npz = Path(self.config.weights_dir) / "big-lama.npz"
            if npz.exists():
                params = torch_port.import_npz(npz)
                # released checkpoints differ (LaMa-Fourier 9 blocks /
                # Big-LaMa 18, ratio 0.75) — derive dims from the tree
                arch = lama.config_from_params(params)
        if params is None:
            params = lama.init(jax.random.PRNGKey(3), arch)
        self._params = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v) if hasattr(v, "shape") else v, params)
        self._fn = jax.jit(lambda p, img, m: lama.apply_padded(p, img, m, arch))

    # ------------------------------------------------------------------
    @staticmethod
    def diffusion_fill(frame: np.ndarray, mask: np.ndarray,
                       iters: int = 64) -> np.ndarray:
        """Classical fallback: iterative neighbor averaging inside the
        hole (heat diffusion — the OpenCV NS-inpaint analog)."""
        import jax
        import jax.numpy as jnp

        f = jnp.asarray(frame, jnp.float32) / 255.0
        m = jnp.asarray(mask[..., None], jnp.float32)
        x = f * (1 - m)

        def body(_, x):
            avg = (jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)
                   + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)) / 4.0
            return f * (1 - m) + avg * m

        x = jax.lax.fori_loop(0, iters, body, x)
        return to_uint8(np.asarray(jnp.clip(x, 0, 1)))

    def inpaint_frame(self, frame: np.ndarray, mask: np.ndarray) -> np.ndarray:
        if not mask.any():
            return frame
        if self.config.method == "lama" and self._fn is not None:
            import jax.numpy as jnp

            img = jnp.asarray(to_float(frame[None]))
            m = jnp.asarray(mask[None, ..., None].astype(np.float32))
            out = self._fn(self._params, img, m)
            return to_uint8(np.asarray(out)[0])
        return self.diffusion_fill(frame, mask)

    # ------------------------------------------------------------------
    def process_stream(self, frames_iter: Iterator[np.ndarray]) -> Iterator[np.ndarray]:
        cfg = self.config
        buf: List[np.ndarray] = []
        started = False
        for f in frames_iter:
            if not started:
                buf.append(f)
                if len(buf) >= cfg.detect_frames:
                    self._begin(buf)
                    started = True
                    for bf in buf:
                        yield self.inpaint_frame(bf, self._mask)
                    buf = []
                continue
            yield self.inpaint_frame(f, self._mask)
        if not started:
            if buf:
                self._begin(buf)
                for bf in buf:
                    yield self.inpaint_frame(bf, self._mask)

    def _begin(self, frames: List[np.ndarray]) -> None:
        self.setup(frames[0].shape[0], frames[0].shape[1])
        self._mask = self._build_mask(frames)
        logger.info("inpaint mask covers %.2f%% of frame",
                    100.0 * self._mask.mean())


class SubtitleRemover(WatermarkRemover):
    """Burnt-in subtitle removal: auto-detect restricted to the bottom
    band (reference subtitle_removal.py AutoSubtitleRemover)."""

    def __init__(self, config: Optional[InpaintConfig] = None):
        cfg = config or InpaintConfig()
        cfg.subtitle_band = True
        # subtitles change with dialog: loosen the static requirement
        cfg.static_threshold = max(cfg.static_threshold, 20.0)
        super().__init__(cfg)
