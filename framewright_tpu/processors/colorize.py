"""B&W colorization: exemplar propagation + learned-backend slot.

Reference behavior (processors/colorization.py + restoration/
colorization.py:248-736: DeOldify/DDColor/SwinTExCo/ECCV16 backends
plus temporal color propagation; temporal_colorization.py:133
OpticalFlowColorPropagator): colorize keyframes, then propagate chroma
along motion between keyframes for temporal stability.

Round-1: the propagation machinery (the part that makes video
colorization watchable) with two keyframe sources: user-provided
reference images (exemplar mode) or a palette-based statistical
colorizer. DDColor-class learned keyframe colorization slots into
``Colorizer._colorize_keyframe``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np

from framewright_tpu.processors.base import to_float, to_uint8
from framewright_tpu.processors.scene_detection import frame_pair_scores

logger = logging.getLogger(__name__)


def rgb_to_ycbcr(f: np.ndarray):
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], -1), 0, 255)


@dataclass
class ColorizeConfig:
    method: str = "palette"          # palette | exemplar | eccv16 | ddcolor (slot)
    weights_dir: Optional[str] = None
    keyframe_interval: int = 24
    scene_change_threshold: float = 0.30
    saturation: float = 0.5
    reference_image: Optional[np.ndarray] = None  # exemplar mode
    # luma -> (cb, cr) anchor points for the palette colorizer:
    # sepia-like warm tones in shadows, neutral-blue sky in highlights
    palette: List = field(default_factory=lambda: [
        (0.0, 135.0, 135.0), (0.35, 125.0, 140.0),
        (0.7, 120.0, 128.0), (1.0, 124.0, 124.0),
    ])


class Colorizer:
    def __init__(self, config: Optional[ColorizeConfig] = None):
        self.config = config or ColorizeConfig()
        self._flow_fn = None
        self._flow_params = None
        self._arch = None

    def setup(self, height: int, width: int) -> None:
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import ifnet

        arch = ifnet.IFNetConfig(channels=(64, 48), scales=(4, 2), num_res_convs=3)
        self._flow_params = ifnet.init(jax.random.PRNGKey(4), arch)
        self._arch = arch

        @jax.jit
        def flow(p, a, b):
            return ifnet.estimate_flow(p, a, b, arch)

        self._flow_fn = flow

        self._net_fn = None
        if self.config.method == "ddcolor":
            from pathlib import Path

            from framewright_tpu.models import ddcolor as ddn
            from framewright_tpu.models import torch_port

            dcfg = ddn.DDColorConfig()
            params = None
            if self.config.weights_dir:
                npz = Path(self.config.weights_dir) / "ddcolor.npz"
                if npz.exists():
                    params = torch_port.import_npz(npz)
                    dcfg = ddn.large_config()
            if params is None:
                params = ddn.init(jax.random.PRNGKey(9), dcfg)
            self._net_params = jax.tree_util.tree_map(
                lambda v: jnp.asarray(v) if hasattr(v, "shape") else v, params)
            self._net_cfg = dcfg

            @jax.jit
            def colorize_l_dd(p, l):
                return ddn.apply(p, l, dcfg)

            self._net_fn = colorize_l_dd
        if self.config.method == "eccv16":
            from framewright_tpu.models import colorizer_net as cn

            ncfg = cn.ECCV16Config(width_mult=0.125)
            params = None
            if self.config.weights_dir:
                from pathlib import Path

                from framewright_tpu.models import torch_port

                npz = Path(self.config.weights_dir) / "eccv16.npz"
                if npz.exists():
                    params = torch_port.import_npz(npz)
                    ncfg = cn.ECCV16Config()
            if params is None:
                params = cn.init(jax.random.PRNGKey(7), ncfg)
            self._net_params = jax.tree_util.tree_map(
                lambda v: jnp.asarray(v) if hasattr(v, "shape") else v, params)
            self._net_cfg = ncfg

            @jax.jit
            def colorize_l(p, l):
                return cn.apply(p, l, ncfg)

            self._net_fn = colorize_l

    # ------------------------------------------------------------------
    def _colorize_keyframe(self, frame: np.ndarray) -> np.ndarray:
        """Produce chroma for a keyframe. palette: luma-indexed anchor
        interpolation; exemplar: luma-matched transfer from reference."""
        cfg = self.config
        f = frame.astype(np.float32)
        y, _, _ = rgb_to_ycbcr(f)
        if cfg.method in ("eccv16", "ddcolor") and self._net_fn is not None:
            import jax.numpy as jnp

            from framewright_tpu.models import colorizer_net as cn
            from framewright_tpu.models.layers import resize_bilinear

            rgb01 = jnp.asarray(f[None] / 255.0)
            lab = cn.rgb_to_lab(rgb01)
            # official working size 256x256 on L
            l_small = resize_bilinear(lab[..., :1], (256, 256))
            ab = self._net_fn(self._net_params, l_small)
            h, w = f.shape[:2]
            ab = resize_bilinear(ab, (h, w)) * (cfg.saturation * 2.0)
            out = cn.lab_to_rgb(jnp.concatenate([lab[..., :1], ab], -1))
            return np.asarray(np.clip(np.asarray(out)[0] * 255.0 + 0.5, 0, 255),
                              np.uint8)
        if cfg.method == "exemplar" and cfg.reference_image is not None:
            ref = cfg.reference_image.astype(np.float32)
            ry, rcb, rcr = rgb_to_ycbcr(ref)
            # luma-bucket color transfer: mean chroma of reference pixels
            # in the same luma band
            bins = 16
            q = np.clip((y / 256.0 * bins).astype(int), 0, bins - 1)
            rq = np.clip((ry / 256.0 * bins).astype(int), 0, bins - 1)
            cb_map = np.full(bins, np.nan)
            cr_map = np.full(bins, np.nan)
            for k in range(bins):
                sel = rq == k
                if sel.sum() > 16:
                    cb_map[k] = rcb[sel].mean()
                    cr_map[k] = rcr[sel].mean()
            # fill empty luma buckets from the nearest populated one so
            # content brighter/darker than the exemplar still colorizes
            pop = np.where(~np.isnan(cb_map))[0]
            if len(pop) == 0:
                cb_map[:] = 128.0
                cr_map[:] = 128.0
            else:
                for k in range(bins):
                    if np.isnan(cb_map[k]):
                        j = pop[np.argmin(np.abs(pop - k))]
                        cb_map[k] = cb_map[j]
                        cr_map[k] = cr_map[j]
            cb, cr = cb_map[q], cr_map[q]
        else:
            lum = y / 255.0
            pts = np.asarray(self.config.palette, np.float32)
            cb = np.interp(lum, pts[:, 0], pts[:, 1])
            cr = np.interp(lum, pts[:, 0], pts[:, 2])
        s = cfg.saturation
        cb = 128.0 + (cb - 128.0) * s * 2.0
        cr = 128.0 + (cr - 128.0) * s * 2.0
        return ycbcr_to_rgb(y, cb, cr).astype(np.uint8)

    def _propagate(self, colored_prev: np.ndarray, gray_prev: np.ndarray,
                   gray_cur: np.ndarray) -> np.ndarray:
        """Warp previous chroma to the current frame along flow; keep
        the current frame's own luma (the reference's
        OpticalFlowColorPropagator)."""
        import jax.numpy as jnp

        from framewright_tpu.ops.warp import flow_warp

        a = jnp.asarray(to_float(gray_cur[None]))
        b = jnp.asarray(to_float(gray_prev[None]))
        flow = self._flow_fn(self._flow_params, a, b)
        warped = np.asarray(flow_warp(
            jnp.asarray(colored_prev[None].astype(np.float32)), flow))[0]
        y_cur, _, _ = rgb_to_ycbcr(gray_cur.astype(np.float32))
        _, cb, cr = rgb_to_ycbcr(warped)
        return ycbcr_to_rgb(y_cur, cb, cr).astype(np.uint8)

    # ------------------------------------------------------------------
    def colorize_stream(self, frames_iter: Iterator[np.ndarray]) -> Iterator[np.ndarray]:
        cfg = self.config
        prev_gray: Optional[np.ndarray] = None
        prev_colored: Optional[np.ndarray] = None
        since_key = 0
        started = False
        for frame in frames_iter:
            if not started:
                self.setup(frame.shape[0], frame.shape[1])
                started = True
            is_key = prev_colored is None or since_key >= cfg.keyframe_interval
            if prev_gray is not None and not is_key:
                score = float(frame_pair_scores(prev_gray[None], frame[None])[0])
                if score >= cfg.scene_change_threshold:
                    is_key = True
            if is_key:
                colored = self._colorize_keyframe(frame)
                since_key = 0
            else:
                colored = self._propagate(prev_colored, prev_gray, frame)
                since_key += 1
            prev_gray, prev_colored = frame, colored
            yield colored
