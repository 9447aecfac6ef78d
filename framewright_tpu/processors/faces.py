"""Face detection + restoration.

Reference behavior (processors/face_restore.py:46, restoration/faces.py
UnifiedFaceRestorer with GFPGAN/CodeFormer/RestoreFormer backends):
detect faces, crop-align, run a restoration model per face, paste back
with feathered blending.

Implementation: a dependency-free skin-region detector (YCbCr chroma
gating + connected components — the classical approach) and two crop
restoration backends: "sr" (model-zoo SR on the crop) and "gfpgan"
(models/gfpgan.py GFPGANv1Clean generative prior; released .pth loads
through torch_port.port_gfpgan). Enhanced crops blend back with
feathered masks.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

import numpy as np
from scipy import ndimage

from framewright_tpu.processors.base import to_float, to_uint8

logger = logging.getLogger(__name__)


@dataclass
class FaceBox:
    x0: int
    y0: int
    x1: int
    y1: int
    confidence: float = 0.0

    @property
    def w(self) -> int:
        return self.x1 - self.x0

    @property
    def h(self) -> int:
        return self.y1 - self.y0

    def expand(self, factor: float, bounds: Tuple[int, int]) -> "FaceBox":
        bh, bw = bounds
        cx, cy = (self.x0 + self.x1) / 2, (self.y0 + self.y1) / 2
        nw, nh = self.w * factor, self.h * factor
        return FaceBox(
            max(0, int(cx - nw / 2)), max(0, int(cy - nh / 2)),
            min(bw, int(cx + nw / 2)), min(bh, int(cy + nh / 2)),
            self.confidence,
        )


class FaceDetector:
    """Skin-chroma segmentation detector (classical YCbCr gates)."""

    def __init__(self, min_face_frac: float = 0.002, max_faces: int = 8):
        self.min_face_frac = min_face_frac
        self.max_faces = max_faces

    def detect(self, frame: np.ndarray) -> List[FaceBox]:
        f = frame.astype(np.float32)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        skin = (cb > 77) & (cb < 127) & (cr > 133) & (cr < 173) & (y > 40)
        # clean small speckles
        skin = ndimage.binary_opening(skin, iterations=1)
        labels, n = ndimage.label(skin)
        if n == 0:
            return []
        boxes: List[FaceBox] = []
        h, w = skin.shape
        min_area = self.min_face_frac * h * w
        for sl in ndimage.find_objects(labels):
            if sl is None:
                continue
            ys, xs = sl
            bh, bw = ys.stop - ys.start, xs.stop - xs.start
            area = bh * bw
            if area < min_area:
                continue
            aspect = bh / max(bw, 1)
            if not (0.6 <= aspect <= 2.4):
                continue
            fill = skin[sl].mean()
            if fill < 0.35:
                continue
            boxes.append(FaceBox(xs.start, ys.start, xs.stop, ys.stop,
                                 confidence=float(fill)))
        boxes.sort(key=lambda bx: -bx.confidence)
        return boxes[: self.max_faces]


class RetinaFaceDetector:
    """Learned detector: RetinaFace mobilenet0.25 in JAX
    (models/retinaface.py; the reference drives face restoration with
    facexlib's RetinaFace). Requires REAL weights —
    construction raises when only random init would be available, so
    callers fall back to the heuristic detector explicitly."""

    def __init__(self, weights_dir: Optional[str] = None,
                 score_thresh: float = 0.5, max_faces: int = 8,
                 pad_mult: int = 32):
        from pathlib import Path

        from framewright_tpu.models.registry import (
            default_weights_dir,
            init_model,
        )

        name = "RetinaFace_mnet025"
        wdir = Path(weights_dir) if weights_dir else default_weights_dir()
        if not ((wdir / f"{name}.npz").exists()
                or (wdir / f"{name}.pth").exists()):
            raise FileNotFoundError(
                f"no {name} weights in {wdir} (a randomly initialized "
                "detector would detect noise)")
        spec, params = init_model(name, weights_dir=weights_dir,
                                  allow_random=False)
        self._arch = spec.arch_config
        self._params = params
        self.score_thresh = score_thresh
        self.max_faces = max_faces
        self.pad_mult = pad_mult
        self._fn = None

    def detect(self, frame: np.ndarray) -> List[FaceBox]:
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import retinaface

        h, w = frame.shape[:2]
        ph, pw = -h % self.pad_mult, -w % self.pad_mult
        x = np.pad(frame, ((0, ph), (0, pw), (0, 0)))
        if self._fn is None:
            arch = self._arch
            self._fn = jax.jit(
                lambda p, t: retinaface.apply(p, t, arch))
        score, boxes, _ = self._fn(
            self._params,
            jnp.asarray(x[None].astype(np.float32) / 255.0))
        score = np.asarray(score[0])
        boxes = np.asarray(boxes[0])
        keep = retinaface.nms_host(score, boxes, self._arch.nms_iou,
                                   self.score_thresh, self._arch.top_k)
        out: List[FaceBox] = []
        hh, ww = h + ph, w + pw
        for i in keep[: self.max_faces]:
            x0 = int(np.clip(boxes[i, 0] * ww, 0, w - 1))
            y0 = int(np.clip(boxes[i, 1] * hh, 0, h - 1))
            x1 = int(np.clip(boxes[i, 2] * ww, x0 + 1, w))
            y1 = int(np.clip(boxes[i, 3] * hh, y0 + 1, h))
            out.append(FaceBox(x0, y0, x1, y1, confidence=float(score[i])))
        return out


def make_detector(kind: str = "auto",
                  weights_dir: Optional[str] = None):
    """auto: learned RetinaFace when real weights exist, else the
    classical skin-chroma detector (logged)."""
    if kind in ("auto", "retinaface"):
        try:
            return RetinaFaceDetector(weights_dir=weights_dir)
        except (FileNotFoundError, Exception) as exc:  # noqa: BLE001
            if kind == "retinaface":
                raise
            logger.info("RetinaFace weights unavailable (%s); using the "
                        "heuristic skin-chroma detector", exc)
    return FaceDetector()


@dataclass
class FaceRestoreConfig:
    strength: float = 0.8
    backend: str = "sr"           # sr | gfpgan | codeformer
    sr_model: str = "realesr-general-x4v3"
    detector: str = "auto"        # auto | retinaface | heuristic
    expand: float = 1.6
    crop_size: int = 128          # model input (static shape for jit)
    weights_dir: Optional[str] = None
    fidelity_weight: float = 0.5  # codeformer w: 0 quality .. 1 fidelity


@dataclass
class FaceRestoreResult:
    frames: int = 0
    faces_restored: int = 0


class FaceRestorer:
    def __init__(self, config: Optional[FaceRestoreConfig] = None):
        self.config = config or FaceRestoreConfig()
        self.detector = make_detector(self.config.detector,
                                      self.config.weights_dir)
        self._fn = None
        self._spec = None
        self._params = None
        self.result = FaceRestoreResult()

    def setup(self, height: int, width: int) -> None:
        import jax
        import jax.numpy as jnp

        if self.config.backend == "gfpgan":
            from pathlib import Path

            from framewright_tpu.models import gfpgan, torch_port

            arch = gfpgan.GFPGANConfig()
            params = None
            if self.config.weights_dir:
                wdir = Path(self.config.weights_dir)
                npz = wdir / "GFPGANv1.4.npz"
                pth = wdir / "GFPGANv1.4.pth"
                if npz.exists():
                    params = torch_port.import_npz(npz)
                elif pth.exists():
                    sd = torch_port.load_state_dict(pth)
                    params = torch_port.port_gfpgan(sd)
                    torch_port.export_npz(params, npz)
            if params is None:
                # tiny random-init stand-in (tests / missing weights):
                # quality comes from released weights
                arch = gfpgan.GFPGANConfig(out_size=64, num_style_feat=64,
                                           channel_multiplier=1, num_mlp=2,
                                           narrow=0.25)
                params = gfpgan.init(jax.random.PRNGKey(6), arch)
            params = jax.tree_util.tree_map(
                lambda v: jnp.asarray(v) if hasattr(v, "shape") else v, params)
            self._params = params
            self.config.crop_size = arch.out_size
            self._gfpgan_arch = arch

            @jax.jit
            def run_g(p, x):
                # x in [0,1] -> official [-1,1] normalization and back
                y = gfpgan.apply(p, x * 2.0 - 1.0, arch)
                return jnp.clip((y + 1.0) / 2.0, 0.0, 1.0)

            self._fn = run_g
            self._gfpgan = True
            return

        if self.config.backend == "codeformer":
            from pathlib import Path

            from framewright_tpu.models import codeformer, torch_port

            arch = codeformer.CodeFormerConfig()
            params = None
            if self.config.weights_dir:
                wdir = Path(self.config.weights_dir)
                npz = wdir / "CodeFormer.npz"
                pth = wdir / "CodeFormer.pth"
                if npz.exists():
                    params = torch_port.import_npz(npz)
                elif pth.exists():
                    sd = torch_port.load_state_dict(pth)
                    params = torch_port.port_codeformer(sd)
                    torch_port.export_npz(params, npz)
            if params is None:
                # tiny random-init stand-in (tests / missing weights)
                arch = codeformer.CodeFormerConfig(
                    img_size=64, nf=8, ch_mult=(1, 2, 4), res_blocks=1,
                    emb_dim=16, codebook_size=64, dim_embd=32, n_head=4,
                    n_layers=2, connect=(32,))
                params = codeformer.init(jax.random.PRNGKey(7), arch)
            params = jax.tree_util.tree_map(
                lambda v: jnp.asarray(v) if hasattr(v, "shape") else v,
                params)
            self._params = params
            self.config.crop_size = arch.img_size
            w = float(self.config.fidelity_weight)

            @jax.jit
            def run_c(p, x):
                return codeformer.apply(p, x, arch, w=w)

            self._fn = run_c
            self._gfpgan = True    # same crop->restore->paste path
            return

        from framewright_tpu.models.registry import init_model

        spec, params = init_model(
            self.config.sr_model, weights_dir=self.config.weights_dir,
            dtype=jnp.float32, allow_random=True,
        )
        self._spec = spec
        self._params = params
        self._gfpgan = False

        @jax.jit
        def run(p, x):
            return jnp.clip(spec.apply_fn(p, x, spec.arch_config), 0.0, 1.0)

        self._fn = run

    # ------------------------------------------------------------------
    def _enhance_crop(self, crop: np.ndarray) -> np.ndarray:
        """Enhance one face crop at a fixed model size, return at the
        crop's original size."""
        import jax.numpy as jnp

        from framewright_tpu.models.layers import resize_bicubic

        ch, cw = crop.shape[:2]
        s = self.config.crop_size
        x = resize_bicubic(jnp.asarray(to_float(crop[None])), (s, s))
        y = self._fn(self._params, x)          # sr: (1,s*scale,...); gfpgan: (1,s,s,3)
        y = resize_bicubic(y, (ch, cw))
        return to_uint8(np.asarray(y))[0]

    @staticmethod
    def _feather_mask(h: int, w: int, border: int = 8) -> np.ndarray:
        m = np.ones((h, w), np.float32)
        ramp = np.linspace(0, 1, max(border, 1), endpoint=False)
        m[:border] *= ramp[:, None]
        m[-border:] *= ramp[::-1][:, None]
        m[:, :border] *= ramp[None, :]
        m[:, -border:] *= ramp[::-1][None, :]
        return m[..., None]

    def restore_frame(self, frame: np.ndarray) -> np.ndarray:
        boxes = self.detector.detect(frame)
        if not boxes:
            return frame
        out = frame.astype(np.float32)
        for box in boxes:
            eb = box.expand(self.config.expand, frame.shape[:2])
            if eb.w < 12 or eb.h < 12:
                continue
            crop = frame[eb.y0:eb.y1, eb.x0:eb.x1]
            enhanced = self._enhance_crop(crop).astype(np.float32)
            mask = self._feather_mask(eb.h, eb.w) * self.config.strength
            region = out[eb.y0:eb.y1, eb.x0:eb.x1]
            out[eb.y0:eb.y1, eb.x0:eb.x1] = region * (1 - mask) + enhanced * mask
            self.result.faces_restored += 1
        return np.clip(out, 0, 255).astype(np.uint8)

    def process_stream(self, frames_iter: Iterator[np.ndarray]) -> Iterator[np.ndarray]:
        started = False
        for f in frames_iter:
            if not started:
                self.setup(f.shape[0], f.shape[1])
                started = True
            self.result.frames += 1
            yield self.restore_frame(f)
