"""Guided (prompt-conditioned) super-resolution / enhancement.

TPU-native counterpart of the reference's guided SR stack
(processors/enhancement/guided_sr.py:274-1114: GuidedSRConfig, style
presets, TextEncoder, SD-upscaler backend + non-diffusion fallback
backend). Design differences, deliberately:

- The prompt is parsed into a STYLE VECTOR over a controlled
  enhancement vocabulary (sharpness, grain, warmth, saturation,
  contrast, brightness, denoise, detail) instead of a CLIP embedding —
  no 4 GB text encoder, deterministic, and the same vector drives both
  backends.
- ``ClassicalGuidedBackend`` applies the style vector directly
  (separable unsharp mask, grain synthesis, white-balance shift, gain/
  gamma) — the analog of the reference's FallbackGuidedBackend
  (guided_sr.py:841), but actually steered by the prompt rather than
  a plain lanczos resize.
- ``DiffusionGuidedBackend`` feeds the style vector into the
  conditional UNet's FiLM pathway (models/diffusion_sr.py style
  conditioning) with classifier-free guidance. Untrained weights make
  this path a no-op relative to the classical one, which is stated
  loudly rather than hidden (same honesty contract as DiffusionSR).
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)

STYLE_DIM = 16

# axis index -> (negative pole words, positive pole words)
_VOCAB = {
    0: (("soft", "smooth", "dreamy"), ("sharp", "crisp", "detailed",
                                       "detail")),
    1: (("clean", "denoised", "noiseless"), ("grainy", "grain", "filmic",
                                             "film")),
    2: (("cool", "cold", "blue"), ("warm", "golden", "sunny")),
    3: (("muted", "desaturated", "faded", "pastel"), ("vivid", "vibrant",
                                                      "saturated",
                                                      "colorful")),
    4: (("dark", "moody", "dim"), ("bright", "luminous", "light")),
    5: (("flat", "low-contrast"), ("contrasty", "punchy", "dramatic",
                                   "contrast")),
    6: ((), ("anime", "cartoon", "illustration")),
    7: ((), ("portrait", "face", "skin")),
}

STYLE_PRESETS: Dict[str, str] = {
    "natural": "clean detailed natural colors",
    "cinematic": "sharp contrasty warm cinematic film grain",
    "anime": "crisp clean vivid anime illustration",
    "vintage": "soft warm faded filmic grain",
    "documentary": "sharp clean neutral detailed",
    "portrait": "soft warm portrait skin detail",
}


def parse_style(prompt: str) -> np.ndarray:
    """Prompt -> (STYLE_DIM,) vector in [-1, 1] over the controlled
    vocabulary; unknown words are ignored (logged once)."""
    vec = np.zeros((STYLE_DIM,), np.float32)
    words = re.findall(r"[a-z][a-z-]+", prompt.lower())
    unknown = []
    for w in words:
        hit = False
        for axis, (neg, pos) in _VOCAB.items():
            if w in pos:
                vec[axis] = min(1.0, vec[axis] + 0.6)
                hit = True
            elif w in neg:
                vec[axis] = max(-1.0, vec[axis] - 0.6)
                hit = True
        if not hit:
            unknown.append(w)
    if unknown:
        logger.debug("guided: words outside the style vocabulary "
                     "ignored: %s", unknown[:8])
    return vec


@dataclass
class GuidedConfig:
    prompt: str = ""
    preset: str = ""                 # STYLE_PRESETS name; prompt appends
    scale: int = 2                   # upscale factor for the standalone path
    strength: float = 0.8            # overall style application strength
    guidance_scale: float = 5.0      # classifier-free guidance (diffusion)
    steps: int = 8                   # diffusion steps
    backend: str = "auto"            # auto|classical|diffusion
    seed: int = 0

    def style_vector(self) -> np.ndarray:
        text = (STYLE_PRESETS.get(self.preset, "") + " " + self.prompt)
        return parse_style(text)


class ClassicalGuidedBackend:
    """Style-vector-driven enhancement in plain numpy (host side).

    Matches the reference FallbackGuidedBackend slot but actually
    applies the prompt: unsharp masking, grain synthesis, white
    balance, saturation, gain and contrast, each scaled by its style
    axis."""

    def __init__(self, cfg: GuidedConfig):
        self.cfg = cfg
        self.vec = cfg.style_vector() * cfg.strength
        self._rng = np.random.default_rng(cfg.seed)

    @staticmethod
    def _blur3(x: np.ndarray) -> np.ndarray:
        # separable 1-2-1 blur per channel
        y = (x + np.roll(x, 1, 0) * 0.5 + np.roll(x, -1, 0) * 0.5) / 2.0
        return (y + np.roll(y, 1, 1) * 0.5 + np.roll(y, -1, 1) * 0.5) / 2.0

    def enhance(self, frame: np.ndarray) -> np.ndarray:
        """uint8 (H,W,3) -> uint8 (same size; upscale happens in the SR
        stage — this backend styles)."""
        v = self.vec
        f = frame.astype(np.float32) / 255.0
        if abs(v[0]) > 1e-3:  # sharpness
            blur = self._blur3(f)
            f = np.clip(f + v[0] * 0.8 * (f - blur), 0, 1)
        if abs(v[2]) > 1e-3:  # warmth: shift R up / B down (or reverse)
            f[..., 0] = np.clip(f[..., 0] * (1 + 0.08 * v[2]), 0, 1)
            f[..., 2] = np.clip(f[..., 2] * (1 - 0.08 * v[2]), 0, 1)
        if abs(v[3]) > 1e-3:  # saturation
            luma = f @ np.asarray([0.299, 0.587, 0.114], np.float32)
            f = np.clip(luma[..., None] + (f - luma[..., None])
                        * (1 + 0.5 * v[3]), 0, 1)
        if abs(v[4]) > 1e-3:  # brightness (gamma)
            f = np.clip(f, 1e-6, 1.0) ** (1.0 / (1.0 + 0.35 * v[4]))
        if abs(v[5]) > 1e-3:  # contrast around mid-gray
            f = np.clip(0.5 + (f - 0.5) * (1 + 0.4 * v[5]), 0, 1)
        if v[1] > 1e-3:       # grain synthesis
            g = self._rng.standard_normal(f.shape[:2]).astype(np.float32)
            f = np.clip(f + (0.04 * v[1]) * g[..., None], 0, 1)
        elif v[1] < -1e-3:    # light denoise
            f = f + (-v[1]) * 0.6 * (self._blur3(f) - f)
        return np.clip(f * 255.0 + 0.5, 0, 255).astype(np.uint8)

    def process_stream(self, frames: Iterator[np.ndarray]
                       ) -> Iterator[np.ndarray]:
        for fr in frames:
            yield self.enhance(fr)


class DiffusionGuidedBackend:
    """Style-conditioned diffusion SR (classifier-free guidance).

    The style vector enters the UNet through the FiLM/time-embedding
    pathway (models/diffusion_sr.denoise ``style=``); guidance runs the
    conditional and unconditional branches and extrapolates. HONESTY:
    with the bundled random weights the learned branch adds nothing
    over bicubic — this backend exists for when trained weights are
    supplied (models/diffusion_sr.py docstring contract)."""

    def __init__(self, cfg: GuidedConfig):
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import diffusion_sr
        from framewright_tpu.models.registry import init_model

        self.cfg = cfg
        spec, params = init_model("DiffusionSR_x4", allow_random=True)
        self._spec = spec
        self._params = params
        self._vec = jnp.asarray(cfg.style_vector()[None])
        arch = spec.arch_config

        @jax.jit
        def run(p, lr, vec):
            return diffusion_sr.ddim_sample(
                p, lr, arch, key=jax.random.PRNGKey(cfg.seed),
                style=vec, guidance_scale=cfg.guidance_scale)

        self._run = run

    def enhance(self, frame: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        lr = jnp.asarray(frame[None].astype(np.float32) / 255.0)
        out = self._run(self._params, lr, self._vec)
        return np.clip(np.asarray(out[0]) * 255.0 + 0.5,
                       0, 255).astype(np.uint8)


class ReferenceGuidedBackend:
    """Reference-image-guided enhancement (reference
    enable_reference_enhance / reference_images_dir group,
    guided_sr.py + processors/reference_enhance): matches the output's
    color statistics and grain level to supplied reference stills.

    Method: Reinhard-style statistics transfer in a decorrelated
    luminance/chroma space (per-channel mean/std toward the pooled
    reference statistics), plus grain-level matching via
    processors/film.GrainManager. Classical and deterministic — works
    with zero model weights, which is exactly the regime archival
    reference stills are used in."""

    def __init__(self, reference_dir, strength: float = 0.5, seed: int = 0):
        from pathlib import Path

        from framewright_tpu.io.png_seq import load_frame
        from framewright_tpu.processors.film import estimate_grain_level

        ref_dir = Path(reference_dir)
        paths = (sorted(ref_dir.glob("*.png"))
                 if ref_dir.is_dir() else [])
        if not paths:
            raise FileNotFoundError(
                f"no reference images (*.png) in {reference_dir}")
        stats = []
        grains = []
        for p in paths[:16]:
            img = load_frame(p).astype(np.float32)
            lab = self._to_ycc(img)
            stats.append((lab.reshape(-1, 3).mean(0),
                          lab.reshape(-1, 3).std(0)))
            grains.append(estimate_grain_level(
                img.astype(np.uint8)))
        self.ref_mean = np.mean([s[0] for s in stats], axis=0)
        self.ref_std = np.mean([s[1] for s in stats], axis=0) + 1e-6
        self.ref_grain = float(np.mean(grains))
        self.strength = strength
        from framewright_tpu.processors.film import GrainManager

        self._grain = GrainManager(mode="match", strength=strength,
                                   seed=seed)

    @staticmethod
    def _to_ycc(rgb: np.ndarray) -> np.ndarray:
        m = np.asarray([[0.299, 0.587, 0.114],
                        [-0.1687, -0.3313, 0.5],
                        [0.5, -0.4187, -0.0813]], np.float32)
        return rgb @ m.T

    @staticmethod
    def _from_ycc(ycc: np.ndarray) -> np.ndarray:
        m = np.asarray([[1.0, 0.0, 1.402],
                        [1.0, -0.344136, -0.714136],
                        [1.0, 1.772, 0.0]], np.float32)
        return ycc @ m.T

    def enhance(self, frame: np.ndarray) -> np.ndarray:
        f = self._to_ycc(frame.astype(np.float32))
        flat = f.reshape(-1, 3)
        mu = flat.mean(0)
        sd = flat.std(0) + 1e-6
        matched = (f - mu) * (self.ref_std / sd) + self.ref_mean
        out = self._from_ycc(f + self.strength * (matched - f))
        out = np.clip(out, 0, 255).astype(np.uint8)
        return self._grain.process(out, target_level=self.ref_grain)

    def process_stream(self, frames: Iterator[np.ndarray]
                       ) -> Iterator[np.ndarray]:
        for fr in frames:
            yield self.enhance(fr)


def make_backend(cfg: GuidedConfig,
                 reference_dir: Optional[str] = None):
    """auto: classical (always works, prompt actually applied);
    diffusion only on request (weights contract documented);
    a reference_dir adds statistics matching to the chain."""
    if cfg.backend == "diffusion":
        base = DiffusionGuidedBackend(cfg)
    else:
        base = ClassicalGuidedBackend(cfg)
    if reference_dir:
        ref = ReferenceGuidedBackend(reference_dir,
                                     strength=cfg.strength,
                                     seed=cfg.seed)

        class _Chain:
            def enhance(self, frame):
                return ref.enhance(base.enhance(frame))

            def process_stream(self, frames):
                for fr in frames:
                    yield self.enhance(fr)

        return _Chain()
    return base
