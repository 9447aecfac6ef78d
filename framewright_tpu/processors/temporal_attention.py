"""Learned-class temporal consistency via cross-frame patch attention.

Fills the reference's cross-attention temporal slot
(processors/cross_attention_temporal.py:262 — cross-frame attention
that suppresses flicker while respecting motion; also the
temporal-VAE's consistency role, enhancement/temporal_vae.py:935).

TPU-native design — one jitted program over a (2r+1)-frame window:

- Frames are compared as 8x8 patch vectors. For every patch of the
  center frame, candidate patches are the same patch in each neighbor
  frame under a small grid of spatial offsets (motion search).
- Attention weights = softmax(-d2 / (2 sigma^2)) over {self} + all
  candidates, where d2 is the mean squared patch difference. The self
  patch has distance 0, so mismatched content (occlusion, cuts, fast
  motion) automatically collapses to identity — ghost-free by
  construction, unlike EMA flicker reduction (FlickerReducer).
- The weighted blend averages out temporal noise and luminance flicker
  wherever content matches.

No trained weights required (the kernel is a temporal NLM); when a
learned projection is available it can replace the raw-patch distance
(``feature_fn``). Everything is rolls/reshapes/reductions — static
shapes, VPU-friendly, one compile per resolution.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Callable, Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class CFAConfig:
    radius: int = 1                 # temporal neighbors each side
    patch: int = 8                  # patch size (fixed grid)
    search_step: int = 4            # offset grid step (px)
    search_range: int = 1           # offsets in [-r..r]*step per axis
    sigma: float = 6.0              # attention bandwidth (intensity units)
    strength: float = 1.0           # 0..1 blend with the input


def _build_jit(cfg: CFAConfig):
    import jax
    import jax.numpy as jnp

    p = cfg.patch
    offsets = [(dy * cfg.search_step, dx * cfg.search_step)
               for dy in range(-cfg.search_range, cfg.search_range + 1)
               for dx in range(-cfg.search_range, cfg.search_range + 1)]

    def patch_mean(x):
        # (H, W) -> per-patch mean over the fixed p-grid -> (H/p, W/p)
        h, w = x.shape[-2:]
        return x.reshape(*x.shape[:-2], h // p, p, w // p, p).mean(axis=(-3, -1))

    @jax.jit
    def run(window_u8):
        # window: (T, H, W, C) uint8; returns center frame uint8
        win = window_u8.astype(jnp.float32)
        t = win.shape[0]
        center = win[t // 2]
        h, w, c = center.shape

        cands = []
        dists = []
        for n in range(t):
            if n == t // 2:
                continue
            for dy, dx in offsets:
                shifted = jnp.roll(win[n], (dy, dx), axis=(0, 1))
                # MEAN-FREE structural distance: global luminance
                # flicker is a per-patch DC shift; removing it lets
                # flickering-but-aligned content match (the blend then
                # averages the DC = flicker suppression), while true
                # content mismatch still scores high
                diff = (shifted - center).mean(-1).reshape(h, w)
                m = patch_mean(diff)
                d2 = patch_mean(diff ** 2) - m ** 2
                cands.append(shifted)
                dists.append(d2)
        d = jnp.stack(dists)                      # (K, H/p, W/p)
        v = jnp.stack(cands)                      # (K, H, W, C)
        d_all = jnp.concatenate([jnp.zeros_like(d[:1]), d])   # self first
        logits = -d_all / (2.0 * cfg.sigma ** 2)
        wgt = jax.nn.softmax(logits, axis=0)      # (K+1, H/p, W/p)
        wfull = jnp.repeat(jnp.repeat(wgt, p, axis=1), p, axis=2)[..., None]
        out = wfull[0] * center + (wfull[1:] * v).sum(axis=0)
        out = center + cfg.strength * (out - center)
        return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)

    return run


class CrossFrameAttention:
    """Streaming cross-frame attention flicker/noise suppressor
    (reference cross_attention_temporal.py:262)."""

    def __init__(self, config: Optional[CFAConfig] = None,
                 feature_fn: Optional[Callable] = None):
        self.config = config or CFAConfig()
        self.feature_fn = feature_fn  # reserved for learned projections
        self._run = None
        self._pad = None

    def _ensure(self):
        if self._run is None:
            self._run = _build_jit(self.config)

    def process_window(self, window: np.ndarray) -> np.ndarray:
        """window: (2r+1, H, W, C) uint8 -> center frame filtered."""
        import jax.numpy as jnp

        self._ensure()
        t, h, w, c = window.shape
        p = self.config.patch
        ph, pw = (-h) % p, (-w) % p
        x = np.pad(window, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        y = np.asarray(self._run(jnp.asarray(x)))
        return y[:h, :w]

    def reduce_stream(self, frames_iter: Iterator[np.ndarray]
                      ) -> Iterator[np.ndarray]:
        """Emit every frame exactly once, each filtered with its
        (edge-clamped) +-radius temporal window; O(2r+1) memory."""
        r = self.config.radius
        win = 2 * r + 1
        buf: list = []
        base = 0          # global index of buf[0]
        emitted = 0

        def emit(i: int, latest: int):
            window = [buf[min(max(j, 0), latest) - base]
                      for j in range(i - r, i + r + 1)]
            return self.process_window(np.stack(window))

        for f in frames_iter:
            buf.append(f)
            if len(buf) > win:
                buf.pop(0)
                base += 1
            latest = base + len(buf) - 1
            while emitted + r <= latest:
                yield emit(emitted, latest)
                emitted += 1
        latest = base + len(buf) - 1
        while buf and emitted <= latest:
            yield emit(emitted, latest)
            emitted += 1

    # alias matching FlickerReducer's API so the restorer can swap them
    def process_stream(self, frames_iter: Iterator[np.ndarray]
                       ) -> Iterator[np.ndarray]:
        return self.reduce_stream(frames_iter)
