"""Temporal-VAE-class consistency: latent-space temporal smoothing.

Fills the reference's temporal-VAE slot
(processors/enhancement/temporal_vae.py:935 — encode frames to a
latent space, enforce smoothness there, decode). TPU-native twist: the
latent space is computed FROM THE CLIP on device (Karhunen-Loeve basis
via the Gram trick — an optimal linear autoencoder for the chunk)
instead of a pretrained VAE, so it needs no weights, adapts to
content, and the whole pass is (T,T) x (T,D) matmuls that map
perfectly onto the MXU.

Per chunk of T frames:
  1. F (T, D) centered; Gram G = F F^T (T x T); eigh -> temporal
     modes U, energies lam.
  2. Latent trajectories L = U * sqrt(lam) are low-pass filtered over
     time, with strength increasing for LOW-energy components (the
     flicker/noise modes) and the dominant modes preserved.
  3. Reconstruct F' = L_smooth V^T and blend by ``strength``.

Chunks overlap and crossfade so seams don't flicker. Scene cuts:
adjacent-frame distance spikes gate the smoothing weight to zero
across the cut (computed inside the same jit).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class LatentTemporalConfig:
    chunk: int = 16              # frames per latent chunk (T)
    overlap: int = 4             # crossfaded frames between chunks
    strength: float = 0.6        # blend of the smoothed reconstruction
    smooth_radius: int = 2       # temporal low-pass half-width
    cut_sigma: float = 4.0       # adjacent-distance spike = scene cut


def _build_jit(cfg: LatentTemporalConfig):
    import jax
    import jax.numpy as jnp

    r = cfg.smooth_radius
    kernel = jnp.ones((2 * r + 1,), jnp.float32) / (2 * r + 1)

    @jax.jit
    def run(frames_u8):
        t = frames_u8.shape[0]
        f = frames_u8.reshape(t, -1).astype(jnp.float32) / 255.0
        mu = f.mean(axis=0, keepdims=True)
        fc = f - mu
        g = fc @ fc.T                                    # (T, T)
        lam, u = jnp.linalg.eigh(g)                      # ascending
        lam = jnp.maximum(lam, 0.0)
        s = jnp.sqrt(lam + 1e-12)
        vt = (u.T @ fc) / s[:, None]                     # (T, D)
        el = u * s[None, :]                              # latent trajs

        # scene-cut gate: spike in adjacent-frame distance
        d = jnp.sqrt(jnp.sum((fc[1:] - fc[:-1]) ** 2, axis=1))
        med = jnp.median(d) + 1e-6
        cut = d > cfg.cut_sigma * med                    # (T-1,)
        # smoothing mixes frames across time; forbid mixing across a
        # cut by zeroing the filter response there: build a per-frame
        # weight that collapses to identity near cuts
        cut_near = jnp.concatenate([jnp.zeros((1,), bool), cut])
        near = jnp.convolve(cut_near.astype(jnp.float32),
                            jnp.ones((2 * r + 1,)), mode="same") > 0

        # temporal low-pass per component (columns of el). The filter
        # itself separates signal from artifact: smooth motion
        # trajectories pass nearly intact, oscillating flicker/noise
        # trajectories are attenuated — no energy-based component
        # weighting needed.
        pad = jnp.pad(el, ((r, r), (0, 0)), mode="edge")
        sm = jax.vmap(lambda col: jnp.convolve(col, kernel, mode="valid"),
                      in_axes=1, out_axes=1)(pad)
        w = cfg.strength * (1.0 - near[:, None])
        el2 = el * (1 - w) + sm * w
        f2 = el2 @ vt + mu
        out = jnp.clip(f2, 0.0, 1.0) * 255.0 + 0.5
        return out.astype(jnp.uint8).reshape(frames_u8.shape)

    return run


class LatentTemporalSmoother:
    """Streaming chunked latent-space temporal smoother."""

    def __init__(self, config: Optional[LatentTemporalConfig] = None):
        self.config = config or LatentTemporalConfig()
        self._run = None

    def process_chunk(self, frames: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        if self._run is None:
            self._run = _build_jit(self.config)
        t = frames.shape[0]
        want = self.config.chunk
        if t < 3:
            return frames
        if t < want:  # edge-pad the tail chunk to the static shape
            padded = np.concatenate(
                [frames, np.repeat(frames[-1:], want - t, axis=0)])
            return np.asarray(self._run(jnp.asarray(padded)))[:t]
        return np.asarray(self._run(jnp.asarray(frames)))

    def reduce_stream(self, frames_iter: Iterator[np.ndarray]
                      ) -> Iterator[np.ndarray]:
        cfg = self.config
        step = cfg.chunk - cfg.overlap
        assert step > 0, "overlap must be smaller than chunk"
        buf: list = []
        prev_tail: Optional[np.ndarray] = None  # smoothed overlap frames

        def flush(frames, final):
            nonlocal prev_tail
            out = np.array(self.process_chunk(np.stack(frames)))
            if prev_tail is not None:
                n = min(len(prev_tail), len(out))
                a = np.linspace(0.0, 1.0, n + 2)[1:-1, None, None, None]
                out[:n] = (prev_tail[:n] * (1 - a)
                           + out[:n].astype(np.float32) * a).astype(np.uint8)
            emit_n = len(out) if final else len(out) - cfg.overlap
            for i in range(emit_n):
                yield out[i]
            prev_tail = None if final else out[emit_n:].astype(np.float32)

        for f in frames_iter:
            buf.append(f)
            if len(buf) == cfg.chunk:
                yield from flush(buf, final=False)
                buf = buf[step:]
        if buf and (len(buf) > cfg.overlap or prev_tail is None):
            yield from flush(buf, final=True)
        elif prev_tail is not None:
            # stream ended exactly on a chunk boundary: the held
            # overlap frames are the only ones not yet emitted
            for i in range(len(buf)):
                yield prev_tail[i].astype(np.uint8)

    process_stream = reduce_stream
