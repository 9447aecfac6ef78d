"""Perceptual difference-hash (dHash) for duplicate-frame detection.

The reference hashes PNG files one at a time through PIL/imagehash
(processors/deduplication.py:107-230). Here the hash is a vectorized
batch op (numpy or jax): downscale to (hash_size, hash_size+1) gray,
compare horizontal neighbors -> hash_size^2 bits. Hamming similarity
matches imagehash semantics so the reference's 0.98 default threshold
carries over.
"""

from __future__ import annotations

import numpy as np


def _gray(frames: np.ndarray) -> np.ndarray:
    f = frames.astype(np.float32)
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]


def _area_resize(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Box-filter resize (batch, H, W) -> (batch, oh, ow) via cumulative
    block means; robust for the large downscales dHash uses."""
    b, h, w = img.shape
    # pad to multiples
    ph, pw = -(-h // oh) * oh, -(-w // ow) * ow
    if ph != h or pw != w:
        img = np.pad(img, ((0, 0), (0, ph - h), (0, pw - w)), mode="edge")
    img = img.reshape(b, oh, ph // oh, ow, pw // ow)
    return img.mean(axis=(2, 4))


def dhash_batch(frames: np.ndarray, hash_size: int = 8) -> np.ndarray:
    """(B, H, W, 3) uint8 -> (B, hash_size*hash_size) bool bit arrays."""
    g = _gray(frames)
    small = _area_resize(g, hash_size, hash_size + 1)
    bits = small[:, :, 1:] > small[:, :, :-1]
    return bits.reshape(frames.shape[0], hash_size * hash_size)


def hamming_similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Similarity in [0,1] between bit arrays (1 = identical), matching
    the reference's 1 - distance/bits formula."""
    diff = np.logical_xor(a, b).sum(axis=-1)
    return 1.0 - diff / a.shape[-1]


def consecutive_similarity(hashes: np.ndarray) -> np.ndarray:
    """Similarity of each frame to its predecessor; [0] = 0."""
    if len(hashes) == 0:
        return np.zeros(0)
    sims = np.zeros(len(hashes), dtype=np.float64)
    if len(hashes) > 1:
        sims[1:] = hamming_similarity(hashes[1:], hashes[:-1])
    return sims
