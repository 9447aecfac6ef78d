"""Latent-space temporal smoothing (temporal-VAE class) tests."""

import numpy as np
import pytest

from framewright_tpu.processors.latent_temporal import (
    LatentTemporalConfig,
    LatentTemporalSmoother,
)


def _flickery_clip(t=16, h=24, w=32, seed=0):
    """Static scene + global brightness flicker + per-frame noise."""
    rng = np.random.default_rng(seed)
    base = rng.integers(60, 190, (h, w, 3)).astype(np.float32)
    frames = []
    for i in range(t):
        flicker = 18.0 * np.sin(i * 2.1)
        noise = rng.standard_normal((h, w, 3)) * 4.0
        frames.append(np.clip(base + flicker + noise, 0, 255))
    return np.stack(frames).astype(np.uint8)


def _luma_series(frames):
    return frames.astype(np.float32).mean(axis=(1, 2, 3))


class TestLatentSmoothing:
    def test_reduces_flicker_variance(self):
        clip = _flickery_clip()
        sm = LatentTemporalSmoother(LatentTemporalConfig(
            chunk=16, overlap=4, strength=0.8))
        out = sm.process_chunk(clip)
        assert out.shape == clip.shape
        lin = np.diff(_luma_series(clip))
        lout = np.diff(_luma_series(out))
        assert np.abs(lout).mean() < np.abs(lin).mean() * 0.7

    def test_static_content_preserved(self):
        clip = _flickery_clip()
        sm = LatentTemporalSmoother()
        out = sm.process_chunk(clip)
        # spatial structure survives: correlation with the input scene
        a = clip.mean(0).ravel().astype(np.float32)
        b = out.mean(0).ravel().astype(np.float32)
        r = np.corrcoef(a, b)[0, 1]
        assert r > 0.99

    def test_scene_cut_not_smeared(self):
        rng = np.random.default_rng(1)
        a = np.full((8, 16, 16, 3), 40, np.uint8)
        b = np.full((8, 16, 16, 3), 200, np.uint8)
        clip = np.concatenate([a, b]) + rng.integers(
            0, 3, (16, 16, 16, 3)).astype(np.uint8)
        sm = LatentTemporalSmoother(LatentTemporalConfig(
            chunk=16, strength=0.9))
        out = sm.process_chunk(clip).astype(np.float32)
        # frames right after the cut must stay near the new level
        assert abs(out[8].mean() - 200) < 25
        assert abs(out[7].mean() - 40) < 25

    def test_stream_emits_every_frame_once(self):
        clip = _flickery_clip(t=37)
        sm = LatentTemporalSmoother(LatentTemporalConfig(
            chunk=12, overlap=3))
        out = list(sm.reduce_stream(iter(clip)))
        assert len(out) == 37
        assert all(o.shape == clip[0].shape for o in out)

    def test_short_stream_passthrough_shapes(self):
        clip = _flickery_clip(t=2)
        sm = LatentTemporalSmoother()
        out = list(sm.reduce_stream(iter(clip)))
        assert len(out) == 2

    def test_stream_boundary_exact_chunk(self):
        clip = _flickery_clip(t=24)
        sm = LatentTemporalSmoother(LatentTemporalConfig(
            chunk=12, overlap=4))
        out = list(sm.reduce_stream(iter(clip)))
        assert len(out) == 24
