"""Long-form consistency: anchors, drift correction, chunk blending."""

import numpy as np
import pytest

from framewright_tpu.engine.temporal import (
    ChunkedProcessor,
    ColorConsistencyEnforcer,
    GlobalAnchors,
    LongFormConsistencyManager,
)


def _clip_with_drift(n=120, h=24, w=32, drift=0.4):
    """Stable scene whose processing would drift brighter over time."""
    rng = np.random.default_rng(0)
    base = (rng.random((h, w, 3)) * 120 + 60).astype(np.float32)
    return [np.clip(base * (1.0 + drift * t / n), 0, 255).astype(np.uint8)
            for t in range(n)]


class TestAnchors:
    def test_extraction_counts(self):
        frames = _clip_with_drift(120)
        anchors = GlobalAnchors.extract(iter(frames), sample_every=50)
        assert anchors.total_frames == 120
        assert [p.frame_index for p in anchors.points] == [0, 50, 100]

    def test_interpolation_monotone(self):
        frames = _clip_with_drift(120)
        anchors = GlobalAnchors.extract(iter(frames), sample_every=50)
        b25 = anchors.interpolate(25).brightness
        b0 = anchors.interpolate(0).brightness
        b50 = anchors.interpolate(50).brightness
        assert b0 < b25 < b50
        # clamping outside the range
        assert anchors.interpolate(-5).frame_index == 0
        assert anchors.interpolate(999).frame_index == 100


class TestColorEnforcer:
    def test_pulls_processed_frame_back_to_anchor(self):
        frames = _clip_with_drift(100, drift=0.0)  # stable clip
        anchors = GlobalAnchors.extract(iter(frames), sample_every=20)
        enforcer = ColorConsistencyEnforcer(anchors, strength=1.0)
        # a "processing" pass wrongly brightened frame 50 by 30%
        wrong = np.clip(frames[50].astype(np.float32) * 1.3, 0, 255).astype(np.uint8)
        fixed = enforcer.correct(wrong, 50)
        err_before = abs(float(wrong.mean()) - float(frames[50].mean()))
        err_after = abs(float(fixed.mean()) - float(frames[50].mean()))
        assert err_after < err_before * 0.2


class TestChunkedProcessor:
    def test_identity_preserves_stream(self, gradient_frame):
        frames = [gradient_frame(16, 16, t) for t in range(23)]
        cp = ChunkedProcessor(lambda chunk: chunk, chunk_size=8, overlap=2)
        out = list(cp.process_stream(iter(frames)))
        assert len(out) == 23
        for a, b in zip(out, frames):
            np.testing.assert_array_equal(a, b)

    def test_chunk_local_bias_blended_at_seams(self):
        # each chunk invocation adds a different constant: without
        # blending there would be a hard step at every chunk boundary
        calls = {"n": 0}

        def biased(chunk):
            calls["n"] += 1
            bias = 30.0 if calls["n"] % 2 else -30.0
            return [np.clip(f.astype(np.float32) + bias, 0, 255).astype(np.uint8)
                    for f in chunk]

        frames = [np.full((8, 8, 3), 128, np.uint8)] * 40
        cp = ChunkedProcessor(biased, chunk_size=10, overlap=4)
        out = list(cp.process_stream(iter(frames)))
        assert len(out) == 40
        means = np.array([f.mean() for f in out])
        # max jump between consecutive frames should be softened well
        # below the raw 60-level step
        assert np.abs(np.diff(means)).max() < 30

    def test_short_stream_single_chunk(self, gradient_frame):
        frames = [gradient_frame(16, 16, t) for t in range(5)]
        cp = ChunkedProcessor(lambda c: c, chunk_size=50, overlap=4)
        out = list(cp.process_stream(iter(frames)))
        assert len(out) == 5


class TestManager:
    def test_two_pass_corrects_drifting_process(self):
        frames = _clip_with_drift(60, drift=0.0)
        mgr = LongFormConsistencyManager(chunk_size=16, overlap=4,
                                         anchor_every=20, color_strength=1.0)
        mgr.analyze(iter(frames))

        state = {"gain": 1.0}

        def drifting_process(chunk):
            # simulates a model whose output drifts brighter per chunk
            state["gain"] *= 1.15
            return [np.clip(f.astype(np.float32) * state["gain"], 0, 255)
                    .astype(np.uint8) for f in chunk]

        out = list(mgr.process_stream(iter(frames), drifting_process))
        assert len(out) == 60
        ref_mean = frames[0].astype(np.float32).mean()
        late_mean = out[-1].astype(np.float32).mean()
        assert abs(late_mean - ref_mean) < 12  # drift held in check

    def test_requires_analyze(self):
        mgr = LongFormConsistencyManager()
        with pytest.raises(ValueError):
            list(mgr.process_stream(iter([]), lambda c: c))


class TestFrameIntegrity:
    """Per-frame integrity signals (reference validate_frame_integrity,
    validators.py, called after every enhancement)."""

    def test_nonfinite_flagged(self):
        from framewright_tpu.quality.validators import QualityValidator

        v = QualityValidator()
        v.observe_scores([30.0, 31.0], [0.9, 0.9], [120.0, 118.0],
                         std=[40.0, 41.0], finite=[True, False])
        assert v.integrity_failures == [(1, "non-finite pixels")]
        rep = v.validate()
        assert not rep.passed
        assert any("integrity" in n for n in rep.notes)

    def test_black_frame_flagged(self):
        from framewright_tpu.quality.validators import QualityValidator

        v = QualityValidator()
        v.observe_scores([30.0], [0.9], [0.5], std=[0.1], finite=[True])
        assert v.integrity_failures == [(0, "black/flat frame")]

    def test_healthy_frames_pass(self):
        from framewright_tpu.quality.validators import QualityValidator

        v = QualityValidator(min_psnr=20, min_ssim=0.5)
        v.observe_scores([30.0] * 4, [0.9] * 4, [120.0] * 4,
                         std=[40.0] * 4, finite=[True] * 4)
        assert not v.integrity_failures
        assert v.validate().passed
