"""Scene intelligence: content classification, motion/lighting, and
adaptive settings (reference processors/scene_intelligence.py:170-744)."""

import numpy as np
import pytest

from framewright_tpu.processors.scene_intelligence import (
    AdaptiveSettings,
    Lighting,
    MotionLevel,
    SceneContent,
    SceneIntelligence,
    _text_regions,
)


@pytest.fixture()
def si(tmp_path):
    # empty weights dir -> heuristic face detector (deterministic)
    return SceneIntelligence(weights_dir=str(tmp_path))


def _noise(shape, level, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, level, shape).astype(np.uint8)


class TestFrameAnalysis:
    def test_low_light_classified(self, si):
        dark = np.full((64, 64, 3), 12, np.uint8)
        a = si.analyze_frame(dark)
        assert a.lighting == Lighting.LOW_LIGHT
        assert a.brightness < 0.1

    def test_bright_classified(self, si):
        bright = np.full((64, 64, 3), 230, np.uint8)
        assert si.analyze_frame(bright).lighting == Lighting.BRIGHT

    def test_motion_levels(self, si):
        base = np.full((64, 64, 3), 100, np.uint8)
        assert si.analyze_frame(base, 1, base).motion == MotionLevel.STATIC
        moved = np.full((64, 64, 3), 160, np.uint8)
        a = si.analyze_frame(moved, 2, base)
        assert a.motion == MotionLevel.EXTREME
        assert a.is_scene_boundary

    def test_noise_estimate_orders(self, si):
        clean = np.full((64, 64, 3), 128, np.uint8)
        noisy = _noise((64, 64, 3), 255)
        assert si.analyze_frame(noisy).noise_level > \
            si.analyze_frame(clean).noise_level

    def test_text_region_detection(self):
        lum = np.full((120, 160), 30.0, np.float32)
        # subtitle band: alternating strokes rows 100-112
        lum[100:112, ::2] = 230.0
        regions = _text_regions(lum)
        assert regions, "subtitle band not found"
        x, y, w, h = regions[0]
        assert 95 <= y <= 105 and h >= 8 and w == 160


class TestContentClasses:
    def test_text_title_content(self, si):
        frame = np.full((120, 160, 3), 20, np.uint8)
        frame[40:80, ::2] = 240          # large text block
        a = si.analyze_frame(frame)
        assert a.content == SceneContent.TEXT_TITLE
        assert a.text_regions

    def test_action_content(self, si):
        rng = np.random.default_rng(0)
        f0 = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        f1 = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        a = si.analyze_frame(f1, 1, f0)
        assert a.motion in (MotionLevel.HIGH, MotionLevel.EXTREME)


class TestAdaptiveSettings:
    def test_face_closeup_restrained(self, si):
        from framewright_tpu.processors.scene_intelligence import SceneAnalysis

        a = SceneAnalysis(frame_number=0, content=SceneContent.FACE_CLOSEUP,
                          faces=[(10, 10, 40, 40)])
        s = si.get_adaptive_settings(a)
        assert s.face_enhancement > 0
        assert s.sharpening <= 0.25
        assert s.apply_regional and s.face_regions

    def test_static_scene_heavy_temporal(self, si):
        from framewright_tpu.processors.scene_intelligence import SceneAnalysis

        a = SceneAnalysis(frame_number=0, motion=MotionLevel.STATIC)
        assert si.get_adaptive_settings(a).temporal_smoothing == 0.8

    def test_low_light_boosts_nr(self, si):
        from framewright_tpu.processors.scene_intelligence import SceneAnalysis

        a = SceneAnalysis(frame_number=0, lighting=Lighting.LOW_LIGHT)
        base = si.get_adaptive_settings(
            SceneAnalysis(frame_number=0)).noise_reduction
        assert si.get_adaptive_settings(a).noise_reduction > base

    def test_base_settings_respected(self, si):
        from framewright_tpu.processors.scene_intelligence import SceneAnalysis

        s = si.get_adaptive_settings(SceneAnalysis(frame_number=0),
                                     base={"sharpening": 0.9})
        assert s.sharpening == 0.9


class TestVideoLevel:
    def test_processing_map_and_summary(self, si):
        rng = np.random.default_rng(1)
        frames = [rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
                  for _ in range(30)]
        analyses = si.analyze_video(iter(frames))
        assert len(analyses) == 3        # sample_every=12
        pmap = si.generate_processing_map(analyses)
        assert set(pmap) == {0, 12, 24}
        assert all(isinstance(v, AdaptiveSettings) for v in pmap.values())
        summary = si.get_summary(analyses)
        assert summary["frames_analyzed"] == 3
        assert "content_distribution" in summary


class TestSceneAdaptiveFilter:
    def _map(self, **over):
        from framewright_tpu.processors.scene_intelligence import (
            AdaptiveSettings,
            SceneAdaptiveFilter,
        )

        s = AdaptiveSettings(**over)
        return SceneAdaptiveFilter({0: s})

    def test_baseline_untouched(self):
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                  for _ in range(3)]
        filt = self._map()            # defaults == baseline, no deltas
        out = list(filt.process_stream(iter(frames)))
        for a, b in zip(frames, out):
            np.testing.assert_array_equal(a, b)
        assert filt.frames_adjusted == 0

    def test_sharpening_raises_gradient_energy(self):
        rng = np.random.default_rng(1)
        soft = rng.integers(100, 156, (64, 64, 3), dtype=np.uint8)
        filt = self._map(sharpening=0.7)
        out = next(filt.process_stream(iter([soft])))
        def energy(f):
            g = f.astype(np.float32).mean(-1)
            return np.abs(np.diff(g, axis=0)).mean()
        assert energy(out) > energy(soft)
        assert filt.frames_adjusted == 1

    def test_nr_reduces_noise(self):
        rng = np.random.default_rng(2)
        noisy = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        filt = self._map(noise_reduction=0.7)
        out = next(filt.process_stream(iter([noisy])))
        assert out.astype(np.float32).std() < noisy.astype(np.float32).std()

    def test_segment_lookup_uses_floor(self):
        from framewright_tpu.processors.scene_intelligence import (
            AdaptiveSettings,
            SceneAdaptiveFilter,
        )

        filt = SceneAdaptiveFilter({0: AdaptiveSettings(),
                                    10: AdaptiveSettings(sharpening=0.9)})
        assert filt._settings_for(5).sharpening == 0.3
        assert filt._settings_for(10).sharpening == 0.9
        assert filt._settings_for(99).sharpening == 0.9


@pytest.mark.slow
class TestSceneAdaptiveE2E:
    def test_restore_with_scene_adaptive(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
        from framewright_tpu.config import Config
        from framewright_tpu.io.y4m import Y4MReader, Y4MWriter
        from framewright_tpu.restorer import VideoRestorer

        rng = np.random.default_rng(0)
        clip = tmp_path / "in.y4m"
        with Y4MWriter(clip, 48, 32, fps=12) as w:
            dark = np.full((32, 48, 3), 20, np.uint8)
            for t in range(12):
                w.write_frame(dark if t < 6 else
                              rng.integers(0, 256, (32, 48, 3),
                                           dtype=np.uint8))
        cfg = Config(project_dir=tmp_path / "p", scale_factor=4,
                     sr_model="realesr-animevideov3",
                     compute_dtype="float32", device_platform="cpu",
                     scene_adaptive=True, validate_output=False)
        out = tmp_path / "out.y4m"
        VideoRestorer(cfg).restore_video(clip, out)
        with Y4MReader(out) as r:
            assert r.count_frames() == 12
            assert r.width == 192
