"""Format, film, VHS, and analysis processor tests."""

import numpy as np
import pytest

from framewright_tpu.processors.analysis import (
    ContentAnalyzer,
    ContentType,
    CreditsDetector,
    DegradationType,
    analyze_frame,
    estimate_source_height,
    recommend_settings,
)
from framewright_tpu.processors.film import (
    DefectRepairer,
    FilmStockDetector,
    GateWeaveStabilizer,
    GrainManager,
    estimate_grain_level,
)
from framewright_tpu.processors.format import (
    Deinterlacer,
    InterlaceDetector,
    InverseTelecine,
    LetterboxDetector,
    combing_score,
)
from framewright_tpu.processors.vhs import VHSConfig, VHSProcessor


def _textured(rng, h=48, w=64, smooth=True):
    base = rng.random((h, w)) * 255
    if smooth:
        for _ in range(2):
            base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                    + np.roll(base, (1, 1), (0, 1))) / 4
    return np.stack([base] * 3, -1).astype(np.uint8)


def _interlace(a, b):
    out = a.copy()
    out[1::2] = b[1::2]
    return out


class TestInterlace:
    def test_combing_detection(self, rng):
        a = _textured(rng)
        b = np.roll(a, 6, axis=1)  # motion between fields
        combed = _interlace(a, b)
        assert combing_score(combed) > combing_score(a) * 1.5

    def test_detector_flags_interlaced_clip(self, rng):
        frames = []
        for t in range(20):
            a = np.roll(_textured(rng), t * 4, axis=1)
            b = np.roll(a, 4, axis=1)
            frames.append(_interlace(a, b))
        rep = InterlaceDetector(sample_every=1).analyze(iter(frames))
        assert rep.interlaced

    def test_progressive_not_flagged(self, rng):
        frames = [_textured(rng) for _ in range(10)]
        rep = InterlaceDetector(sample_every=1).analyze(iter(frames))
        assert not rep.interlaced

    def test_deinterlace_reduces_combing(self, rng):
        a = _textured(rng)
        b = np.roll(a, 6, axis=1)
        combed = _interlace(a, b)
        out = Deinterlacer(method="skip").deinterlace(combed)
        assert combing_score(out) < combing_score(combed) * 0.6


class TestTelecine:
    def test_pulldown_removed(self, gradient_frame):
        # 3:2 style: every 5th frame duplicates the previous
        frames = []
        src = 0
        for t in range(25):
            if t % 5 == 2:
                frames.append(frames[-1].copy())
            else:
                frames.append(gradient_frame(48, 64, src))
                src += 1
        ivtc = InverseTelecine()
        out = list(ivtc.process_stream(iter(frames)))
        assert len(out) == 20

    def test_no_pattern_passthrough(self, gradient_frame):
        frames = [gradient_frame(48, 64, t) for t in range(15)]
        out = list(InverseTelecine().process_stream(iter(frames)))
        assert len(out) == 15


class TestLetterbox:
    def test_detects_bars(self, rng):
        inner = _textured(rng, 40, 64)
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[4:44] = inner
        info = LetterboxDetector(sample_frames=3).detect(iter([frame] * 3))
        assert info.top == 4 and info.bottom == 4
        assert info.left == 0 and info.right == 0
        assert info.crop(frame).shape[0] == 40

    def test_dark_scene_not_cropped(self):
        dark = np.full((48, 64, 3), 8, np.uint8)
        info = LetterboxDetector().detect(iter([dark] * 3))
        assert not info.any  # >40% would be cropped -> rejected


class TestFilm:
    def test_bw_detection(self, rng):
        g = _textured(rng)
        rep = FilmStockDetector().analyze(iter([g] * 5))
        assert rep.is_bw
        assert rep.stock == "black_and_white"

    def test_grain_estimate_orders(self, rng):
        clean = np.full((48, 64, 3), 128, np.uint8)
        noisy = np.clip(clean + rng.normal(0, 25, clean.shape), 0, 255).astype(np.uint8)
        assert estimate_grain_level(noisy) > estimate_grain_level(clean) + 0.1

    def test_grain_remove_and_synthesize(self, rng):
        clean = _textured(rng)
        noisy = np.clip(clean.astype(int) + rng.normal(0, 20, clean.shape), 0, 255).astype(np.uint8)
        removed = GrainManager("remove", strength=1.0).process(noisy)
        assert estimate_grain_level(removed) < estimate_grain_level(noisy)
        grained = GrainManager("synthesize", strength=0.8).process(clean)
        assert estimate_grain_level(grained) > estimate_grain_level(clean)

    def test_scratch_repair(self, rng):
        frames = [_textured(rng) for _ in range(10)]
        col = 30
        for f in frames:
            f[:, col] = 255  # bright vertical scratch
        rep = DefectRepairer()
        cols = rep.detect_scratches(frames)
        assert col in cols
        fixed = rep.repair_scratch_columns(frames[0], [col])
        assert fixed[:, col].mean() < 250

    def test_dust_repair(self, rng):
        frames = [_textured(rng).copy() for _ in range(5)]
        frames[2][10:13, 20:23] = 255  # dust blob on one frame only
        out, count = DefectRepairer().repair_dust(frames, 2)
        assert count > 0
        assert out[11, 21].mean() < 200

    def test_gate_weave_stabilization(self, rng):
        base = _textured(rng, 64, 64)
        jitter = [(0, 0), (2, -1), (-1, 2), (1, 1), (-2, 0), (0, -2), (2, 2), (-1, -1)]
        frames = [np.roll(np.roll(base, dy, 0), dx, 1) for dy, dx in jitter]
        stab = GateWeaveStabilizer(smooth_window=5)
        out = stab.stabilize(frames)
        # frame-to-frame differences should shrink
        def motion(fs):
            return np.mean([np.abs(fs[i + 1].astype(int) - fs[i].astype(int)).mean()
                            for i in range(len(fs) - 1)])
        assert motion(out) < motion(frames) * 0.7


class TestVHS:
    def test_tracking_line_repair(self, rng):
        frames = [_textured(rng).copy() for _ in range(5)]
        frames[2][20:23, :] = 250  # tracking band
        vhs = VHSProcessor(VHSConfig(reduce_chroma_bleed=False,
                                     reduce_dot_crawl=False, fix_dropouts=False))
        out = list(vhs.process_stream(iter(frames), radius=2))
        assert len(out) == 5
        assert out[2][21].mean() < 200

    def test_stream_preserves_count(self, rng):
        frames = [_textured(rng) for _ in range(7)]
        out = list(VHSProcessor().process_stream(iter(frames)))
        assert len(out) == 7


class TestAnalysis:
    def test_noise_degradation_flagged(self, rng):
        clean_base = np.full((64, 64, 3), 120, np.uint8)
        noisy = [np.clip(clean_base + rng.normal(0, 30, clean_base.shape), 0, 255).astype(np.uint8)
                 for _ in range(12)]
        rep = ContentAnalyzer(sample_every=1).analyze(iter(noisy))
        assert DegradationType.NOISE in rep.degradations
        assert rep.quality_score < 90

    def test_bw_content_type(self, rng):
        frames = [_textured(rng) for _ in range(6)]
        rep = ContentAnalyzer(sample_every=1).analyze(iter(frames))
        assert rep.content_type == ContentType.BW_FILM

    def test_source_height_estimate_upscaled(self, rng):
        # bilinear-upscaled content lacks energy above source Nyquist
        import jax.numpy as jnp

        from framewright_tpu.models.layers import resize_bilinear

        small = _textured(rng, 24, 32, smooth=False).astype(np.float32)
        up = np.asarray(resize_bilinear(
            jnp.asarray(small[None]) / 255.0, (96, 128)))[0] * 255
        est = estimate_source_height(up.astype(np.uint8))
        assert est <= 48  # way below the 96 nominal
        native = _textured(rng, 96, 128, smooth=False)
        assert estimate_source_height(native) >= 80

    def test_recommendations(self, rng):
        clean_base = np.full((64, 64, 3), 120, np.uint8)
        noisy = [np.clip(clean_base + rng.normal(0, 30, clean_base.shape), 0, 255).astype(np.uint8)
                 for _ in range(12)]
        rep = ContentAnalyzer(sample_every=1).analyze(iter(noisy))
        rec = recommend_settings(rep)
        assert rec.get("denoise") is True

    def test_frame_quality_scorer_orders_frames(self, rng):
        from framewright_tpu.processors.analysis import FrameQualityScorer

        sharp = _textured(rng, smooth=False)
        blurry = np.full((48, 64, 3), 128, np.uint8)    # featureless
        noisy = np.clip(
            np.full((48, 64, 3), 128.0)
            + rng.normal(0, 60, (48, 64, 3)), 0, 255).astype(np.uint8)
        scorer = FrameQualityScorer()
        scores = scorer.analyze(iter([sharp, blurry, noisy]))
        assert len(scores) == 3
        assert all(0.0 <= s <= 100.0 for s in scores)
        assert scores[0] > scores[2]          # sharp beats noisy
        assert scorer.worst(1)[0][0] in (1, 2)
        summ = scorer.summary()
        assert summ["frames"] == 3 and summ["min"] <= summ["mean"]

    def test_credits_detection(self, rng):
        normal = [_textured(rng) for _ in range(10)]
        credit = np.zeros((48, 64, 3), np.uint8)
        credit[10:40, ::4] = 255  # text-like strokes on black
        credits = [credit] * 10
        segs = CreditsDetector().analyze(iter(normal + credits))
        assert len(segs) == 1
        assert segs[0][0] == 10


class TestYadif:
    def _stream(self, rng, n=8, shift=5):
        """Interlaced stream: fields sampled from a panning scene at
        2x frame rate (field t and t+0.5)."""
        tex = rng.random((48, 200)) * 255
        for _ in range(2):
            tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1)) / 3
        def grab(t):
            sh = int(t * shift) % 120
            return np.stack([tex[:, sh:sh + 64]] * 3, -1).astype(np.uint8)
        frames = [_interlace(grab(t), grab(t + 0.5)) for t in range(n)]
        clean = [grab(t) for t in range(n)]
        return frames, clean

    def test_removes_combing(self, rng):
        from framewright_tpu.processors.format import YadifDeinterlacer

        frames, _ = self._stream(rng)
        out = list(YadifDeinterlacer().process_stream(iter(frames)))
        assert len(out) == len(frames)
        before = np.mean([combing_score(f) for f in frames])
        after = np.mean([combing_score(f) for f in out])
        assert after < before * 0.7

    def test_static_scene_mostly_exact(self, rng):
        """No motion => temporal prediction dominates; only single-line
        vertical detail may deviate (yadif's spatial interlacing check
        intentionally admits the spatial pred there)."""
        from framewright_tpu.processors.format import YadifDeinterlacer

        frame = _textured(rng)
        frames = [frame.copy() for _ in range(5)]
        out = list(YadifDeinterlacer().process_stream(iter(frames)))
        err = np.abs(out[2].astype(np.float32) - frame.astype(np.float32))
        assert err.mean() < 3.0

    def test_beats_line_blend_on_moving_edges(self):
        """Edge-directed + motion-adaptive must trounce line-blend on
        moving diagonal structure (the case yadif exists for)."""
        from framewright_tpu.processors.format import YadifDeinterlacer

        h, w = 48, 64
        yy, xx = np.mgrid[0:h, 0:w]

        def scene(t):
            v = ((xx + yy + t * 4) % 16 < 8).astype(np.float32) * 200 + 20
            return np.stack([v] * 3, -1).astype(np.uint8)

        frames = [_interlace(scene(t), scene(t + 0.5)) for t in range(6)]
        clean = [scene(t) for t in range(6)]
        yad = list(YadifDeinterlacer().process_stream(iter(frames)))
        blend = [Deinterlacer(method="blend").deinterlace(f)
                 for f in frames]

        def err(outs):
            return np.mean([np.abs(o.astype(np.float32)
                                   - c.astype(np.float32)).mean()
                            for o, c in zip(outs, clean)])

        assert err(yad) < err(blend) * 0.3

    def test_bwdif_mode_runs(self, rng):
        from framewright_tpu.processors.format import YadifDeinterlacer

        frames, _ = self._stream(rng, n=4)
        out = list(YadifDeinterlacer(mode="bwdif").process_stream(
            iter(frames)))
        assert len(out) == 4
        assert out[0].dtype == np.uint8
