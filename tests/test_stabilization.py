"""Full-frame stabilization + restorer wiring of stabilize/long-form/
dedup-source-fps (reference processors/stabilization.py:537,
engine/temporal_consistency.py:993, README.md dedup headline)."""

import numpy as np
import pytest

from framewright_tpu.processors.stabilization import (
    StabilizeConfig,
    VideoStabilizer,
    estimate_motion,
    jitter_metric,
    phase_correlate,
    warp_frame,
)


def _textured(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(np.float32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
            + np.roll(base, (1, 1), (0, 1))) / 4
    return np.stack([base] * 3, -1).astype(np.uint8)


class TestMotionEstimation:
    def test_phase_correlation_recovers_shift(self):
        img = _textured(128, 160).astype(np.float32)[..., 0]
        shifted = np.roll(np.roll(img, 3, axis=0), -5, axis=1)
        dy, dx, q = phase_correlate(img, shifted)
        assert abs(dy - 3) < 0.3 and abs(dx + 5) < 0.3
        assert q > 0.1

    def test_estimate_motion_translation(self):
        f0 = _textured(128, 160)
        f1 = warp_frame(f0, 4.0, -2.0, 0.0, 1.0)
        a = f0.astype(np.float32) @ np.asarray([.299, .587, .114], np.float32)
        b = f1.astype(np.float32) @ np.asarray([.299, .587, .114], np.float32)
        dy, dx, theta, q = estimate_motion(a, b, rotation=True)
        # warp by (+4, -2) moves content by the same amount
        assert abs(dy - 4) < 0.5 and abs(dx + 2) < 0.5
        assert abs(theta) < 0.01

    def test_estimate_motion_rotation(self):
        f0 = _textured(160, 160)
        f1 = warp_frame(f0, 0.0, 0.0, 0.03, 1.0)
        a = f0.astype(np.float32) @ np.asarray([.299, .587, .114], np.float32)
        b = f1.astype(np.float32) @ np.asarray([.299, .587, .114], np.float32)
        _, _, theta, _ = estimate_motion(a, b, rotation=True)
        assert abs(theta - 0.03) < 0.015


class TestStabilizer:
    def _shaky_clip(self, n=40, seed=0):
        rng = np.random.default_rng(seed)
        base = _textured(120, 160, seed=1)
        frames, pos = [], np.zeros(2)
        for _ in range(n):
            pos = pos * 0.9 + rng.normal(0, 1.8, 2)
            frames.append(warp_frame(base, pos[0], pos[1], 0.0, 1.0))
        return frames

    def test_reduces_jitter(self):
        frames = self._shaky_clip()
        st = VideoStabilizer(StabilizeConfig(smoothing=10, crop_ratio=0.9))
        out = st.stabilize(frames)
        assert len(out) == len(frames)
        assert out[0].shape == frames[0].shape
        j0, j1 = jitter_metric(frames), jitter_metric(out)
        assert j1 < j0 * 0.5, (j0, j1)
        assert st.result.frames == len(frames)
        assert st.result.mean_correction_px > 0

    def test_static_clip_passthrough(self):
        base = _textured(64, 96)
        frames = [base.copy() for _ in range(8)]
        st = VideoStabilizer(StabilizeConfig(smoothing=3, crop_ratio=1.0))
        out = st.stabilize(frames)
        assert len(out) == 8
        # no motion -> no warp (crop 1.0): bit-identical passthrough
        assert all(np.array_equal(a, b) for a, b in zip(frames, out))


def _write_y4m(path, frames, fps=24):
    from framewright_tpu.io.y4m import Y4MWriter

    h, w = frames[0].shape[:2]
    with Y4MWriter(path, w, h, fps=fps) as wr:
        for f in frames:
            wr.write_frame(f)


def _read_y4m(path):
    from framewright_tpu.io.y4m import Y4MReader

    with Y4MReader(path) as r:
        return [f.copy() for f in r], r.header.fps


@pytest.fixture(autouse=True)
def _weights_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))


class TestRestorerWiring:
    def _cfg(self, tmp_path, **kw):
        from framewright_tpu.config import Config

        base = dict(project_dir=tmp_path / "proj", scale_factor=1,
                    validate_output=False, checkpoint_enabled=False,
                    deduplicate=False, long_form="off",
                    device_platform="cpu")
        base.update(kw)
        return Config(**base)

    def test_stabilize_flag_reduces_jitter_e2e(self, tmp_path):
        from framewright_tpu.restorer import VideoRestorer

        rng = np.random.default_rng(0)
        base = _textured(96, 128, seed=2)
        frames, pos = [], np.zeros(2)
        for _ in range(30):
            pos = pos * 0.9 + rng.normal(0, 2.0, 2)
            frames.append(warp_frame(base, pos[0], pos[1], 0.0, 1.0))
        src = tmp_path / "shaky.y4m"
        _write_y4m(src, frames)
        out = tmp_path / "stable.y4m"
        cfg = self._cfg(tmp_path, stabilize=True, stabilize_smoothing=8,
                        stabilize_crop=0.9)
        VideoRestorer(cfg).restore_video(src, out)
        stabilized, _ = _read_y4m(out)
        assert len(stabilized) == len(frames)
        j0 = jitter_metric(frames)
        j1 = jitter_metric(stabilized)
        assert j1 < j0 * 0.6, (j0, j1)

    def test_long_form_reduces_flicker_e2e(self, tmp_path):
        from framewright_tpu.restorer import VideoRestorer

        base = _textured(48, 64, seed=3).astype(np.float32)
        frames = []
        for t in range(90):
            flick = 25.0 * np.sin(t * 2.2)       # fast brightness flicker
            frames.append(np.clip(base + flick, 0, 255).astype(np.uint8))
        src = tmp_path / "flick.y4m"
        _write_y4m(src, frames)
        out = tmp_path / "even.y4m"
        cfg = self._cfg(tmp_path, long_form="on", anchor_interval=30,
                        long_form_strength=1.0)
        VideoRestorer(cfg).restore_video(src, out)
        fixed, _ = _read_y4m(out)
        assert len(fixed) == len(frames)
        b_in = np.asarray([f.mean() for f in frames])
        b_out = np.asarray([f.mean() for f in fixed])
        assert b_out.std() < b_in.std() * 0.5, (b_in.std(), b_out.std())

    def test_long_form_auto_threshold(self, tmp_path):
        from framewright_tpu.restorer import VideoRestorer

        cfg = self._cfg(tmp_path, long_form="auto", long_form_threshold=100)
        r = VideoRestorer(cfg)
        assert not r._longform_active(99)
        assert r._longform_active(100)
        cfg2 = self._cfg(tmp_path, long_form="on")
        assert VideoRestorer(cfg2)._longform_active(1)

    def test_dedup_interpolates_from_source_fps(self, tmp_path):
        """18fps-content-duped-to-24 analog: 6 unique frames each held
        4x at 24 fps -> dedup estimates 6 fps; interpolation targets 12
        -> output at 12 fps from UNIQUE frames (not the duped 24)."""
        from framewright_tpu.io import probe
        from framewright_tpu.restorer import VideoRestorer

        rng = np.random.default_rng(1)
        tex = rng.integers(0, 256, (48, 64 + 48), dtype=np.uint8)
        uniques = [np.stack([tex[:, 8 * t:8 * t + 64]] * 3, -1)
                   for t in range(6)]
        frames = [uniques[t // 4] for t in range(24)]   # 4x duplication
        src = tmp_path / "duped.y4m"
        _write_y4m(src, frames, fps=24)
        out = tmp_path / "smooth.y4m"
        cfg = self._cfg(tmp_path, deduplicate=True, interpolation=True,
                        target_fps=12.0, compute_dtype="float32")
        res = VideoRestorer(cfg).restore_video(src, out)
        assert res.dedup is not None
        assert res.dedup.unique_frames == 6
        assert abs(res.dedup.estimated_source_fps - 6.0) < 0.01
        meta = probe(out)
        # interpolation factor from the ESTIMATED 6 fps: 2x -> 12 fps
        assert abs(meta.fps - 12.0) < 0.01
        # frame count doubles the unique count (minus boundary), NOT the
        # duplicated 24-frame count
        assert 10 <= meta.nb_frames <= 12
