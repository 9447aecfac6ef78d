"""End-to-end VideoRestorer tests (tiny model, CPU, y4m in/out).

The analog of the reference's integration tests
(tests/integration/test_full_pipeline.py): real orchestration over a
real clip, with the model seam replaced by a tiny random-weight net.
"""

import numpy as np
import pytest

from framewright_tpu.config import Config
from framewright_tpu.events import EventBus, EventType
from framewright_tpu.io.y4m import Y4MReader, Y4MWriter
from framewright_tpu.restorer import VideoRestorer


def _make_cfg(tmp_path, **kw):
    kw.setdefault("sr_model", "realesr-animevideov3")
    kw.setdefault("compute_dtype", "float32")
    kw.setdefault("validate_output", False)
    kw.setdefault("checkpoint_interval", 4)
    return Config(project_dir=tmp_path / "proj", **kw)


@pytest.fixture(autouse=True)
def _weights_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "weights"))


class TestRestoreEndToEnd:
    def test_y4m_to_y4m_upscale(self, tmp_path, tiny_y4m):
        cfg = _make_cfg(tmp_path)
        out = tmp_path / "out.y4m"
        result = VideoRestorer(cfg).restore_video(tiny_y4m, output=out)
        assert out.exists()
        assert result.frames_out == 16
        with Y4MReader(out) as r:
            assert (r.width, r.height) == (64 * 4, 48 * 4)
            assert r.count_frames() == 16

    def test_progress_and_events(self, tmp_path, tiny_y4m):
        cfg = _make_cfg(tmp_path)
        seen = []
        bus = EventBus()
        bus.subscribe(lambda e: seen.append(e.type), EventType.FRAME_PROCESSED)
        progress = []
        restorer = VideoRestorer(cfg, progress_callback=progress.append, events=bus)
        restorer.restore_video(tiny_y4m, output=tmp_path / "o.y4m")
        assert seen  # frame events emitted
        assert progress[-1].frames_done == 16
        assert progress[-1].stage == "enhance"

    def test_scale_1_passthrough(self, tmp_path, tiny_y4m, tiny_clip):
        cfg = _make_cfg(tmp_path, scale_factor=1, sr_model="none")
        out = tmp_path / "o.y4m"
        result = VideoRestorer(cfg).restore_video(tiny_y4m, output=out)
        assert result.frames_out == 16
        with Y4MReader(out) as r:
            frames = list(r)
        # passthrough: one lossy 420 round-trip away from input
        err = np.abs(frames[3].astype(int) - tiny_clip[3].astype(int)).mean()
        assert err < 15

    def test_dedup_pipeline(self, tmp_path, gradient_frame):
        # clip with every 2nd frame duplicated
        src = tmp_path / "dup.y4m"
        with Y4MWriter(src, 64, 48, fps=24) as w:
            for t in range(12):
                w.write_frame(gradient_frame(48, 64, t // 2))
        cfg = _make_cfg(tmp_path, deduplicate=True)
        result = VideoRestorer(cfg).restore_video(src, output=tmp_path / "o.y4m")
        assert result.dedup is not None
        assert result.dedup.unique_frames == 6
        assert result.frames_out == 12  # reconstructed to original count
        with Y4MReader(tmp_path / "o.y4m") as r:
            frames = list(r)
        # duplicated outputs are bit-identical pairs
        np.testing.assert_array_equal(frames[0], frames[1])
        np.testing.assert_array_equal(frames[10], frames[11])

    def test_validation_report(self, tmp_path, tiny_y4m):
        cfg = _make_cfg(tmp_path, validate_output=True, min_psnr=5.0, min_ssim=0.0)
        result = VideoRestorer(cfg).restore_video(tiny_y4m, output=tmp_path / "o.y4m")
        assert result.quality is not None
        assert result.quality.samples > 0

    def test_dry_run(self, tmp_path, tiny_y4m):
        cfg = _make_cfg(tmp_path, dry_run=True)
        out = tmp_path / "o.y4m"
        result = VideoRestorer(cfg).restore_video(tiny_y4m, output=out)
        assert not out.exists()
        assert "dry_run" in result.stage_summary

    def test_missing_source(self, tmp_path):
        from framewright_tpu.errors import InputError

        cfg = _make_cfg(tmp_path)
        with pytest.raises(InputError):
            VideoRestorer(cfg).restore_video(tmp_path / "nope.y4m")


class TestCheckpointResume:
    def test_resume_skips_done_frames(self, tmp_path, tiny_y4m, monkeypatch):
        cfg = _make_cfg(tmp_path, checkpoint_interval=2)
        out = tmp_path / "o.y4m"

        # first run: cancel after ~8 frames by failing the writer
        # (both write paths — the SR fast path emits YUV planes)
        calls = {"n": 0}
        restorer = VideoRestorer(cfg)
        orig = Y4MWriter.write_frame
        orig_yuv = Y4MWriter.write_yuv_frame

        def flaky(self, frame):
            calls["n"] += 1
            if calls["n"] > 8:
                raise IOError("disk gone")
            return orig(self, frame)

        def flaky_yuv(self, y, u, v):
            calls["n"] += 1
            if calls["n"] > 8:
                raise IOError("disk gone")
            return orig_yuv(self, y, u, v)

        monkeypatch.setattr(Y4MWriter, "write_frame", flaky)
        monkeypatch.setattr(Y4MWriter, "write_yuv_frame", flaky_yuv)
        with pytest.raises(Exception):
            restorer.restore_video(tiny_y4m, output=out)
        monkeypatch.setattr(Y4MWriter, "write_frame", orig)
        monkeypatch.setattr(Y4MWriter, "write_yuv_frame", orig_yuv)

        # checkpoint recorded progress
        cm = restorer.checkpoints
        done = cm.resume_point("enhance")
        assert done >= 2

        # second run resumes and completes
        restorer2 = VideoRestorer(_make_cfg(tmp_path, checkpoint_interval=2))
        result = restorer2.restore_video(tiny_y4m, output=out)
        assert result.frames_out == 16
        with Y4MReader(out) as r:
            assert r.count_frames() == 16

    def test_checkpoint_removed_on_success(self, tmp_path, tiny_y4m):
        cfg = _make_cfg(tmp_path)
        restorer = VideoRestorer(cfg)
        restorer.restore_video(tiny_y4m, output=tmp_path / "o.y4m")
        ckpts = list((cfg.checkpoint_dir).glob("ckpt_*.json")) \
            if cfg.checkpoint_dir.exists() else []
        assert ckpts == []


class TestInterpolationStage:
    def test_enhance_then_interpolate(self, tmp_path, gradient_frame):
        src = tmp_path / "clip.y4m"
        with Y4MWriter(src, 64, 48, fps=12) as w:
            for t in range(6):
                w.write_frame(gradient_frame(48, 64, t))
        cfg = _make_cfg(
            tmp_path, interpolation=True, target_fps=24.0,
            scale_factor=1, sr_model="none",
        )
        out = tmp_path / "o.y4m"
        result = VideoRestorer(cfg).restore_video(src, output=out)
        # 6 frames at 12fps -> factor 2 -> 11 frames at 24fps
        assert result.frames_out == 11
        with Y4MReader(out) as r:
            assert r.fps == 24.0
            assert r.count_frames() == 11
        # intermediate cleaned up
        assert not (cfg.work_dir / "enhanced.y4m").exists()


class TestDenoiseStage:
    def test_denoise_in_pipeline(self, tmp_path, gradient_frame):
        src = tmp_path / "clip.y4m"
        with Y4MWriter(src, 64, 48, fps=12) as w:
            for t in range(8):
                w.write_frame(gradient_frame(48, 64, t))
        cfg = _make_cfg(tmp_path, denoise=True, denoise_model="temporal",
                        temporal_window=3, scale_factor=1, sr_model="none",
                        temporal_consistency=True)
        result = VideoRestorer(cfg).restore_video(src, output=tmp_path / "o.y4m")
        assert result.frames_out == 8
        with Y4MReader(tmp_path / "o.y4m") as r:
            assert r.count_frames() == 8


class TestFullRecipeStages:
    def test_all_stages_on(self, tmp_path, gradient_frame):
        # the "everything enabled" pipeline must run end to end
        src = tmp_path / "clip.y4m"
        with Y4MWriter(src, 64, 48, fps=12) as w:
            for t in range(10):
                w.write_frame(gradient_frame(48, 64, t))
        cfg = _make_cfg(
            tmp_path, scale_factor=1, sr_model="none",
            deinterlace="yadif", defect_repair=True,
            watermark_removal=True, inpaint_model="lama",
            colorize=True, denoise=True, denoise_model="temporal",
            temporal_window=3, face_restore=True,
            temporal_consistency=True, deduplicate=True,
        )
        result = VideoRestorer(cfg).restore_video(src, output=tmp_path / "o.y4m")
        assert result.frames_out == 10
        with Y4MReader(tmp_path / "o.y4m") as r:
            assert r.count_frames() == 10


class TestDeviceStatsValidation:
    def test_validation_composes_with_yuv_fast_path(self, tmp_path, tiny_y4m):
        """With validate_output on, the quality stats ride INSIDE the SR
        jit (SRConfig.device_stats) so the YUV420 device-CSC fast path
        stays enabled and per-frame scores still reach the report."""
        cfg = _make_cfg(tmp_path, validate_output=True, long_form="off")
        out = tmp_path / "out.y4m"
        result = VideoRestorer(cfg).restore_video(tiny_y4m, output=out)
        assert result.quality is not None
        # every frame scored on device (not the 1-in-25 host sampling)
        assert result.quality.samples == 16
        assert result.quality.psnr > 0 and 0 < result.quality.ssim <= 1
        with Y4MReader(out) as r:
            assert r.count_frames() == 16
