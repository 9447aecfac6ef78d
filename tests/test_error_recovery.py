"""Error-path integration tests (analog of reference
tests/integration/test_error_recovery.py + corrupt_video fixtures)."""

import numpy as np
import pytest

from framewright_tpu.config import Config
from framewright_tpu.errors import InputError, MediaFormatError, StageError
from framewright_tpu.io.y4m import Y4MReader, Y4MWriter
from framewright_tpu.restorer import VideoRestorer


@pytest.fixture(autouse=True)
def _weights(tmp_path, monkeypatch):
    monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))


class TestCorruptInputs:
    def test_garbage_file(self, tmp_path):
        bad = tmp_path / "bad.y4m"
        bad.write_bytes(b"not a video at all")
        with pytest.raises(MediaFormatError):
            Y4MReader(bad)

    def test_truncated_stream(self, tmp_path, gradient_frame):
        src = tmp_path / "trunc.y4m"
        with Y4MWriter(src, 64, 48, fps=12) as w:
            for t in range(4):
                w.write_frame(gradient_frame(48, 64, t))
        data = src.read_bytes()
        src.write_bytes(data[: len(data) - 1000])  # cut mid-frame
        with Y4MReader(src) as r:
            with pytest.raises(MediaFormatError):
                for _ in r:
                    pass

    def test_restorer_surfaces_corrupt_video(self, tmp_path):
        bad = tmp_path / "bad.y4m"
        bad.write_bytes(b"YUV4MPEG2 garbage\n")
        cfg = Config(project_dir=tmp_path / "p", scale_factor=1, sr_model="none")
        with pytest.raises((StageError, MediaFormatError, InputError)):
            VideoRestorer(cfg).restore_video(bad, output=tmp_path / "o.y4m")

    def test_empty_video(self, tmp_path):
        src = tmp_path / "empty.y4m"
        src.write_bytes(b"YUV4MPEG2 W64 H48 F25:1 Ip A1:1 C420jpeg\n")
        cfg = Config(project_dir=tmp_path / "p", scale_factor=1, sr_model="none")
        with pytest.raises((StageError, InputError)):
            VideoRestorer(cfg).restore_video(src, output=tmp_path / "o.y4m")


class TestContinueOnError:
    def test_model_failure_falls_back_to_bicubic(self, tmp_path, gradient_frame,
                                                 monkeypatch):
        src = tmp_path / "clip.y4m"
        with Y4MWriter(src, 64, 48, fps=12) as w:
            for t in range(6):
                w.write_frame(gradient_frame(48, 64, t))
        cfg = Config(project_dir=tmp_path / "p", scale_factor=4,
                     sr_model="realesr-animevideov3", compute_dtype="float32",
                     continue_on_error=True, validate_output=False)
        from framewright_tpu.processors import super_resolution as srmod

        def boom(self, frames):
            raise RuntimeError("model exploded")

        # break the compiled fn: fallback should produce bicubic output
        restorer = VideoRestorer(cfg)

        def broken_dispatch(self, frames):
            # injected at dispatch level: survives internal recompiles
            # (e.g. the YUV fast-path recompile in the restorer)
            return {"y": None, "exc": RuntimeError("dead model"),
                    "x": frames, "n": len(frames)}

        monkeypatch.setattr(srmod.SuperResolution, "dispatch", broken_dispatch)
        result = restorer.restore_video(src, output=tmp_path / "o.y4m")
        assert result.frames_out == 6
        assert result.errors > 0   # recorded, not fatal
        with Y4MReader(tmp_path / "o.y4m") as r:
            assert (r.width, r.height) == (256, 192)  # still upscaled

    def test_strict_mode_raises(self, tmp_path, gradient_frame, monkeypatch):
        src = tmp_path / "clip.y4m"
        with Y4MWriter(src, 64, 48, fps=12) as w:
            for t in range(4):
                w.write_frame(gradient_frame(48, 64, t))
        cfg = Config(project_dir=tmp_path / "p", scale_factor=4,
                     sr_model="realesr-animevideov3", compute_dtype="float32",
                     continue_on_error=False, validate_output=False)
        from framewright_tpu.processors import super_resolution as srmod


        def broken_dispatch(self, frames):
            # injected at dispatch level: survives internal recompiles
            # (e.g. the YUV fast-path recompile in the restorer)
            return {"y": None, "exc": RuntimeError("dead model"),
                    "x": frames, "n": len(frames)}

        monkeypatch.setattr(srmod.SuperResolution, "dispatch", broken_dispatch)
        with pytest.raises(Exception):
            VideoRestorer(cfg).restore_video(src, output=tmp_path / "o.y4m")
