"""Streaming chunked restore tests."""

import numpy as np
import pytest

from framewright_tpu.config import Config
from framewright_tpu.io.y4m import Y4MReader, Y4MWriter
from framewright_tpu.streaming import StreamingRestorer


@pytest.fixture(autouse=True)
def _weights(tmp_path, monkeypatch):
    monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))


def _clip(tmp_path, gradient_frame, n=25):
    src = tmp_path / "long.y4m"
    with Y4MWriter(src, 64, 48, fps=12) as w:
        for t in range(n):
            w.write_frame(gradient_frame(48, 64, t))
    return src


class TestStreaming:
    def test_chunked_restore_concats(self, tmp_path, gradient_frame):
        src = _clip(tmp_path, gradient_frame)
        cfg = Config(project_dir=tmp_path / "proj", scale_factor=1,
                     sr_model="none", validate_output=False)
        ready = []
        sr = StreamingRestorer(cfg, on_chunk_ready=lambda i, p: ready.append(i),
                               chunk_frames=10)
        res = sr.restore_video_streaming(src, output=tmp_path / "out.y4m")
        assert res.chunks == 3
        assert ready == [0, 1, 2]
        assert res.frames_out == 25
        with Y4MReader(tmp_path / "out.y4m") as r:
            assert r.count_frames() == 25

    def test_resume_skips_done_segments(self, tmp_path, gradient_frame):
        src = _clip(tmp_path, gradient_frame)
        cfg = Config(project_dir=tmp_path / "proj", scale_factor=1,
                     sr_model="none", validate_output=False,
                     keep_intermediates=True)
        sr = StreamingRestorer(cfg, chunk_frames=10)
        res1 = sr.restore_video_streaming(src, output=tmp_path / "out.y4m")
        # second run: all segments exist -> callbacks skip processing
        done = []
        sr2 = StreamingRestorer(cfg, on_chunk_ready=lambda i, p: done.append(i),
                                chunk_frames=10)
        res2 = sr2.restore_video_streaming(src, output=tmp_path / "out2.y4m")
        assert done == []  # nothing re-processed
        assert res2.frames_out == 25
