"""Preview server: segment cache, render queue, e2e segment render
(reference _ui_pkg/preview/server.py:201-755)."""

import time
from pathlib import Path

import numpy as np
import pytest

from framewright_tpu.preview import (
    PreviewServer,
    RenderQueue,
    RenderTask,
    SegmentCache,
)


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def _write_clip(path: Path, frames: int = 12, size: int = 32) -> Path:
    from framewright_tpu.io.y4m import Y4MWriter

    rng = np.random.default_rng(0)
    with Y4MWriter(path, size, size, fps=12) as w:
        for _ in range(frames):
            w.write_frame(rng.integers(0, 256, (size, size, 3),
                                       dtype=np.uint8))
    return path


class TestSegmentCache:
    def test_put_get_roundtrip(self, tmp_path):
        cache = SegmentCache(tmp_path / "c", max_size_mb=10)
        src = tmp_path / "a.y4m"
        src.write_bytes(b"data")
        stored = cache.put_file(0, 10, "abc", src)
        assert cache.get(0, 10, "abc") == stored
        assert cache.get(0, 10, "other") is None
        assert len(cache) == 1

    def test_eviction_lru(self, tmp_path):
        cache = SegmentCache(tmp_path / "c", max_size_mb=0)  # zero budget
        a = tmp_path / "a.y4m"
        a.write_bytes(b"x" * 1024)
        cache.put_file(0, 10, "a", a)
        b = tmp_path / "b.y4m"
        b.write_bytes(b"x" * 1024)
        cache.put_file(0, 10, "b", b)   # evicts "a"
        assert cache.get(0, 10, "a") is None

    def test_survives_reload(self, tmp_path):
        cache = SegmentCache(tmp_path / "c", max_size_mb=10)
        src = tmp_path / "a.y4m"
        src.write_bytes(b"data")
        cache.put_file(3, 7, "h", src)
        again = SegmentCache(tmp_path / "c", max_size_mb=10)
        assert again.get(3, 7, "h") is not None


class TestRenderQueue:
    def _make(self, tmp_path, render_fn):
        cache = SegmentCache(tmp_path / "c", max_size_mb=10)
        q = RenderQueue(render_fn, cache)
        q.start()
        return q

    def test_renders_and_caches(self, tmp_path):
        def render(task: RenderTask) -> Path:
            out = tmp_path / f"r_{task.task_id}.y4m"
            out.write_bytes(b"rendered")
            return out

        q = self._make(tmp_path, render)
        task = q.submit(0, 10, "cfg1")
        for _ in range(100):
            if task.status == "done":
                break
            time.sleep(0.05)
        assert task.status == "done"
        assert task.output is not None and task.output.exists()
        # second submit of the same key hits the cache instantly
        t2 = q.submit(0, 10, "cfg1")
        assert t2.status == "done"
        q.stop()

    def test_failure_reported(self, tmp_path):
        def render(task):
            raise RuntimeError("boom")

        q = self._make(tmp_path, render)
        task = q.submit(0, 10, "cfg2")
        for _ in range(100):
            if task.status == "failed":
                break
            time.sleep(0.05)
        assert task.status == "failed"
        assert "boom" in task.error
        q.stop()

    def test_cancel_queued(self, tmp_path):
        started = []

        def render(task):
            started.append(task.task_id)
            time.sleep(0.3)
            out = tmp_path / f"{task.task_id}.y4m"
            out.write_bytes(b"r")
            return out

        q = self._make(tmp_path, render)
        first = q.submit(0, 10, "one")
        victim = q.submit(0, 10, "two")
        assert q.cancel(victim.task_id)
        for _ in range(100):
            if first.status == "done":
                break
            time.sleep(0.05)
        time.sleep(0.2)
        assert victim.task_id not in started
        q.stop()

    def test_progress_callbacks(self, tmp_path):
        events = []

        def render(task):
            out = tmp_path / f"{task.task_id}.y4m"
            out.write_bytes(b"r")
            return out

        q = self._make(tmp_path, render)
        q.on_progress(lambda t: events.append(t.status))
        task = q.submit(0, 5, "cb")
        for _ in range(100):
            if task.status == "done":
                break
            time.sleep(0.05)
        q.stop()
        assert "rendering" in events and "done" in events


@pytest.mark.slow
class TestPreviewServerE2E:
    def test_segment_preview_through_pipeline(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
        from framewright_tpu.config import Config
        from framewright_tpu.io.y4m import Y4MReader

        clip = _write_clip(tmp_path / "clip.y4m")
        ps = PreviewServer(clip, tmp_path / "pv")
        ps.start()
        cfg = Config(project_dir=tmp_path / "p", scale_factor=4,
                     sr_model="realesr-animevideov3",
                     compute_dtype="float32", device_platform="cpu",
                     validate_output=False)
        task = ps.render_segment(2, 4, cfg)
        for _ in range(600):
            if task.status in ("done", "failed"):
                break
            time.sleep(0.5)
        assert task.status == "done", task.error
        with Y4MReader(task.output) as r:
            assert r.width == 128 and r.height == 128
            assert r.count_frames() == 4
        # same segment+config again: served from cache
        t2 = ps.render_segment(2, 4, cfg)
        assert t2.status == "done"
        assert ps.status()["cached_segments"] >= 1
        ps.stop()
