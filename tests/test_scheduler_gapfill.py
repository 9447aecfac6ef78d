"""Priority scheduler + gap filler tests."""

import threading
import time

import numpy as np
import pytest

from framewright_tpu.engine.scheduler import JobScheduler
from framewright_tpu.persistence import JobStore
from framewright_tpu.processors.frame_generation import GapFiller


class TestScheduler:
    def _sched(self, tmp_path, fn):
        store = JobStore(tmp_path / "jobs.db")
        return JobScheduler(store, process_fn=fn)

    def test_priority_order(self, tmp_path):
        done = []
        gate = threading.Event()

        def proc(job):
            gate.wait(5)
            done.append(job.source)

        s = self._sched(tmp_path, proc)
        s.submit("low.y4m", priority=10)
        s.submit("high.y4m", priority=90)
        s.submit("mid.y4m", priority=50)
        s.start()
        gate.set()
        assert s.wait_idle(10)
        s.stop()
        # first job grabbed may be any (race with submit), but among the
        # remaining two, higher priority runs first
        assert done.index("high.y4m") < done.index("low.y4m")
        assert s.stats["completed"] == 3

    def test_retry_then_fail(self, tmp_path):
        calls = {"n": 0}

        def flaky(job):
            calls["n"] += 1
            raise RuntimeError("nope")

        s = self._sched(tmp_path, flaky)
        s.max_retries = 1
        jid = s.submit("a.y4m")
        s.start()
        deadline = time.time() + 10
        while time.time() < deadline:
            if s.store.get_job(jid).state == "failed":
                break
            time.sleep(0.05)
        s.stop()
        assert calls["n"] == 2           # original + 1 retry
        assert s.stats["failed"] == 1
        assert s.store.get_job(jid).state == "failed"

    def test_cancel_before_run(self, tmp_path):
        ran = []
        s = self._sched(tmp_path, lambda j: ran.append(j.source))
        jid = s.submit("a.y4m")
        s.cancel(jid)
        s.start()
        time.sleep(0.3)
        s.stop()
        assert ran == []
        assert s.store.get_job(jid).state == "cancelled"

    def test_pause_resume(self, tmp_path):
        done = []
        s = self._sched(tmp_path, lambda j: done.append(1))
        s.pause()
        s.submit("a.y4m")
        s.start()
        time.sleep(0.3)
        assert done == []
        s.resume()
        assert s.wait_idle(10)
        s.stop()
        assert done == [1]


class TestGapFiller:
    @staticmethod
    def _smooth_base(rng):
        base = rng.random((48, 128)) * 255
        for _ in range(20):  # heavy smoothing: shifts change frames gradually
            base = (base + np.roll(base, 1, 1) + np.roll(base, -1, 1)
                    + np.roll(base, 1, 0) + np.roll(base, -1, 0)) / 5
        base = (base - base.min()) / (np.ptp(base) + 1e-6) * 255
        return base

    def _smooth_clip_with_drop(self, rng, n=12, drop=6):
        base = self._smooth_base(rng)
        frames = []
        for t in range(n):
            if t == drop:
                continue  # dropped frame
            sh = t * 2
            f = np.stack([np.roll(base, sh, axis=1)] * 3, -1).astype(np.uint8)
            frames.append(f)
        return frames

    def test_detects_and_fills_gap(self, rng):
        frames = self._smooth_clip_with_drop(rng)
        gf = GapFiller(jump_ratio=1.5)
        out = list(gf.process_stream(iter(frames)))
        assert gf.report.frames_inserted == 1
        assert len(out) == len(frames) + 1

    def test_no_gaps_no_insert(self, rng):
        base = self._smooth_base(rng)
        frames = [np.stack([np.roll(base, t * 2, axis=1)] * 3, -1).astype(np.uint8)
                  for t in range(10)]
        gf = GapFiller()
        out = list(gf.process_stream(iter(frames)))
        assert gf.report.frames_inserted == 0
        assert len(out) == 10

    def test_scene_cut_not_filled(self, rng):
        a = [np.full((48, 64, 3), 30, np.uint8)] * 5
        b = [np.full((48, 64, 3), 220, np.uint8)] * 5
        gf = GapFiller()
        out = list(gf.process_stream(iter(a + b)))
        assert gf.report.frames_inserted == 0
        assert len(out) == 10


class TestFrameExtender:
    """Constant-velocity extension (reference FrameExtender analog,
    processors/restoration/frame_generator.py:880)."""

    class _StubEstimator:
        """Known constant flow; reuses the real warp."""

        def __init__(self, dx, dy, h, w):
            self.flow = np.full((h, w, 2), (dx, dy), np.float32)

        def estimate(self, a, b, with_confidence=True):
            from framewright_tpu.processors.flow import FlowField

            mag = np.hypot(self.flow[..., 0], self.flow[..., 1])
            return FlowField(self.flow, mag,
                             np.ones(mag.shape, np.float32))

        @staticmethod
        def warp_frame(frame, flow):
            from framewright_tpu.processors.flow import FlowEstimator

            return FlowEstimator.warp_frame(frame, flow)

    @staticmethod
    def _clip(rng, n, shift):
        h, w = 40, 56
        tex = rng.integers(0, 256, (h, w + n * shift + 24), np.uint8)
        return [np.stack([tex[:, t * shift:t * shift + w]] * 3, -1)
                for t in range(n)], tex, h, w

    def test_extend_forward_tracks_motion(self):
        rng = np.random.default_rng(3)
        shift = 2
        frames, tex, h, w = self._clip(rng, 4, shift)
        # content at x in frame t is at x - shift in frame t+1's crop
        # window => flow(anchor -> prev) = (+shift, 0)
        from framewright_tpu.processors.frame_generation import \
            FrameExtender

        ext = FrameExtender(
            estimator=self._StubEstimator(shift, 0, h, w), damping=1.0)
        out = ext.extend_forward(frames, 3)
        assert len(out) == 3
        for k, f in enumerate(out, start=1):
            want = np.stack(
                [tex[:, (3 + k) * shift:(3 + k) * shift + w]] * 3, -1)
            # interior only: the right edge is border-extended
            err = np.abs(f[:, : w - (k + 1) * shift].astype(np.float32)
                         - want[:, : w - (k + 1) * shift])
            assert err.mean() < 2.0, (k, err.mean())

    def test_extend_backward_symmetry(self):
        rng = np.random.default_rng(4)
        shift = 2
        frames, tex, h, w = self._clip(rng, 4, shift)
        from framewright_tpu.processors.frame_generation import \
            FrameExtender

        ext = FrameExtender(
            estimator=self._StubEstimator(-shift, 0, h, w), damping=1.0)
        out = ext.extend_backward(frames, 2)
        assert len(out) == 2
        # earliest first: out[0] is two steps before frames[0]
        for k, f in enumerate(out):
            steps = 2 - k
            want_x = -steps * shift
            if want_x < 0:
                # negative window: compare the overlapping interior
                want = np.stack([tex[:, 0:w + want_x]] * 3, -1)
                err = np.abs(
                    f[:, -want.shape[1]:].astype(np.float32) - want)
            else:
                want = np.stack([tex[:, want_x:want_x + w]] * 3, -1)
                err = np.abs(f.astype(np.float32) - want)
            assert err.mean() < 12.0, (k, err.mean())

    def test_short_input_holds(self):
        f = np.zeros((8, 8, 3), np.uint8)
        from framewright_tpu.processors.frame_generation import FrameExtender

        ext = FrameExtender(estimator=self._StubEstimator(0, 0, 8, 8))
        out = ext.extend_forward([f], 2)
        assert len(out) == 2 and (out[0] == f).all()
        assert ext.extend_backward([], 2) == []
