"""Pipeline engine + checkpoint manager tests."""

import time

import pytest

from framewright_tpu.engine.checkpoint import CheckpointManager, video_content_hash
from framewright_tpu.engine.pipeline import (
    Pipeline,
    PipelineBuilder,
    PipelineContext,
    Stage,
    StageStatus,
)
from framewright_tpu.errors import CancelledError, StageError, TransientError
from framewright_tpu.events import EventBus, EventType


class TestDag:
    def test_topo_order_respects_deps(self):
        order = []
        p = (
            PipelineBuilder()
            .stage("c", lambda d: order.append("c"), depends_on=("b",))
            .stage("a", lambda d: order.append("a"))
            .stage("b", lambda d: order.append("b"), depends_on=("a",))
            .build()
        )
        p.run()
        assert order == ["a", "b", "c"]

    def test_cycle_detection(self):
        with pytest.raises(StageError, match="cycle"):
            Pipeline([
                Stage("a", lambda d: None, depends_on=("b",)),
                Stage("b", lambda d: None, depends_on=("a",)),
            ])

    def test_unknown_dep(self):
        with pytest.raises(StageError, match="unknown"):
            Pipeline([Stage("a", lambda d: None, depends_on=("zz",))])

    def test_duplicate_names(self):
        with pytest.raises(StageError, match="duplicate"):
            Pipeline([Stage("a", lambda d: None), Stage("a", lambda d: None)])

    def test_context_flows_between_stages(self):
        p = (
            PipelineBuilder()
            .stage("a", lambda d: {"x": 1})
            .stage("b", lambda d: {"y": d["x"] + 1}, depends_on=("a",))
            .build()
        )
        ctx = p.run()
        assert ctx.get("y") == 2

    def test_disabled_stage_skipped(self):
        ran = []
        p = (
            PipelineBuilder()
            .stage("a", lambda d: ran.append("a"), enabled=False)
            .stage("b", lambda d: ran.append("b"))
            .build()
        )
        p.run()
        assert ran == ["b"]
        assert p.stages[0].status is StageStatus.SKIPPED

    def test_dependent_of_failed_noncritical_skipped(self):
        def boom(d):
            raise ValueError("x")

        ran = []
        p = (
            PipelineBuilder()
            .stage("a", boom, critical=False)
            .stage("b", lambda d: ran.append("b"), depends_on=("a",))
            .stage("c", lambda d: ran.append("c"))
            .build()
        )
        p.run()
        assert ran == ["c"]
        assert p.stages[1].status is StageStatus.SKIPPED

    def test_critical_failure_raises(self):
        def boom(d):
            raise ValueError("x")

        p = PipelineBuilder().stage("a", boom).build()
        with pytest.raises(StageError):
            p.run()

    def test_transient_retry_succeeds(self):
        calls = {"n": 0}

        def flaky(d):
            calls["n"] += 1
            if calls["n"] < 2:
                raise TransientError("again")
            return {"ok": True}

        p = PipelineBuilder().stage("a", flaky, max_retries=2, retry_delay=0).build()
        ctx = p.run()
        assert ctx.get("ok") and calls["n"] == 2

    def test_timeout(self):
        p = PipelineBuilder().stage(
            "slow", lambda d: time.sleep(2), timeout_s=0.2
        ).build()
        with pytest.raises(StageError, match="timed out"):
            p.run()

    def test_cancel(self):
        ctx = PipelineContext()

        def first(d):
            ctx.cancel()

        ran = []
        p = (
            PipelineBuilder()
            .stage("a", first)
            .stage("b", lambda d: ran.append("b"), depends_on=("a",))
            .build()
        )
        with pytest.raises(CancelledError):
            p.run(ctx)
        assert ran == []

    def test_events_emitted(self):
        bus = EventBus()
        p = PipelineBuilder().events(bus).stage("a", lambda d: None).build()
        p.run()
        types = [e.type for e in bus.history()]
        assert EventType.JOB_STARTED in types
        assert EventType.STAGE_COMPLETED in types
        assert EventType.JOB_COMPLETED in types

    def test_restore_completed_skips(self):
        ran = []
        p = (
            PipelineBuilder()
            .stage("a", lambda d: ran.append("a"))
            .stage("b", lambda d: ran.append("b"), depends_on=("a",))
            .restore_completed(["a"])
            .build()
        )
        p.run()
        assert ran == ["b"]
        assert p.stages[0].status is StageStatus.COMPLETED


class TestCheckpointManager:
    def _video(self, tmp_path, content=b"x" * 1000):
        v = tmp_path / "v.y4m"
        v.write_bytes(content)
        return v

    def test_content_hash_stable(self, tmp_path):
        v = self._video(tmp_path)
        assert video_content_hash(v) == video_content_hash(v)

    def test_fresh_start_and_resume(self, tmp_path):
        v = self._video(tmp_path)
        cm = CheckpointManager(tmp_path / "ck", interval=2)
        ck = cm.start(v, "confighash", total_frames=100)
        assert ck.frames_done == {}
        cm.frames_completed("enhance", 10)
        cm.frames_completed("enhance", 20)  # hits interval -> save
        cm2 = CheckpointManager(tmp_path / "ck", interval=2)
        ck2 = cm2.start(v, "confighash")
        assert ck2.frames_done["enhance"] == 20
        assert cm2.resume_point("enhance") == 20

    def test_config_change_invalidates(self, tmp_path):
        v = self._video(tmp_path)
        cm = CheckpointManager(tmp_path / "ck")
        cm.start(v, "hash1", 10)
        cm.frames_completed("enhance", 5)
        cm.save()
        cm2 = CheckpointManager(tmp_path / "ck")
        ck = cm2.start(v, "hash2")
        assert ck.frames_done == {}

    def test_stage_lifecycle_and_complete(self, tmp_path):
        v = self._video(tmp_path)
        cm = CheckpointManager(tmp_path / "ck")
        cm.start(v, "h", 10)
        cm.stage_started("enhance")
        cm.stage_completed("enhance")
        assert cm.is_stage_complete("enhance")
        cm.complete()
        cm2 = CheckpointManager(tmp_path / "ck")
        assert cm2.start(v, "h").completed_stages == []

    def test_corrupt_checkpoint_recovers(self, tmp_path):
        v = self._video(tmp_path)
        cm = CheckpointManager(tmp_path / "ck")
        ck = cm.start(v, "h")
        cm.save()
        path = tmp_path / "ck" / f"ckpt_{ck.video_hash}.json"
        path.write_text("{corrupt")
        cm2 = CheckpointManager(tmp_path / "ck")
        ck2 = cm2.start(v, "h")
        assert ck2.frames_done == {}
