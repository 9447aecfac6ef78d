"""Periphery subsystems: profiler/benchmarks, job store, batch/watch,
caches, reports, export, recipes, plugins, security."""

import json
import time

import numpy as np
import pytest

from framewright_tpu.batch import (
    BatchQueueProcessor,
    BatchScheduler,
    ScheduledJob,
    WatchFolder,
)
from framewright_tpu.benchmarks import (
    BenchmarkRunner,
    PerformanceProfiler,
    TestVideoGenerator,
    standard_suite,
)
from framewright_tpu.cache import FrameCache, LRUCache, ModelCache
from framewright_tpu.config import Config
from framewright_tpu.errors import ConfigError, InputError
from framewright_tpu.export import (
    EXPORT_PRESETS,
    apply_export_preset,
    comparison_grid,
    comparison_html,
    get_export_preset,
    write_sidecar,
)
from framewright_tpu.persistence import JobStore
from framewright_tpu.plugins import PluginManager
from framewright_tpu.recipes import RECIPES, RecipeExecutor, get_recipe, recipe_config
from framewright_tpu.reports import QAReport, QualityTrends, build_qa_report
from framewright_tpu.security import (
    PathValidator,
    RateLimiter,
    sanitize_filename,
    validate_url,
)


class TestProfiler:
    def test_stage_accounting(self):
        prof = PerformanceProfiler()
        with prof.stage("decode", frames=10):
            time.sleep(0.02)
        with prof.stage("enhance", frames=10):
            time.sleep(0.05)
        with prof.stage("enhance", frames=10):
            time.sleep(0.01)
        rep = prof.report()
        assert rep["stages"][0]["name"] == "enhance"  # sorted by time
        assert rep["stages"][0]["calls"] == 2
        assert rep["total_s"] > 0.07

    def test_monitor_thread(self):
        prof = PerformanceProfiler(sample_interval=0.01)
        prof.start_monitor()
        # under load the monitor thread may be starved; wait for the
        # first sample instead of a fixed sleep (deflaked)
        for _ in range(100):
            time.sleep(0.05)
            if prof.report()["host_samples"] >= 1:
                break
        prof.stop_monitor()
        assert prof.report()["host_samples"] >= 1


class TestBenchmarks:
    def test_standard_suite_defs(self):
        names = [c.name for c in standard_suite()]
        assert names == ["720p_to_1080p", "1080p_to_4k", "24_to_60fps", "combined"]

    def test_tiny_suite_runs(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
        runner = BenchmarkRunner(tmp_path / "bench", iterations=1,
                                 compute_dtype="float32")
        results = runner.run_suite(standard_suite(tiny=True))
        assert len(results) == 2
        assert all(r.fps > 0 for r in results)
        runner.save_results(results, tmp_path / "results.json")
        saved = json.loads((tmp_path / "results.json").read_text())
        assert saved[0]["case"] == "sr_tiny"

    def test_video_generator(self, tmp_path):
        from framewright_tpu.io.y4m import Y4MReader

        p = TestVideoGenerator.generate(tmp_path / "t.y4m", 64, 48, 5)
        with Y4MReader(p) as r:
            assert r.count_frames() == 5


class TestJobStore:
    def test_crud_and_states(self, tmp_path):
        store = JobStore(tmp_path / "jobs.db")
        jid = store.create_job("a.y4m", "out.y4m", config={"scale_factor": 2},
                               total_frames=100)
        job = store.get_job(jid)
        assert job.state == "pending" and job.config["scale_factor"] == 2
        store.set_state(jid, "running")
        store.update_progress(jid, 42)
        assert store.get_job(jid).frames_done == 42
        store.set_state(jid, "completed")
        assert [j.job_id for j in store.list_jobs("completed")] == [jid]
        store.delete_job(jid)
        assert store.get_job(jid) is None

    def test_resumable_query(self, tmp_path):
        store = JobStore(tmp_path / "jobs.db")
        j1 = store.create_job("a.y4m")
        j2 = store.create_job("b.y4m")
        store.set_state(j1, "running")
        assert [j.job_id for j in store.resumable_jobs()] == [j1]

    def test_frame_ranges(self, tmp_path):
        store = JobStore(tmp_path / "jobs.db")
        jid = store.create_job("a.y4m")
        store.record_range(jid, "enhance", 0, 50)
        store.record_range(jid, "enhance", 50, 100)
        assert store.completed_ranges(jid, "enhance") == [(0, 50), (50, 100)]


class TestBatch:
    def test_queue_processes_jobs(self, tmp_path):
        store = JobStore(tmp_path / "jobs.db")
        processed = []
        q = BatchQueueProcessor(store, process_fn=lambda j: processed.append(j.source))
        q.submit("a.y4m")
        q.submit("b.y4m")
        assert q.run_until_empty() == 2
        assert processed == ["a.y4m", "b.y4m"]
        assert len(store.list_jobs("completed")) == 2

    def test_failed_job_marked(self, tmp_path):
        store = JobStore(tmp_path / "jobs.db")

        def boom(job):
            raise RuntimeError("nope")

        q = BatchQueueProcessor(store, process_fn=boom)
        q.submit("a.y4m")
        q.run_until_empty()
        jobs = store.list_jobs("failed")
        assert len(jobs) == 1 and "nope" in jobs[0].error

    def test_resume_crashed(self, tmp_path):
        store = JobStore(tmp_path / "jobs.db")
        q = BatchQueueProcessor(store, process_fn=lambda j: None)
        jid = q.submit("a.y4m")
        store.set_state(jid, "running")  # simulate crash
        assert q.resume_crashed() == 1
        assert store.get_job(jid).state == "pending"

    def test_watch_folder_stability_gate(self, tmp_path):
        store = JobStore(tmp_path / "jobs.db")
        q = BatchQueueProcessor(store, process_fn=lambda j: None)
        watch = tmp_path / "in"
        watch.mkdir()
        wf = WatchFolder(watch, q)
        (watch / "v.y4m").write_bytes(b"x" * 100)
        assert wf.scan_once() == []           # first sighting: unstable
        assert len(wf.scan_once()) == 1       # size unchanged: enqueue
        assert wf.scan_once() == []           # not re-enqueued

    def test_scheduler_window(self, tmp_path):
        store = JobStore(tmp_path / "jobs.db")
        q = BatchQueueProcessor(store, process_fn=lambda j: None)
        sched = BatchScheduler(q)
        sched.add(ScheduledJob("a.y4m", start_hour=0, end_hour=24))
        sched.add(ScheduledJob("b.y4m", start_hour=25, end_hour=26))  # never
        assert len(sched.tick()) == 1
        assert len(sched.scheduled) == 1


class TestCaches:
    def test_lru_eviction(self):
        c = LRUCache(max_bytes=3000, policy="lru")
        a = np.zeros(250, np.uint8)
        for i in range(20):
            c.put(i, a + i)
        assert len(c) <= 12
        assert c.get(19) is not None
        assert c.get(0) is None

    def test_lru_order_respected(self):
        c = LRUCache(max_bytes=700, policy="lru")
        a = np.zeros(300, np.uint8)
        c.put("x", a)
        c.put("y", a)
        c.get("x")          # refresh x
        c.put("z", a)       # evicts y
        assert c.get("x") is not None
        assert c.get("y") is None

    def test_ttl(self):
        c = LRUCache(max_bytes=10_000, ttl_s=0.01)
        c.put("k", np.zeros(10))
        assert c.get("k") is not None
        time.sleep(0.02)
        assert c.get("k") is None

    def test_frame_cache_get_or_compute(self, gradient_frame):
        fc = FrameCache(max_bytes=10 * 2**20)
        calls = {"n": 0}

        def fn(f):
            calls["n"] += 1
            return f * 2

        f = gradient_frame(16, 16, 0)
        fc.get_or_compute("sr", f, fn)
        fc.get_or_compute("sr", f, fn)
        assert calls["n"] == 1
        assert fc.hit_rate > 0

    def test_model_cache_pinning(self):
        mc = ModelCache(max_models=2)
        mc.get("a", lambda: "A")
        mc.pin("a")
        mc.get("b", lambda: "B")
        mc.get("c", lambda: "C")  # evicts b (a is pinned)
        assert "a" in mc and "c" in mc and "b" not in mc


class TestReportsExport:
    def test_qa_report_html_json(self, tmp_path):
        rep = QAReport(source="a.y4m", output="b.y4m",
                       stages=[{"name": "enhance", "status": "completed",
                                "duration_s": 1.5}],
                       quality={"psnr": 30.0, "ssim": 0.9, "passed": True,
                                "samples": 4})
        p1 = rep.save(tmp_path / "r.json")
        p2 = rep.save(tmp_path / "r.html")
        assert json.loads(p1.read_text())["quality"]["psnr"] == 30.0
        html = p2.read_text()
        assert "PASSED" in html and "enhance" in html

    def test_quality_trends(self, tmp_path):
        tr = QualityTrends(tmp_path / "trends.db")
        tr.record("a.y4m", 30.0, 0.9, 5.0, 100, True)
        tr.record("b.y4m", 20.0, 0.7, 4.0, 50, False)
        s = tr.summary()
        assert s["runs"] == 2 and s["pass_rate"] == 0.5
        assert len(tr.history()) == 2

    def test_export_presets(self):
        assert "youtube" in EXPORT_PRESETS
        p = get_export_preset("archive")
        assert p.crf <= 12
        with pytest.raises(ConfigError):
            get_export_preset("myspace")
        cfg = apply_export_preset(Config(), "web")
        assert cfg.codec == "libx264"

    def test_sidecar(self, tmp_path):
        from framewright_tpu.restorer import RestoreResult

        cfg = Config()
        res = RestoreResult(output_path=tmp_path / "o.y4m", frames_out=10,
                            duration_s=2.0)
        p = write_sidecar(res.output_path, cfg, res, "src.y4m")
        d = json.loads(p.read_text())
        assert d["frames_out"] == 10 and d["config_hash"] == cfg.get_hash()

    def test_comparison_grid_and_html(self, gradient_frame):
        b = [gradient_frame(24, 32, t) for t in range(3)]
        a = [gradient_frame(48, 64, t) for t in range(3)]
        grid = comparison_grid(b, a)
        assert grid.ndim == 3 and grid.shape[0] == 120
        html = comparison_html("b.png", "a.png")
        assert "slider" in html.lower() or "range" in html


class TestRecipes:
    def test_registry(self):
        assert "vhs_family_video" in RECIPES
        assert "silent_film_restoration" in RECIPES
        with pytest.raises(ConfigError):
            get_recipe("cold_fusion")

    def test_recipe_configs_valid(self):
        for name in RECIPES:
            cfg = recipe_config(name)
            assert isinstance(cfg, Config)

    def test_executor_with_prestages(self, tmp_path, gradient_frame, monkeypatch):
        monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
        from framewright_tpu.io.y4m import Y4MWriter
        from framewright_tpu.recipes import Recipe

        src = tmp_path / "src.y4m"
        with Y4MWriter(src, 64, 48, fps=12) as w:
            for t in range(6):
                w.write_frame(gradient_frame(48, 64, t))
        tiny = Recipe("test", "t", config_overrides=dict(
            scale_factor=1, sr_model="none", validate_output=False,
            project_dir=str(tmp_path / "proj")), pre_stages=("defects",))
        ex = RecipeExecutor(tiny, tmp_path / "proj")
        res = ex.execute(src, output=tmp_path / "out.y4m")
        assert res.frames_out == 6


class TestPlugins:
    def test_load_and_fire(self, tmp_path):
        (tmp_path / "hello.py").write_text(
            "from framewright_tpu.events import HookPoint\n"
            "def register(hooks):\n"
            "    hooks.register(HookPoint.PRE_PIPELINE,"
            " lambda ctx: ctx.update(plugin_ran=True))\n"
        )
        pm = PluginManager(tmp_path)
        assert pm.load_all() == 1
        from framewright_tpu.events import HookPoint

        ctx = pm.hooks.fire(HookPoint.PRE_PIPELINE, {})
        assert ctx["plugin_ran"] is True

    def test_broken_plugin_isolated(self, tmp_path):
        (tmp_path / "bad.py").write_text("raise RuntimeError('boom')\n")
        (tmp_path / "good.py").write_text("def register(hooks):\n    pass\n")
        pm = PluginManager(tmp_path)
        assert pm.load_all() == 1
        status = {p["name"]: p for p in pm.status()}
        assert not status["bad"]["loaded"] and "boom" in status["bad"]["error"]


class TestSecurity:
    def test_path_traversal_blocked(self, tmp_path):
        pv = PathValidator([tmp_path])
        assert pv.validate(tmp_path / "ok.y4m")
        with pytest.raises(InputError):
            pv.validate(tmp_path / ".." / "etc" / "passwd")

    def test_control_chars_rejected(self):
        with pytest.raises(InputError):
            PathValidator().validate("evil\x00name")

    def test_sanitize_filename(self):
        assert sanitize_filename("a/b;c`d") == "a_b_c_d"
        assert sanitize_filename("..") == "unnamed"

    def test_validate_url(self):
        assert validate_url("https://example.com/v.mp4")
        with pytest.raises(InputError):
            validate_url("file:///etc/passwd")

    def test_rate_limiter(self):
        rl = RateLimiter(rate_per_s=1000, burst=2)
        assert rl.allow() and rl.allow()
        assert not rl.allow()
        time.sleep(0.01)
        assert rl.allow()


class TestProfiles:
    def test_save_load_list_delete(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FRAMEWRIGHT_PROFILES_DIR", str(tmp_path / "profiles"))
        from framewright_tpu.profiles import (
            delete_profile,
            list_profiles,
            load_profile,
            save_profile,
        )

        cfg = Config(scale_factor=4, sr_model="RealESRGAN_x4plus", crf=12)
        save_profile("my archival", cfg)
        assert list_profiles() == ["my_archival"]
        loaded = load_profile("my archival")
        assert loaded.crf == 12 and loaded.scale_factor == 4
        assert delete_profile("my archival")
        assert list_profiles() == []

    def test_missing_profile(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FRAMEWRIGHT_PROFILES_DIR", str(tmp_path / "p"))
        from framewright_tpu.profiles import load_profile

        with pytest.raises(ConfigError):
            load_profile("nope")


class TestCostEstimate:
    def test_scales_with_resolution_and_chips(self):
        from framewright_tpu.reports import estimate_cost

        hd = estimate_cost(1000, 1920, 1080, "rrdb", n_chips=1)
        sd = estimate_cost(1000, 960, 540, "rrdb", n_chips=1)
        assert sd.est_fps == pytest.approx(hd.est_fps * 4, rel=1e-6)
        multi = estimate_cost(1000, 1920, 1080, "rrdb", n_chips=4)
        assert multi.est_fps == pytest.approx(hd.est_fps * 4, rel=1e-6)
        assert multi.est_seconds < hd.est_seconds

    def test_report_fields(self):
        from framewright_tpu.reports import estimate_cost

        d = estimate_cost(7000, 1920, 1080).to_dict()
        assert d["frames"] == 7000
        assert d["est_cost_usd"]["tpu_v5e_single"] > 0
        assert d["assumptions"]["model_family"] == "rrdb"

    def test_unknown_family_defaults(self):
        from framewright_tpu.reports import estimate_cost

        est = estimate_cost(100, 1920, 1080, "nosuch")
        assert est.est_fps > 0


class TestJobStageProgress:
    """Round 4: live per-stage progress on job rows (dashboard panels)."""

    def test_update_progress_with_stage(self, tmp_path):
        from framewright_tpu.persistence import JobStore

        store = JobStore(tmp_path / "j.db")
        jid = store.create_job("a.y4m")
        store.update_progress(jid, 5, stage="enhance", total_frames=48)
        job = store.get_job(jid)
        assert job.frames_done == 5
        assert job.stage == "enhance"
        assert job.total_frames == 48
        store.update_progress(jid, 9)          # stage untouched
        assert store.get_job(jid).stage == "enhance"
        store.close()

    def test_stage_column_migration(self, tmp_path):
        import sqlite3

        from framewright_tpu.persistence import JobStore

        # simulate a round-3 database (no stage column)
        db = tmp_path / "old.db"
        conn = sqlite3.connect(db)
        conn.executescript(
            "CREATE TABLE jobs (job_id TEXT PRIMARY KEY, source TEXT NOT "
            "NULL, output TEXT, config_json TEXT, config_hash TEXT, state "
            "TEXT NOT NULL DEFAULT 'pending', total_frames INTEGER DEFAULT "
            "0, frames_done INTEGER DEFAULT 0, error TEXT, created_at REAL,"
            " updated_at REAL);")
        conn.execute(
            "INSERT INTO jobs (job_id, source, state, created_at,"
            " updated_at) VALUES ('old1', 'x.y4m', 'pending', 1, 1)")
        conn.commit()
        conn.close()
        store = JobStore(db)                    # migrates
        job = store.get_job("old1")
        assert job is not None and job.stage == ""
        store.update_progress("old1", 3, stage="dedup")
        assert store.get_job("old1").stage == "dedup"
        store.close()
