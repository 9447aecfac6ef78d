"""API server, integrations, safeguards tests."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from framewright_tpu.api import APIServer
from framewright_tpu.config import Config
from framewright_tpu.events import Event, EventBus, EventType
from framewright_tpu.integrations import (
    MediaServerConfig,
    MediaServerNotifier,
    WebhookConfig,
    WebhookNotifier,
    apply_lut,
    export_edl,
    parse_cube_lut,
)
from framewright_tpu.safeguards import (
    DiskSpaceMonitor,
    HBMMonitor,
    HostMemoryMonitor,
    preflight_check,
)


@pytest.fixture
def api(tmp_path):
    srv = APIServer(tmp_path / "jobs.db", port=0)
    srv.start(process_jobs=False)
    yield srv
    srv.stop()


def _get(srv, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}",
                                    timeout=5) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(srv, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=5) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


import urllib.error  # noqa: E402


class TestAPI:
    def test_health_and_catalog(self, api):
        assert _get(api, "/api/health")[1]["status"] == "ok"
        assert "fast" in _get(api, "/api/presets")[1]
        assert "RealESRGAN_x2plus" in _get(api, "/api/models")[1]
        assert "vhs_family_video" in _get(api, "/api/recipes")[1]

    def test_job_lifecycle(self, api):
        code, out = _post(api, "/api/jobs", {"source": "a.y4m"})
        assert code == 201
        jid = out["job_id"]
        code, job = _get(api, f"/api/jobs/{jid}")
        assert job["state"] == "pending"
        code, jobs = _get(api, "/api/jobs")
        assert len(jobs) == 1
        # cancel
        req = urllib.request.Request(
            f"http://127.0.0.1:{api.port}/api/jobs/{jid}", method="DELETE")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert json.loads(r.read())["state"] == "cancelled"

    def test_bad_requests(self, api):
        assert _post(api, "/api/jobs", {})[0] == 400
        assert _post(api, "/api/jobs", {"source": "x", "config": {"crf": 99}})[0] == 400
        assert _get(api, "/api/jobs/nope")[0] == 404

    def test_dashboard_html(self, api):
        with urllib.request.urlopen(f"http://127.0.0.1:{api.port}/", timeout=5) as r:
            body = r.read()
        assert b"framewright" in body
        assert b"/api/frame" in body          # compare slider wiring
        assert b"gal-" in body                # before/after thumbnail gallery

    def test_config_schema_endpoint_covers_every_flag(self, api):
        """The full settings editor's schema: every init field of
        Config appears exactly once, grouped (reference ui.py settings
        panels)."""
        import dataclasses

        from framewright_tpu.config import Config

        code, schema = _get(api, "/api/config_schema")
        assert code == 200
        names = [f["name"] for g in schema for f in g["fields"]]
        init_fields = {f.name for f in dataclasses.fields(Config) if f.init}
        assert set(names) == init_fields
        assert len(names) == len(set(names))
        groups = [g["group"] for g in schema]
        assert "Super-resolution" in groups and "Encoding" in groups
        sr = next(f for g in schema for f in g["fields"]
                  if f["name"] == "sr_model")
        assert "RealESRGAN_x2plus" in sr["choices"]

    def test_dashboard_has_settings_editor(self, api):
        with urllib.request.urlopen(f"http://127.0.0.1:{api.port}/",
                                    timeout=5) as r:
            body = r.read()
        assert b"/api/config_schema" in body
        assert b"cfgpanel" in body

    def test_job_submit_with_schema_override(self, api):
        """A flag edited in the settings editor (differs from default)
        must land in the job config."""
        code, out = _post(api, "/api/jobs",
                          {"source": "a.y4m", "config": {"crf": 22}})
        assert code == 201
        code, job = _get(api, f"/api/jobs/{out['job_id']}")
        assert job["config"]["crf"] == 22

    def test_recommend_endpoint_guided_flow(self, api, tmp_path):
        # analyze -> recommend -> restore without hand-writing a config
        # (reference ui.py guided workflow)
        from framewright_tpu.io.y4m import Y4MWriter

        rng = np.random.default_rng(0)
        clip = tmp_path / "noisy.y4m"
        base = rng.integers(40, 200, (48, 64, 3)).astype(np.float32)
        with Y4MWriter(clip, 64, 48, fps=24) as w:
            for _ in range(10):
                noisy = base + rng.normal(0, 15, base.shape)
                w.write_frame(np.clip(noisy, 0, 255).astype(np.uint8))
        code, rec = _post(api, "/api/recommend", {"source": str(clip)})
        assert code == 200
        assert rec["preset"] in ("fast", "quality", "archive")
        assert "analysis" in rec and "config" in rec
        assert rec["analysis"]["noise_profile"]["luma_sigma"] > 5
        assert rec["overrides"].get("denoise") is True
        # one-click restore: submit the recommendation as the config
        cfg = dict(rec["overrides"])
        cfg["preset"] = rec["preset"]
        code, out = _post(api, "/api/jobs",
                          {"source": str(clip), "config": cfg})
        assert code == 201 and out["job_id"]

    def test_job_log_endpoint(self, api, tmp_path):
        # live log panel: processed jobs expose captured log lines
        import logging

        from framewright_tpu.io.y4m import Y4MWriter

        clip = tmp_path / "log.y4m"
        with Y4MWriter(clip, 32, 24, fps=24) as w:
            for _ in range(3):
                w.write_frame(np.zeros((24, 32, 3), np.uint8))
        jid = api.queue.submit(str(clip), "")

        def fake_process(job):
            logging.getLogger("framewright_tpu.restorer").info(
                "stage enhance started")

        api.queue.process_fn = fake_process
        api.queue.process_next()
        code, d = _get(api, f"/api/jobs/{jid}/log")
        assert code == 200
        assert any("stage enhance started" in ln for ln in d["lines"])
        assert _get(api, "/api/jobs/nope/log")[0] == 404

    def test_dashboard_has_guided_panel(self, api):
        with urllib.request.urlopen(f"http://127.0.0.1:{api.port}/",
                                    timeout=5) as r:
            body = r.read()
        assert b"/api/recommend" in body
        assert b"guided restore" in body

    def test_frame_endpoint_serves_png(self, api, tmp_path):
        # register the source as a job first (unregistered paths are 403)
        import numpy as np

        from framewright_tpu.io.y4m import Y4MWriter
        from tests.conftest import make_gradient_frame

        src = tmp_path / "clip.y4m"
        with Y4MWriter(src, width=64, height=48, fps=25) as w:
            for t in range(4):
                w.write_frame(make_gradient_frame(48, 64, t))
        assert _get(api, f"/api/frame?source={src}&t=1")[0] == 403
        _post(api, "/api/jobs", {"source": str(src)})
        with urllib.request.urlopen(
                f"http://127.0.0.1:{api.port}/api/frame?source={src}&t=1",
                timeout=5) as r:
            data = r.read()
        assert r.headers["Content-Type"] == "image/png"
        assert data[:8] == b"\x89PNG\r\n\x1a\n"


class TestWebhooks:
    def test_payload_shapes(self):
        wh = WebhookNotifier(WebhookConfig(url="https://example.com/hook",
                                           kind="slack"))
        ev = Event(type=EventType.JOB_COMPLETED, data={"frames": 5})
        p = wh.payload_for(ev)
        assert "text" in p
        generic = WebhookNotifier(WebhookConfig(url="https://example.com/h"))
        assert generic.payload_for(ev)["event"] == "job_completed"

    def test_delivery_to_local_server(self, tmp_path):
        # a tiny local HTTP sink
        from http.server import BaseHTTPRequestHandler, HTTPServer

        received = []

        class Sink(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                received.append(json.loads(self.rfile.read(n)))
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):
                pass

        httpd = HTTPServer(("127.0.0.1", 0), Sink)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            bus = EventBus()
            wh = WebhookNotifier(WebhookConfig(
                url=f"http://127.0.0.1:{httpd.server_port}/hook"))
            wh.attach(bus)
            bus.emit(EventType.JOB_COMPLETED, frames=7)
            time.sleep(0.2)
            assert received and received[0]["frames"] == 7
        finally:
            httpd.shutdown()

    def test_media_server_urls(self):
        plex = MediaServerNotifier(MediaServerConfig(
            "plex", "http://plex.local:32400", token="tok"))
        assert "X-Plex-Token=tok" in plex.refresh_url()
        jf = MediaServerNotifier(MediaServerConfig(
            "jellyfin", "http://jf.local:8096", token="k"))
        assert "/Library/Refresh" in jf.refresh_url()


class TestEDLLut:
    def test_edl_format(self):
        edl = export_edl([24, 72], 120, fps=24.0, title="t")
        assert "TITLE: t" in edl
        lines = [ln for ln in edl.splitlines() if ln[:3].isdigit()]
        assert len(lines) == 3
        assert "00:00:01:00" in lines[0]  # first scene ends at frame 24

    def test_lut_roundtrip_identity(self, rng):
        n = 4
        rows = []
        for b in range(n):
            for g in range(n):
                for r in range(n):
                    rows.append(f"{r/(n-1):.6f} {g/(n-1):.6f} {b/(n-1):.6f}")
        text = f"LUT_3D_SIZE {n}\n" + "\n".join(rows)
        lut = parse_cube_lut(text)
        frame = rng.integers(0, 256, (16, 16, 3), np.uint8)
        out = apply_lut(frame, lut)
        assert np.abs(out.astype(int) - frame.astype(int)).max() <= 2

    def test_lut_inversion(self, rng):
        n = 4
        rows = []
        for b in range(n):
            for g in range(n):
                for r in range(n):
                    rows.append(f"{1-r/(n-1):.6f} {1-g/(n-1):.6f} {1-b/(n-1):.6f}")
        lut = parse_cube_lut(f"LUT_3D_SIZE {n}\n" + "\n".join(rows))
        frame = np.full((4, 4, 3), 255, np.uint8)
        out = apply_lut(frame, lut)
        assert out.max() <= 2  # inverted white -> black


class TestSafeguards:
    def test_disk_monitor(self, tmp_path):
        mon = DiskSpaceMonitor(tmp_path, min_free_gb=0.001)
        s = mon.check()
        assert s.ok and s.free_gb > 0
        assert mon.estimate_output_gb(1920, 1080, 1000) > 1.0

    def test_host_memory(self):
        m = HostMemoryMonitor(min_free_gb=0.001).check()
        assert m["ok"]

    def test_hbm_monitor(self):
        m = HBMMonitor().check()
        assert "utilization" in m

    def test_preflight_blockers(self, tmp_path):
        cfg = Config(project_dir=tmp_path)
        res = preflight_check(cfg, tmp_path / "missing.y4m")
        assert not res.ok
        assert any("not found" in b for b in res.blockers)

    def test_preflight_ok_with_warnings(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
        src = tmp_path / "v.y4m"
        src.write_bytes(b"YUV4MPEG2 W64 H48 F25:1\n")
        cfg = Config(project_dir=tmp_path)
        res = preflight_check(cfg, src)
        assert res.ok
        assert any("random init" in w or "CPU" in w for w in res.warnings)

    def test_keep_awake_noop_without_tools(self, monkeypatch):
        import shutil as _shutil

        from framewright_tpu.safeguards import KeepAwake

        monkeypatch.setattr(_shutil, "which", lambda name: None)
        with KeepAwake() as ka:
            assert ka._proc is None   # no inhibitor tool -> silent no-op

    def test_keep_awake_spawns_and_reaps(self, monkeypatch, tmp_path):
        import shutil as _shutil
        import sys

        from framewright_tpu.safeguards import KeepAwake

        if not sys.platform.startswith("linux"):
            pytest.skip("linux-only spawn path")
        # route systemd-inhibit to a stub so the spawn/terminate path
        # runs without systemd (the stub ignores the inhibit flags)
        fake = tmp_path / "systemd-inhibit"
        fake.write_text("#!/bin/sh\nexec sleep 30\n")
        fake.chmod(0o755)
        monkeypatch.setattr(_shutil, "which",
                            lambda name: str(fake)
                            if name == "systemd-inhibit" else None)
        with KeepAwake() as ka:
            assert ka._proc is not None
            assert ka._proc.poll() is None
        assert ka._proc is None

    def test_preflight_gates_restore(self, tmp_path, monkeypatch):
        """restore_video aborts on preflight blockers before compute
        (wiring test: safeguards -> restorer._stage_probe)."""
        import jax

        from framewright_tpu.errors import StageError
        from framewright_tpu.io.y4m import Y4MWriter
        from framewright_tpu.restorer import VideoRestorer

        if jax.devices()[0].platform == "tpu":
            pytest.skip("blocker requires a CPU-only host")
        src = tmp_path / "v.y4m"
        with Y4MWriter(src, 64, 48, fps=25) as w:
            for _ in range(2):
                w.write_frame(np.zeros((48, 64, 3), np.uint8))
        cfg = Config(project_dir=tmp_path / "p", allow_cpu_fallback=False,
                     validate_output=False)
        with pytest.raises(StageError, match="preflight blocked"):
            VideoRestorer(cfg).restore_video(src, output=tmp_path / "o.y4m")

    def test_job_with_recipe(self, api):
        code, out = _post(api, "/api/jobs",
                          {"source": "a.y4m",
                           "config": {"recipe": "dvd_upscale"}})
        assert code == 201, out
        code, out = _post(api, "/api/jobs",
                          {"source": "a.y4m",
                           "config": {"recipe": "no_such_recipe"}})
        assert code == 400

    def test_dashboard_has_round3_panels(self, api):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{api.port}/", timeout=5) as r:
            body = r.read()
        for needle in (b"loadRecipes", b"loadHardware", b"analyzeSrc"):
            assert needle in body, needle
