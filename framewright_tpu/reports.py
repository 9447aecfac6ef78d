"""QA reports and quality trends.

Capability parity with the reference's reporting layer
(reports/qa_report.py:155 HTML/JSON QA report with per-stage metrics
and thumbnails, reports/trends.py:91 quality-over-time DB, reports cost
calculator).
"""

from __future__ import annotations

import json
import logging
import sqlite3
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


@dataclass
class QAReport:
    source: str
    output: str
    created_at: float = field(default_factory=time.time)
    input_info: Dict = field(default_factory=dict)
    output_info: Dict = field(default_factory=dict)
    stages: List[Dict] = field(default_factory=list)
    quality: Dict = field(default_factory=dict)
    dedup: Dict = field(default_factory=dict)
    errors: int = 0
    duration_s: float = 0.0

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)

    def to_html(self) -> str:
        rows = "".join(
            f"<tr><td>{s.get('name')}</td><td>{s.get('status')}</td>"
            f"<td>{s.get('duration_s', 0):.2f}s</td></tr>"
            for s in self.stages
        )
        q = self.quality or {}
        badge = ("PASSED" if q.get("passed") else "FAILED") if q else "N/A"
        color = "#2a7" if q.get("passed") else "#c33"
        return f"""<!doctype html><html><head><meta charset="utf-8">
<title>framewright QA report</title>
<style>body{{font-family:system-ui;margin:2rem;color:#222}}
table{{border-collapse:collapse}}td,th{{border:1px solid #ccc;padding:.4rem .8rem}}
.badge{{display:inline-block;padding:.2rem .6rem;border-radius:4px;color:#fff;
background:{color}}}</style></head><body>
<h1>QA Report</h1>
<p><b>Source:</b> {self.source}<br><b>Output:</b> {self.output}<br>
<b>Duration:</b> {self.duration_s:.1f}s &nbsp; <b>Errors:</b> {self.errors}</p>
<h2>Quality <span class="badge">{badge}</span></h2>
<p>PSNR: {q.get('psnr', 'n/a')} dB &nbsp; SSIM: {q.get('ssim', 'n/a')}
 &nbsp; samples: {q.get('samples', 0)}</p>
<h2>Stages</h2><table><tr><th>Stage</th><th>Status</th><th>Time</th></tr>{rows}</table>
</body></html>"""

    def save(self, path: Path) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        if path.suffix == ".html":
            path.write_text(self.to_html())
        else:
            path.write_text(self.to_json())
        return path


def build_qa_report(result, source: str) -> QAReport:
    """Assemble a QAReport from a RestoreResult."""
    rep = QAReport(source=str(source), output=str(result.output_path))
    rep.duration_s = result.duration_s
    rep.errors = result.errors
    rep.stages = result.stage_summary.get("stages", [])
    if result.quality is not None:
        rep.quality = result.quality.to_dict()
    if result.dedup is not None:
        rep.dedup = {
            "duplicates": result.dedup.duplicates,
            "unique_frames": result.dedup.unique_frames,
            "estimated_source_fps": result.dedup.estimated_source_fps,
        }
    rep.output_info = {"frames": result.frames_out,
                       "fps_processing": round(result.fps, 2)}
    return rep


class QualityTrends:
    """SQLite quality-over-time log (reference reports/trends.py:91)."""

    def __init__(self, db_path: Path):
        self.db_path = Path(db_path)
        self.db_path.parent.mkdir(parents=True, exist_ok=True)
        self._conn = sqlite3.connect(self.db_path, check_same_thread=False)
        self._conn.execute(
            "CREATE TABLE IF NOT EXISTS runs (ts REAL, source TEXT,"
            " psnr REAL, ssim REAL, fps REAL, frames INTEGER, passed INTEGER)")
        self._conn.commit()

    def record(self, source: str, psnr: float, ssim: float, fps: float,
               frames: int, passed: bool) -> None:
        self._conn.execute(
            "INSERT INTO runs VALUES (?,?,?,?,?,?,?)",
            (time.time(), source, psnr, ssim, fps, frames, int(passed)))
        self._conn.commit()

    def history(self, limit: int = 100) -> List[Dict]:
        cur = self._conn.execute(
            "SELECT ts, source, psnr, ssim, fps, frames, passed FROM runs"
            " ORDER BY ts DESC LIMIT ?", (limit,))
        keys = ("ts", "source", "psnr", "ssim", "fps", "frames", "passed")
        return [dict(zip(keys, row)) for row in cur.fetchall()]

    def summary(self) -> Dict:
        cur = self._conn.execute(
            "SELECT COUNT(*), AVG(psnr), AVG(ssim), AVG(fps), SUM(passed) FROM runs")
        n, psnr, ssim, fps, passed = cur.fetchone()
        return {
            "runs": n or 0,
            "avg_psnr": round(psnr or 0, 2),
            "avg_ssim": round(ssim or 0, 4),
            "avg_fps": round(fps or 0, 2),
            "pass_rate": round((passed or 0) / n, 3) if n else 0.0,
        }

    def close(self) -> None:
        self._conn.close()


# ---------------------------------------------------------------------------
# Cost / time estimation (reference reports cost calculator)
# ---------------------------------------------------------------------------

# measured single-chip throughput at 1080p on TPU v5e (PERF.md / family
# scaling); fps scales inversely with input pixel count
_FAMILY_FPS_1080P = {
    "rrdb": 2.7,          # 23-block Real-ESRGAN, int8 static scales
    "srvgg": 11.0,        # compact distilled (4x fewer FLOPs)
    "hat": 0.5,
    "vsr": 2.0,
    "diffusion": 0.3,
}

# on-demand accelerator pricing, USD/hour (public list prices; the
# reference's calculator embeds GPU cloud rates the same way)
_HOURLY_USD = {
    "tpu_v5e_1": 1.20,
    "tpu_v5e_8": 9.60,
    "cloud_gpu": 0.79,     # the reference's default RunPod-class rate
}


@dataclass
class CostEstimate:
    frames: int
    est_fps: float
    est_seconds: float
    est_cost_usd: Dict[str, float]
    assumptions: Dict[str, object]

    def to_dict(self) -> Dict:
        return {
            "frames": self.frames,
            "est_fps_per_chip": round(self.est_fps, 2),
            "est_wall_time_s": round(self.est_seconds, 1),
            "est_wall_time_h": round(self.est_seconds / 3600.0, 2),
            "est_cost_usd": {k: round(v, 2)
                             for k, v in self.est_cost_usd.items()},
            "assumptions": self.assumptions,
        }


def estimate_cost(frames: int, width: int, height: int,
                  model_family: str = "rrdb",
                  n_chips: int = 1,
                  overhead_factor: float = 1.25) -> CostEstimate:
    """Wall-time + cloud-cost estimate for a restoration job.

    Scaling model: family fps at 1080p / pixel ratio, near-linear chip
    scaling (frame-parallel SPMD), times an IO/stage overhead factor.
    """
    base = _FAMILY_FPS_1080P.get(model_family, 2.0)
    pixel_ratio = (width * height) / (1920.0 * 1080.0)
    fps = base / max(pixel_ratio, 1e-6) * n_chips
    seconds = frames / max(fps, 1e-6) * overhead_factor
    hours = seconds / 3600.0
    cost = {
        "tpu_v5e_single": hours * _HOURLY_USD["tpu_v5e_1"]
        if n_chips == 1 else hours * _HOURLY_USD["tpu_v5e_1"] * n_chips,
        "tpu_v5e_pod8": (frames / max(base / max(pixel_ratio, 1e-6) * 8,
                                      1e-6) * overhead_factor / 3600.0)
        * _HOURLY_USD["tpu_v5e_8"],
        "reference_gpu": hours * _HOURLY_USD["cloud_gpu"] * n_chips,
    }
    return CostEstimate(
        frames=frames, est_fps=fps, est_seconds=seconds,
        est_cost_usd=cost,
        assumptions={"model_family": model_family, "n_chips": n_chips,
                     "resolution": f"{width}x{height}",
                     "fps_base_1080p": base,
                     "overhead_factor": overhead_factor})
