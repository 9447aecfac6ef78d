"""Structured logging for framewright-tpu.

Parity with reference ``utils/logging.py:44-621``: JSON or text
formatters, per-module levels, optional file handler, and a processing
metrics log. Kept dependency-free (stdlib logging only).
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Any, Dict, Optional

_ROOT = "framewright_tpu"


class JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload: Dict[str, Any] = {
            "ts": round(record.created, 3),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        if record.exc_info:
            payload["exc"] = self.formatException(record.exc_info)
        extra = getattr(record, "extra_fields", None)
        if extra:
            payload.update(extra)
        return json.dumps(payload)


def setup_logging(
    level: int = logging.INFO,
    json_format: bool = False,
    log_file: Optional[Path] = None,
    module_levels: Optional[Dict[str, int]] = None,
) -> logging.Logger:
    root = logging.getLogger(_ROOT)
    root.setLevel(level)
    root.handlers.clear()

    fmt: logging.Formatter
    if json_format:
        fmt = JsonFormatter()
    else:
        fmt = logging.Formatter(
            "%(asctime)s %(levelname)-7s %(name)s: %(message)s", "%H:%M:%S"
        )

    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    root.addHandler(sh)

    if log_file is not None:
        log_file = Path(log_file)
        log_file.parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        root.addHandler(fh)

    for mod, lvl in (module_levels or {}).items():
        logging.getLogger(mod).setLevel(lvl)
    return root


class MetricsLog:
    """Append-only JSONL metrics stream (stage timings, throughput,
    HBM watermark). Analog of the reference's ProcessingMetricsLog."""

    def __init__(self, path: Optional[Path] = None):
        self.path = Path(path) if path else None
        self.records: list[Dict[str, Any]] = []
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, metric: str, value: float, **tags: Any) -> None:
        rec = {"ts": round(time.time(), 3), "metric": metric, "value": value, **tags}
        self.records.append(rec)
        if self.path:
            with self.path.open("a") as f:
                f.write(json.dumps(rec) + "\n")

    def summary(self) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        for rec in self.records:
            s = out.setdefault(rec["metric"], {"count": 0, "sum": 0.0, "min": float("inf"), "max": float("-inf")})
            v = float(rec["value"])
            s["count"] += 1
            s["sum"] += v
            s["min"] = min(s["min"], v)
            s["max"] = max(s["max"], v)
        for s in out.values():
            s["mean"] = s["sum"] / max(s["count"], 1)
        return out
