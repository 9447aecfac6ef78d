"""Checkpoint/resume: stage-level + frame-level, content-hash keyed.

Merges the reference's three checkpoint systems (SURVEY.md §2.C):
- stage-level JSON checkpoint with config-hash identity and atomic
  tmp-rename writes every N frames (checkpoint.py:20-390);
- video-content identity via SHA-256 of the first 10 MB so the same
  source resumes regardless of path (persistence/checkpoint_manager.py:142);
- frame-range records (which output frames are already written).

Because the TPU pipeline writes output as a stream, frame-level resume
records the last contiguously-written output frame per stage; resuming
skips input frames before that point (exactly what the reference's
per-frame map accomplishes for its PNG directories).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

from framewright_tpu.errors import CheckpointError

logger = logging.getLogger(__name__)

_HASH_BYTES = 10 * 1024 * 1024


def video_content_hash(path: Path) -> str:
    """SHA-256 of the first 10MB (reference semantics)."""
    h = hashlib.sha256()
    try:
        with open(path, "rb") as f:
            h.update(f.read(_HASH_BYTES))
    except OSError as exc:
        raise CheckpointError(f"cannot hash {path}: {exc}") from exc
    return h.hexdigest()[:32]


@dataclass
class PipelineCheckpoint:
    version: int = 1
    config_hash: str = ""
    video_hash: str = ""
    source: str = ""
    total_frames: int = 0
    completed_stages: List[str] = field(default_factory=list)
    current_stage: str = ""
    frames_done: Dict[str, int] = field(default_factory=dict)  # stage -> contiguous count
    created_at: float = field(default_factory=time.time)
    updated_at: float = field(default_factory=time.time)
    metadata: Dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "PipelineCheckpoint":
        d = json.loads(text)
        known = {f for f in cls.__dataclass_fields__}  # type: ignore[attr-defined]
        return cls(**{k: v for k, v in d.items() if k in known})


class CheckpointManager:
    """Atomic JSON checkpoint store keyed by (config_hash, video_hash)."""

    def __init__(self, checkpoint_dir: Path, interval: int = 50):
        self.dir = Path(checkpoint_dir)
        self.interval = max(1, interval)
        self._ckpt: Optional[PipelineCheckpoint] = None
        self._since_save = 0

    def _path(self, video_hash: str) -> Path:
        return self.dir / f"ckpt_{video_hash}.json"

    # ------------------------------------------------------------------
    def start(self, source: Path, config_hash: str,
              total_frames: int = 0) -> PipelineCheckpoint:
        """Load a matching checkpoint or create a fresh one. A config
        change invalidates the old checkpoint (reference behavior)."""
        vhash = video_content_hash(source)
        path = self._path(vhash)
        if path.exists():
            try:
                ckpt = PipelineCheckpoint.from_json(path.read_text())
                if ckpt.config_hash == config_hash:
                    logger.info("resuming from checkpoint %s (stages=%s)",
                                path.name, ckpt.completed_stages)
                    self._ckpt = ckpt
                    return ckpt
                logger.info("config changed; discarding checkpoint %s", path.name)
                path.unlink()
            except (json.JSONDecodeError, CheckpointError, OSError):
                logger.warning("corrupt checkpoint %s; starting fresh", path.name)
        self._ckpt = PipelineCheckpoint(
            config_hash=config_hash, video_hash=vhash,
            source=str(source), total_frames=total_frames,
        )
        return self._ckpt

    @property
    def checkpoint(self) -> PipelineCheckpoint:
        if self._ckpt is None:
            raise CheckpointError("CheckpointManager.start() not called")
        return self._ckpt

    # ------------------------------------------------------------------
    def stage_started(self, stage: str) -> None:
        self.checkpoint.current_stage = stage
        self.save()

    def stage_completed(self, stage: str) -> None:
        ck = self.checkpoint
        if stage not in ck.completed_stages:
            ck.completed_stages.append(stage)
        ck.current_stage = ""
        self.save()

    def frames_completed(self, stage: str, contiguous_count: int) -> None:
        """Record progress; persists every ``interval`` calls or when
        the count jumps by >= interval frames."""
        ck = self.checkpoint
        prev = ck.frames_done.get(stage, 0)
        ck.frames_done[stage] = max(prev, contiguous_count)
        self._since_save += ck.frames_done[stage] - prev
        if self._since_save >= self.interval:
            self.save()

    def resume_point(self, stage: str) -> int:
        return self.checkpoint.frames_done.get(stage, 0)

    def is_stage_complete(self, stage: str) -> bool:
        return stage in self.checkpoint.completed_stages

    # ------------------------------------------------------------------
    def save(self) -> None:
        ck = self.checkpoint
        ck.updated_at = time.time()
        self.dir.mkdir(parents=True, exist_ok=True)
        path = self._path(ck.video_hash)
        tmp = path.with_suffix(".tmp")
        try:
            tmp.write_text(ck.to_json())
            os.replace(tmp, path)  # atomic rename (reference behavior)
        except OSError as exc:
            raise CheckpointError(f"checkpoint save failed: {exc}") from exc
        self._since_save = 0

    def complete(self) -> None:
        """Job finished: remove the checkpoint file."""
        if self._ckpt is None:
            return
        path = self._path(self._ckpt.video_hash)
        if path.exists():
            path.unlink()

    def force_save(self) -> None:
        """Called from exception handlers (reference restorer.py:3386)."""
        try:
            self.save()
        except CheckpointError:
            logger.exception("force_save failed")
