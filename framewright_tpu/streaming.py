"""Streaming chunked restore for very long videos.

Capability parity with the reference's streaming mode
(processors/streaming.py:815 StreamingPipeline + restorer.py:3426
restore_video_streaming): the video is processed in time chunks; each
chunk's output lands as a standalone segment and an ``on_chunk_ready``
callback fires (live preview / progressive upload), then segments are
concatenated. Bounded queues already exist in the prefetch ring; the
chunk layer adds restartability (per-chunk resume) and keeps peak disk
to one segment.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, List, Optional

from framewright_tpu.config import Config
from framewright_tpu.errors import InputError
from framewright_tpu.io import open_reader, probe
from framewright_tpu.io.y4m import Y4MReader, Y4MWriter
from framewright_tpu.parallel.distributor import FrameChunk, make_scene_chunks

logger = logging.getLogger(__name__)


@dataclass
class StreamingResult:
    output_path: Path
    chunks: int = 0
    frames_out: int = 0
    duration_s: float = 0.0
    chunk_paths: List[Path] = field(default_factory=list)


class StreamingRestorer:
    """Chunked end-to-end restore with per-chunk callbacks and resume."""

    def __init__(self, config: Config,
                 on_chunk_ready: Optional[Callable[[int, Path], None]] = None,
                 chunk_frames: int = 0):
        self.config = config
        self.on_chunk_ready = on_chunk_ready
        self.chunk_frames = chunk_frames or config.scene_chunk_frames

    def restore_video_streaming(self, source, output=None,
                                scene_boundaries: Optional[List[int]] = None
                                ) -> StreamingResult:
        from framewright_tpu.restorer import VideoRestorer

        cfg = self.config
        source = Path(source)
        if not source.exists():
            raise InputError(f"source not found: {source}")
        meta = probe(source)
        out_path = Path(output) if output else (
            cfg.project_dir / (source.stem + "_restored.y4m"))
        seg_dir = cfg.work_dir / "segments"
        seg_dir.mkdir(parents=True, exist_ok=True)
        chunks = make_scene_chunks(meta.nb_frames, self.chunk_frames,
                                   scene_boundaries)
        t0 = time.time()
        result = StreamingResult(output_path=out_path, chunks=len(chunks))

        # per-chunk restore: slice the source into a temp segment input,
        # run the normal pipeline on it, emit
        chunk_cfg = cfg.with_overrides(
            checkpoint_enabled=False, validate_output=False,
            deduplicate=False, interpolation=False,
        )
        for chunk in chunks:
            seg_out = seg_dir / f"seg_{chunk.index:05d}.y4m"
            if seg_out.exists() and self._segment_complete(seg_out, chunk, cfg):
                logger.info("chunk %d already done; skipping", chunk.index)
                result.chunk_paths.append(seg_out)
                continue
            seg_in = seg_dir / f"in_{chunk.index:05d}.y4m"
            self._extract_range(source, seg_in, chunk, meta.fps)
            restorer = VideoRestorer(chunk_cfg)
            restorer.restore_video(seg_in, output=seg_out)
            seg_in.unlink(missing_ok=True)
            result.chunk_paths.append(seg_out)
            if self.on_chunk_ready:
                self.on_chunk_ready(chunk.index, seg_out)
            logger.info("chunk %d/%d done", chunk.index + 1, len(chunks))

        # concat segments
        writer: Optional[Y4MWriter] = None
        for seg in result.chunk_paths:
            with Y4MReader(seg) as r:
                if writer is None:
                    writer = Y4MWriter(out_path, r.width, r.height, fps=meta.fps)
                for frame in r:
                    writer.write_frame(frame)
                    result.frames_out += 1
        if writer is not None:
            writer.close()
        if not cfg.keep_intermediates:
            for seg in result.chunk_paths:
                seg.unlink(missing_ok=True)
        result.duration_s = time.time() - t0
        return result

    def _extract_range(self, source: Path, dst: Path, chunk: FrameChunk,
                       fps: float) -> None:
        with open_reader(source) as r:
            w = Y4MWriter(dst, r.width, r.height, fps=fps)
            for i, frame in enumerate(r):
                if i >= chunk.end:
                    break
                if i >= chunk.start:
                    w.write_frame(frame)
            w.close()

    def _segment_complete(self, seg: Path, chunk: FrameChunk, cfg: Config) -> bool:
        try:
            with Y4MReader(seg) as r:
                return r.count_frames() == chunk.n_frames
        except Exception:  # noqa: BLE001
            return False
