"""Long-form temporal consistency: global anchors + chunked processing.

Capability parity with the reference's engine/temporal_consistency.py
(GlobalAnchors.extract_from_video:329, ColorConsistencyEnforcer:587,
ChunkedProcessor:732 with 50-frame chunks / 4-frame overlap blending,
LongFormConsistencyManager:993 — the mechanism keeping 7000+-frame
videos globally consistent while all processing is chunk-local):

1. Pass 1 samples global anchors (color statistics, brightness,
   contrast, grain) every N frames across the WHOLE video.
2. Processing runs in chunks; after each chunk, frame statistics are
   drift-corrected toward the time-interpolated anchor values.
3. Chunk seams are blended over the overlap region.

This is the frame-timeline analog of sequence parallelism: chunk
overlap = halo exchange, anchors = the global state that keeps local
shards consistent (SURVEY.md §5).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class AnchorPoint:
    frame_index: int
    mean_rgb: np.ndarray          # (3,)
    std_rgb: np.ndarray           # (3,)
    brightness: float
    contrast: float
    grain: float


@dataclass
class GlobalAnchors:
    points: List[AnchorPoint] = field(default_factory=list)
    total_frames: int = 0

    @classmethod
    def extract(cls, frames_iter: Iterator[np.ndarray],
                sample_every: int = 50) -> "GlobalAnchors":
        from framewright_tpu.processors.film import estimate_grain_level

        anchors = cls()
        i = 0
        for f in frames_iter:
            if i % sample_every == 0:
                ff = f.astype(np.float32)
                anchors.points.append(AnchorPoint(
                    frame_index=i,
                    mean_rgb=ff.mean(axis=(0, 1)),
                    std_rgb=ff.std(axis=(0, 1)) + 1e-3,
                    brightness=float(ff.mean()),
                    contrast=float(ff.std()),
                    grain=estimate_grain_level(f),
                ))
            i += 1
        anchors.total_frames = i
        return anchors

    def interpolate(self, frame_index: int) -> AnchorPoint:
        """Anchor statistics at an arbitrary frame (linear in time)."""
        pts = self.points
        if not pts:
            raise ValueError("no anchors")
        if frame_index <= pts[0].frame_index:
            return pts[0]
        if frame_index >= pts[-1].frame_index:
            return pts[-1]
        for a, b in zip(pts, pts[1:]):
            if a.frame_index <= frame_index <= b.frame_index:
                t = (frame_index - a.frame_index) / max(
                    b.frame_index - a.frame_index, 1)
                return AnchorPoint(
                    frame_index=frame_index,
                    mean_rgb=a.mean_rgb * (1 - t) + b.mean_rgb * t,
                    std_rgb=a.std_rgb * (1 - t) + b.std_rgb * t,
                    brightness=a.brightness * (1 - t) + b.brightness * t,
                    contrast=a.contrast * (1 - t) + b.contrast * t,
                    grain=a.grain * (1 - t) + b.grain * t,
                )
        return pts[-1]


class ColorConsistencyEnforcer:
    """Drift-correct a frame's color statistics toward the anchor
    (reference ColorConsistencyEnforcer:587): per-channel affine match
    of mean/std, blended by ``strength``."""

    def __init__(self, anchors: GlobalAnchors, strength: float = 0.5):
        self.anchors = anchors
        self.strength = strength

    def correct(self, frame: np.ndarray, frame_index: int) -> np.ndarray:
        a = self.anchors.interpolate(frame_index)
        f = frame.astype(np.float32)
        cur_mean = f.mean(axis=(0, 1))
        cur_std = f.std(axis=(0, 1)) + 1e-3
        gain = a.std_rgb / cur_std
        corrected = (f - cur_mean) * gain + a.mean_rgb
        out = f * (1 - self.strength) + corrected * self.strength
        return np.clip(out, 0, 255).astype(np.uint8)


class ChunkedProcessor:
    """Process a stream in fixed chunks with overlap blending
    (reference ChunkedProcessor:732: 50-frame chunks, 4-frame overlap).

    process_chunk receives a list of frames (chunk + trailing overlap)
    and must return the same count; consecutive chunk outputs are
    cross-faded over the overlap region so chunk-local processing
    (e.g. per-chunk model state) produces no visible seams.
    """

    def __init__(self, process_chunk, chunk_size: int = 50, overlap: int = 4):
        assert overlap < chunk_size
        self.process_chunk = process_chunk
        self.chunk_size = chunk_size
        self.overlap = overlap

    def process_stream(self, frames_iter: Iterator[np.ndarray]) -> Iterator[np.ndarray]:
        cs, ov = self.chunk_size, self.overlap
        buf: List[np.ndarray] = []
        tail_out: List[np.ndarray] = []   # processed overlap from previous chunk

        def blend(prev_tail, new_head):
            out = []
            n = len(prev_tail)
            for i, (a, b) in enumerate(zip(prev_tail, new_head)):
                w = (i + 1) / (n + 1)
                out.append(np.clip(
                    a.astype(np.float32) * (1 - w) + b.astype(np.float32) * w,
                    0, 255).astype(np.uint8))
            return out

        first = True
        while True:
            # fill buffer to chunk + overlap
            target = cs + ov
            ended = False
            while len(buf) < target:
                nxt = next(frames_iter, None)
                if nxt is None:
                    ended = True
                    break
                buf.append(nxt)
            if not buf:
                break
            processed = self.process_chunk(list(buf[:target]))
            if first:
                head = processed[:cs]
                first = False
            else:
                head = blend(tail_out, processed[:ov]) + processed[ov:cs]
            if ended:
                # emit everything that remains
                for f in head:
                    yield f
                for f in processed[cs:]:
                    yield f
                return
            for f in head:
                yield f
            tail_out = processed[cs:cs + ov]
            buf = buf[cs:]


class LongFormConsistencyManager:
    """Two-pass driver combining anchors + chunking (reference
    LongFormConsistencyManager:993)."""

    def __init__(self, chunk_size: int = 50, overlap: int = 4,
                 anchor_every: int = 50, color_strength: float = 0.5):
        self.chunk_size = chunk_size
        self.overlap = overlap
        self.anchor_every = anchor_every
        self.color_strength = color_strength
        self.anchors: Optional[GlobalAnchors] = None

    def analyze(self, frames_iter: Iterator[np.ndarray]) -> GlobalAnchors:
        self.anchors = GlobalAnchors.extract(frames_iter, self.anchor_every)
        logger.info("extracted %d global anchors over %d frames",
                    len(self.anchors.points), self.anchors.total_frames)
        return self.anchors

    def process_stream(self, frames_iter: Iterator[np.ndarray],
                       process_chunk) -> Iterator[np.ndarray]:
        """Chunked processing + anchor drift correction. ``analyze``
        must have run (first pass)."""
        if self.anchors is None:
            raise ValueError("call analyze() first (two-pass design)")
        enforcer = ColorConsistencyEnforcer(self.anchors, self.color_strength)
        chunker = ChunkedProcessor(process_chunk, self.chunk_size, self.overlap)
        for i, frame in enumerate(chunker.process_stream(frames_iter)):
            yield enforcer.correct(frame, i)
