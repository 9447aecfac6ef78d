"""Burnt-in subtitle analysis: timing extraction and SRT export.

Capability parity with the reference's subtitle stack
(processors/subtitle_extraction.py, subtitles.py: OCR engines -> SRT,
SubtitleTimeSync). Without an OCR engine in this environment, timing
segmentation is fully implemented (when subtitles appear/disappear,
from subtitle-band activity) and text recognition is an injectable hook
(``ocr_fn``) so EasyOCR/Tesseract plug in where available; removal
itself lives in processors/inpaint.SubtitleRemover.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable, Iterator, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class SubtitleEvent:
    index: int
    start_frame: int
    end_frame: int
    text: str = ""

    def timing(self, fps: float):
        return self.start_frame / fps, self.end_frame / fps


def _crop_region(frame: np.ndarray, region: str) -> np.ndarray:
    """Select the text band (reference subtitle_region: bottom|top|full)."""
    h = frame.shape[0]
    if region == "top":
        return frame[: int(h * 0.28)]
    if region == "full":
        return frame
    return frame[int(h * 0.72):]


def _band_activity(frame: np.ndarray, region: str = "bottom") -> float:
    """Text-likeness of the subtitle band: bright high-contrast strokes."""
    band = _crop_region(frame, region).astype(np.float32).mean(-1)
    bright = band > 180
    gx = np.abs(np.diff(band, axis=1)).mean()
    return float(bright.mean() * 50 + gx / 8.0)


class SubtitleTimingExtractor:
    """Detect subtitle on/off segments from band activity."""

    def __init__(self, threshold: float = 1.0, min_frames: int = 6,
                 merge_gap: int = 3,
                 ocr_fn: Optional[Callable[[np.ndarray], str]] = None,
                 region: str = "bottom"):
        self.threshold = threshold
        self.min_frames = min_frames
        self.merge_gap = merge_gap
        self.ocr_fn = ocr_fn
        self.region = region

    def analyze(self, frames_iter: Iterator[np.ndarray]) -> List[SubtitleEvent]:
        activity: List[float] = []
        samples: dict = {}
        for i, f in enumerate(frames_iter):
            activity.append(_band_activity(f, self.region))
            if self.ocr_fn is not None:
                samples[i] = f
        if not activity:
            return []
        arr = np.asarray(activity)
        base = np.median(arr)
        on = arr > (base + self.threshold)
        events: List[SubtitleEvent] = []
        start = None
        for i, v in enumerate(on):
            if v and start is None:
                start = i
            elif not v and start is not None:
                events.append(SubtitleEvent(len(events) + 1, start, i))
                start = None
        if start is not None:
            events.append(SubtitleEvent(len(events) + 1, start, len(on)))
        # merge close events, drop blips
        merged: List[SubtitleEvent] = []
        for ev in events:
            if merged and ev.start_frame - merged[-1].end_frame <= self.merge_gap:
                merged[-1].end_frame = ev.end_frame
            else:
                merged.append(ev)
        merged = [e for e in merged if e.end_frame - e.start_frame >= self.min_frames]
        for k, e in enumerate(merged):
            e.index = k + 1
            if self.ocr_fn is not None:
                mid = (e.start_frame + e.end_frame) // 2
                frame = samples.get(mid)
                if frame is not None:
                    try:
                        e.text = self.ocr_fn(frame)
                    except Exception:  # noqa: BLE001 - OCR isolation
                        logger.exception("ocr failed for event %d", e.index)
        return merged


def _srt_time(seconds: float) -> str:
    ms = int(round(seconds * 1000))
    h, ms = divmod(ms, 3600_000)
    m, ms = divmod(ms, 60_000)
    s, ms = divmod(ms, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"


def export_srt(events: List[SubtitleEvent], fps: float,
               placeholder: str = "[subtitle]") -> str:
    """Events -> SRT text (reference SRT export)."""
    blocks = []
    for e in events:
        t0, t1 = e.timing(fps)
        blocks.append(
            f"{e.index}\n{_srt_time(t0)} --> {_srt_time(t1)}\n"
            f"{e.text or placeholder}\n")
    return "\n".join(blocks)


def shift_events(events: List[SubtitleEvent], offset_frames: int) -> List[SubtitleEvent]:
    """Timing resync (reference SubtitleTimeSync)."""
    out = []
    for e in events:
        out.append(SubtitleEvent(
            e.index, max(0, e.start_frame + offset_frames),
            max(0, e.end_frame + offset_frames), e.text))
    return out
