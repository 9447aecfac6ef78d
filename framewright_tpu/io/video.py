"""Unified video open/probe API over Y4M, PNG dirs, and ffmpeg.

Readers yield RGB uint8 (H, W, 3) frames via ``read_frame()``/iteration
and expose ``width``/``height``/``fps``/``count_frames()``. Writers take
``write_frame(rgb)`` and must be ``close()``d. Format selection is by
suffix; anything that isn't .y4m or a directory requires ffmpeg.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Union

from framewright_tpu.errors import InputError
from framewright_tpu.io import ffmpeg as _ff
from framewright_tpu.io.png_seq import FrameDirReader, FrameDirWriter, list_frames
from framewright_tpu.io.y4m import Y4MReader, Y4MWriter


@dataclass
class VideoMeta:
    width: int
    height: int
    fps: float
    nb_frames: int
    has_audio: bool = False
    container: str = ""


def probe(path: Union[str, Path]) -> VideoMeta:
    path = Path(path)
    if path.is_dir():
        frames = list_frames(path)
        if not frames:
            raise InputError(f"No frames in directory {path}")
        from framewright_tpu.io.png_seq import load_frame

        h, w = load_frame(frames[0]).shape[:2]
        return VideoMeta(w, h, 25.0, len(frames), container="frames")
    if path.suffix.lower() == ".y4m":
        with Y4MReader(path) as r:
            return VideoMeta(r.width, r.height, r.fps, r.count_frames(), container="y4m")
    p = _ff.probe_video(path)
    return VideoMeta(p.width, p.height, p.fps, p.nb_frames, p.has_audio, container=path.suffix.lstrip("."))


def open_reader(path: Union[str, Path], fps_hint: float = 25.0):
    path = Path(path)
    if not path.exists():
        raise InputError(f"Input not found: {path}")
    if path.is_dir():
        return FrameDirReader(path, fps=fps_hint)
    if path.suffix.lower() == ".y4m":
        return Y4MReader(path)
    return _ff.FFmpegPipeReader(path)


def open_writer(
    path: Union[str, Path],
    width: int,
    height: int,
    fps: float = 25.0,
    codec: str = "libx265",
    crf: int = 18,
    preset: str = "medium",
    pix_fmt: str = "yuv420p",
    audio_source: Optional[Path] = None,
):
    path = Path(path)
    if path.suffix == "" or path.is_dir():
        return FrameDirWriter(path, fps=fps)
    if path.suffix.lower() == ".y4m":
        return Y4MWriter(path, width, height, fps=fps)
    return _ff.FFmpegPipeWriter(
        path, width, height, fps=fps, codec=codec, crf=crf,
        preset=preset, pix_fmt=pix_fmt, audio_source=audio_source,
    )
