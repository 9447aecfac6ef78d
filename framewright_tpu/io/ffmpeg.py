"""ffmpeg/ffprobe wrappers (gated — used only when binaries exist).

Where the reference extracts every frame to PNG on disk and re-reads it
(restorer.py:1110-1138, utils/ffmpeg.py:18-528), this wrapper streams
raw RGB24 frames over a pipe in both directions so frames never touch
disk between decode and the device. Also provides probe(), audio
extract/mux, and encode with codec/CRF settings matching the
reference's reassembly step (restorer.py:3001-3046).
"""

from __future__ import annotations

import json
import shutil
import subprocess
from dataclasses import dataclass
from fractions import Fraction
from pathlib import Path
from typing import Iterator, List, Optional, Union

import numpy as np

from framewright_tpu.errors import DependencyError, InputError, MediaFormatError


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None and shutil.which("ffprobe") is not None


def _require() -> None:
    if not ffmpeg_available():
        raise DependencyError(
            "ffmpeg/ffprobe not found on PATH. Use .y4m or PNG-sequence "
            "inputs, or install ffmpeg for mp4/mkv support."
        )


@dataclass
class ProbeResult:
    width: int
    height: int
    fps: float
    duration: float
    nb_frames: int
    codec: str
    pix_fmt: str
    has_audio: bool
    raw: dict


def probe_video(path: Union[str, Path]) -> ProbeResult:
    _require()
    cmd = [
        "ffprobe", "-v", "error", "-print_format", "json",
        "-show_streams", "-show_format", str(path),
    ]
    out = subprocess.run(cmd, capture_output=True, timeout=120)
    if out.returncode != 0:
        raise InputError(f"ffprobe failed: {out.stderr.decode(errors='replace')[:500]}")
    info = json.loads(out.stdout)
    vstreams = [s for s in info.get("streams", []) if s.get("codec_type") == "video"]
    if not vstreams:
        raise MediaFormatError(f"No video stream in {path}")
    v = vstreams[0]
    rate = v.get("avg_frame_rate") or v.get("r_frame_rate") or "25/1"
    try:
        fps = float(Fraction(rate))
    except ZeroDivisionError:
        fps = 25.0
    duration = float(info.get("format", {}).get("duration", 0) or 0)
    nb = int(v.get("nb_frames", 0) or 0)
    if nb == 0 and duration > 0:
        nb = int(round(duration * fps))
    return ProbeResult(
        width=int(v["width"]),
        height=int(v["height"]),
        fps=fps,
        duration=duration,
        nb_frames=nb,
        codec=v.get("codec_name", ""),
        pix_fmt=v.get("pix_fmt", ""),
        has_audio=any(s.get("codec_type") == "audio" for s in info.get("streams", [])),
        raw=info,
    )


class FFmpegPipeReader:
    """Decode any container to a stream of RGB24 frames over a pipe."""

    def __init__(self, path: Union[str, Path], vf: Optional[str] = None):
        _require()
        self.meta = probe_video(path)
        self.width, self.height, self.fps = self.meta.width, self.meta.height, self.meta.fps
        cmd = ["ffmpeg", "-v", "error", "-i", str(path)]
        if vf:
            cmd += ["-vf", vf]
        cmd += ["-f", "rawvideo", "-pix_fmt", "rgb24", "-"]
        self._proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        self._frame_bytes = self.width * self.height * 3
        self.frames_read = 0

    def count_frames(self) -> int:
        return self.meta.nb_frames

    def read_frame(self) -> Optional[np.ndarray]:
        assert self._proc.stdout is not None
        raw = self._proc.stdout.read(self._frame_bytes)
        if not raw:
            return None
        if len(raw) != self._frame_bytes:
            raise MediaFormatError("Truncated rawvideo frame from ffmpeg")
        self.frames_read += 1
        return np.frombuffer(raw, np.uint8).reshape(self.height, self.width, 3)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            f = self.read_frame()
            if f is None:
                return
            yield f

    def close(self) -> None:
        if self._proc.poll() is None:
            self._proc.terminate()
        if self._proc.stdout:
            self._proc.stdout.close()
        if self._proc.stderr:
            self._proc.stderr.close()
        self._proc.wait(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FFmpegPipeWriter:
    """Encode RGB24 frames piped to ffmpeg (libx265 CRF default,
    matching the reference's reassemble settings)."""

    def __init__(
        self,
        path: Union[str, Path],
        width: int,
        height: int,
        fps: float = 25.0,
        codec: str = "libx265",
        crf: int = 18,
        preset: str = "medium",
        pix_fmt: str = "yuv420p",
        audio_source: Optional[Path] = None,
        extra_args: Optional[List[str]] = None,
    ):
        _require()
        self.width, self.height, self.fps = width, height, fps
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        cmd = [
            "ffmpeg", "-y", "-v", "error",
            "-f", "rawvideo", "-pix_fmt", "rgb24",
            "-s", f"{width}x{height}", "-r", f"{fps:.6f}",
            "-i", "-",
        ]
        if audio_source is not None:
            cmd += ["-i", str(audio_source), "-map", "0:v", "-map", "1:a?",
                    "-c:a", "copy"]
        cmd += ["-c:v", codec, "-crf", str(crf), "-preset", preset,
                "-pix_fmt", pix_fmt]
        if extra_args:
            cmd += list(extra_args)
        cmd += [str(path)]
        self._proc = subprocess.Popen(cmd, stdin=subprocess.PIPE, stderr=subprocess.PIPE)
        self.frames_written = 0

    def write_frame(self, rgb: np.ndarray) -> None:
        if rgb.shape[:2] != (self.height, self.width):
            raise MediaFormatError(
                f"Frame shape {rgb.shape[:2]} != writer dims {(self.height, self.width)}"
            )
        assert self._proc.stdin is not None
        self._proc.stdin.write(np.ascontiguousarray(rgb, dtype=np.uint8).tobytes())
        self.frames_written += 1

    def close(self) -> None:
        if self._proc.stdin:
            self._proc.stdin.close()
        rc = self._proc.wait(timeout=600)
        err = b""
        if self._proc.stderr:
            err = self._proc.stderr.read()
            self._proc.stderr.close()
        if rc != 0:
            raise MediaFormatError(f"ffmpeg encode failed: {err.decode(errors='replace')[:500]}")

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.close()
        else:
            if self._proc.poll() is None:
                self._proc.kill()


def extract_audio(video: Path, out_audio: Path) -> bool:
    """Copy the audio track to a standalone file; False when no audio."""
    _require()
    out_audio.parent.mkdir(parents=True, exist_ok=True)
    cmd = ["ffmpeg", "-y", "-v", "error", "-i", str(video), "-vn",
           "-c:a", "copy", str(out_audio)]
    rc = subprocess.run(cmd, capture_output=True, timeout=600)
    return rc.returncode == 0 and out_audio.exists() and out_audio.stat().st_size > 0
