"""Frame-directory (PNG sequence) reader/writer.

Reference-compatible layout: ``frame_%06d.png`` starting at 1
(restorer.py:1110-1138 writes this via ffmpeg). Used for
interoperability and checkpoint spill; the hot path keeps frames in
memory/HBM instead.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np
from PIL import Image

from framewright_tpu.errors import InputError

_FRAME_RE = re.compile(r"frame_(\d+)\.(png|jpg|jpeg|bmp|tiff?)$", re.IGNORECASE)


def list_frames(directory: Path) -> List[Path]:
    directory = Path(directory)
    if not directory.is_dir():
        raise InputError(f"Frame directory not found: {directory}")
    frames = [p for p in directory.iterdir() if _FRAME_RE.search(p.name)]
    frames.sort(key=lambda p: int(_FRAME_RE.search(p.name).group(1)))  # type: ignore[union-attr]
    return frames


def load_frame(path: Path) -> np.ndarray:
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), dtype=np.uint8)


def save_frame(path: Path, rgb: np.ndarray, compress_level: int = 1) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.ascontiguousarray(rgb), "RGB").save(
        path, compress_level=compress_level
    )


class FrameDirReader:
    """Reads a frame directory as a video source."""

    def __init__(self, directory: Path, fps: float = 25.0):
        self.directory = Path(directory)
        self.paths = list_frames(self.directory)
        if not self.paths:
            raise InputError(f"No frames in {directory}")
        self.fps = fps
        first = load_frame(self.paths[0])
        self.height, self.width = first.shape[:2]
        self._first_cache: Optional[np.ndarray] = first
        self._idx = 0

    def __len__(self) -> int:
        return len(self.paths)

    def count_frames(self) -> int:
        return len(self.paths)

    def read_frame(self) -> Optional[np.ndarray]:
        if self._idx >= len(self.paths):
            return None
        if self._idx == 0 and self._first_cache is not None:
            frame, self._first_cache = self._first_cache, None
        else:
            frame = load_frame(self.paths[self._idx])
        self._idx += 1
        return frame

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            f = self.read_frame()
            if f is None:
                return
            yield f

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FrameDirWriter:
    """Writes frames as frame_%06d.png (1-based, reference layout)."""

    def __init__(self, directory: Path, fps: float = 25.0, width: int = 0,
                 height: int = 0, compress_level: int = 1, start_index: int = 1):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.fps = fps
        self.compress_level = compress_level
        self._next = start_index
        self.frames_written = 0

    def write_frame(self, rgb: np.ndarray) -> Path:
        path = self.directory / f"frame_{self._next:06d}.png"
        save_frame(path, rgb, self.compress_level)
        self._next += 1
        self.frames_written += 1
        return path

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
