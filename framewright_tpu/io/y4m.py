"""YUV4MPEG2 (.y4m) container: pure-Python reader/writer.

The framework's self-contained lossless interchange format — no
external binary needed, bitstream-compatible with ffmpeg/mpv/x264.
Format: ASCII stream header ``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``
followed by frames, each ``FRAME[params]\\n`` + raw planar YUV.

Supported colorspaces: C420 (jpeg/mpeg2/paldv treated alike for sizing),
C422, C444, Cmono.
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass
from fractions import Fraction
from pathlib import Path
from typing import BinaryIO, Iterator, Optional, Tuple, Union

import numpy as np

from framewright_tpu.errors import MediaFormatError
from framewright_tpu.io import color as _color

_MAGIC = b"YUV4MPEG2"


def _plane_shapes(cs: str, w: int, h: int):
    base = cs.split()[0]
    if base.startswith("420"):
        return (h, w), (h // 2, w // 2), (h // 2, w // 2)
    if base.startswith("422"):
        return (h, w), (h, w // 2), (h, w // 2)
    if base.startswith("444"):
        return (h, w), (h, w), (h, w)
    if base.startswith("mono"):
        return (h, w), None, None
    raise MediaFormatError(f"Unsupported Y4M colorspace C{cs}")


@dataclass
class Y4MHeader:
    width: int
    height: int
    fps: Fraction
    interlace: str = "p"
    aspect: str = "1:1"
    colorspace: str = "420jpeg"

    def to_line(self) -> bytes:
        parts = [
            _MAGIC.decode(),
            f"W{self.width}",
            f"H{self.height}",
            f"F{self.fps.numerator}:{self.fps.denominator}",
            f"I{self.interlace}",
            f"A{self.aspect}",
            f"C{self.colorspace}",
        ]
        return (" ".join(parts) + "\n").encode()

    @classmethod
    def parse(cls, line: bytes) -> "Y4MHeader":
        toks = line.decode("ascii", "replace").strip().split()
        if not toks or toks[0] != _MAGIC.decode():
            raise MediaFormatError("Not a YUV4MPEG2 stream")
        kw: dict = {"width": 0, "height": 0, "fps": Fraction(25, 1)}
        for tok in toks[1:]:
            tag, val = tok[0], tok[1:]
            if tag == "W":
                kw["width"] = int(val)
            elif tag == "H":
                kw["height"] = int(val)
            elif tag == "F":
                num, den = val.split(":")
                kw["fps"] = Fraction(int(num), int(den))
            elif tag == "I":
                kw["interlace"] = val
            elif tag == "A":
                kw["aspect"] = val
            elif tag == "C":
                kw["colorspace"] = val
        if kw["width"] <= 0 or kw["height"] <= 0:
            raise MediaFormatError("Y4M header missing W/H")
        return cls(**kw)


class Y4MReader:
    """Sequential frame reader yielding RGB uint8 (H, W, 3) arrays."""

    def __init__(self, src: Union[str, Path, BinaryIO], full_range: Optional[bool] = None):
        if hasattr(src, "read"):
            self._f: BinaryIO = src  # type: ignore[assignment]
            self._owns = False
        else:
            self._f = open(src, "rb")
            self._owns = True
        line = self._f.readline(256)
        self.header = Y4MHeader.parse(line)
        self._shapes = _plane_shapes(self.header.colorspace, self.header.width, self.header.height)
        # jpeg-suffixed 420 is full range by convention; others limited
        if full_range is None:
            full_range = "jpeg" in self.header.colorspace
        self.full_range = full_range
        self._frame_bytes = sum(s[0] * s[1] for s in self._shapes if s)
        self.frames_read = 0

    @property
    def width(self) -> int:
        return self.header.width

    @property
    def height(self) -> int:
        return self.header.height

    @property
    def fps(self) -> float:
        return float(self.header.fps)

    def read_frame(self) -> Optional[np.ndarray]:
        line = self._f.readline(256)
        if not line:
            return None
        if not line.startswith(b"FRAME"):
            raise MediaFormatError(f"Expected FRAME marker, got {line[:20]!r}")
        raw = self._f.read(self._frame_bytes)
        if len(raw) != self._frame_bytes:
            raise MediaFormatError("Truncated Y4M frame")
        ys, us, vs = self._shapes
        off = ys[0] * ys[1]
        y = np.frombuffer(raw, np.uint8, count=off).reshape(ys)
        if us is None:
            rgb = np.repeat(y[..., None], 3, axis=-1)
        else:
            ulen = us[0] * us[1]
            u = np.frombuffer(raw, np.uint8, count=ulen, offset=off).reshape(us)
            v = np.frombuffer(raw, np.uint8, count=ulen, offset=off + ulen).reshape(vs)
            if us[0] * 2 == ys[0]:  # 4:2:0 -> native fast path available
                from framewright_tpu import native

                rgb = native.yuv420_to_rgb(y, u, v, full_range=self.full_range)
            else:
                rgb = _color.yuv420_to_rgb(y, u, v, full_range=self.full_range)
        self.frames_read += 1
        return rgb

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            frame = self.read_frame()
            if frame is None:
                return
            yield frame

    def count_frames(self) -> int:
        """Count frames without decoding (seekable streams only)."""
        pos = self._f.tell()
        n = 0
        while True:
            line = self._f.readline(256)
            if not line:
                break
            if not line.startswith(b"FRAME"):
                raise MediaFormatError("Corrupt Y4M stream while counting")
            self._f.seek(self._frame_bytes, os.SEEK_CUR)
            n += 1
        self._f.seek(pos)
        return n

    def close(self) -> None:
        if self._owns:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Y4MWriter:
    """Sequential frame writer taking RGB uint8 (H, W, 3) arrays."""

    def __init__(
        self,
        dst: Union[str, Path, BinaryIO],
        width: int,
        height: int,
        fps: Union[float, Fraction] = 25,
        colorspace: str = "420jpeg",
        full_range: Optional[bool] = None,
        append: bool = False,
    ):
        if width % 2 or height % 2:
            if colorspace.startswith("420"):
                raise MediaFormatError("4:2:0 requires even dimensions")
        self.frames_written = 0
        if hasattr(dst, "write"):
            self._f: BinaryIO = dst  # type: ignore[assignment]
            self._owns = False
            append = False
        else:
            dst = Path(dst)
            dst.parent.mkdir(parents=True, exist_ok=True)
            if append and dst.exists() and dst.stat().st_size > 0:
                # checkpoint-resume path: validate the existing header
                # matches, count frames already present, continue
                with Y4MReader(dst) as existing:
                    if (existing.width, existing.height) != (width, height):
                        raise MediaFormatError(
                            "resume dims mismatch: existing "
                            f"{existing.width}x{existing.height} vs {width}x{height}"
                        )
                    self.frames_written = existing.count_frames()
                self._f = open(dst, "ab")
                self._owns = True
                fps = Fraction(fps).limit_denominator(65536)
                self.header = Y4MHeader(width, height, fps, colorspace=colorspace)
                if full_range is None:
                    full_range = "jpeg" in colorspace
                self.full_range = full_range
                return
            self._f = open(dst, "wb")
            self._owns = True
        fps = Fraction(fps).limit_denominator(65536)
        self.header = Y4MHeader(width, height, fps, colorspace=colorspace)
        if full_range is None:
            full_range = "jpeg" in colorspace
        self.full_range = full_range
        self._f.write(self.header.to_line())

    def write_frame(self, rgb: np.ndarray) -> None:
        h, w = self.header.height, self.header.width
        if rgb.shape[:2] != (h, w):
            raise MediaFormatError(
                f"Frame shape {rgb.shape[:2]} != writer dims {(h, w)}"
            )
        self._f.write(b"FRAME\n")
        cs = self.header.colorspace
        if cs.startswith("mono"):
            y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
            self._f.write(np.clip(y + 0.5, 0, 255).astype(np.uint8).tobytes())
        elif cs.startswith("444"):
            # store as YUV444
            yf = rgb.astype(np.float32)
            y = 0.299 * yf[..., 0] + 0.587 * yf[..., 1] + 0.114 * yf[..., 2]
            u = (yf[..., 2] - y) / 1.772 + 128.0
            v = (yf[..., 0] - y) / 1.402 + 128.0
            for p in (y, u, v):
                self._f.write(np.clip(p + 0.5, 0, 255).astype(np.uint8).tobytes())
        else:
            from framewright_tpu import native

            y, u, v = native.rgb_to_yuv420(rgb, full_range=self.full_range)
            self._f.write(y.tobytes())
            self._f.write(u.tobytes())
            self._f.write(v.tobytes())
        self.frames_written += 1

    def write_yuv_frame(self, y: np.ndarray, u: np.ndarray,
                        v: np.ndarray) -> None:
        """Write pre-converted planar YUV420 (device-side CSC fast
        path: the SR tail emits planes directly, halving the
        device→host transfer and skipping the host conversion)."""
        h, w = self.header.height, self.header.width
        if not self.header.colorspace.startswith("420"):
            raise MediaFormatError(
                f"write_yuv_frame needs a 420 colorspace, have "
                f"{self.header.colorspace}")
        if y.shape != (h, w) or u.shape != (h // 2, w // 2) \
                or v.shape != (h // 2, w // 2):
            raise MediaFormatError(
                f"YUV plane shapes {y.shape}/{u.shape}/{v.shape} do not "
                f"match {w}x{h} 4:2:0")
        self._f.write(b"FRAME\n")
        self._f.write(np.ascontiguousarray(y, np.uint8).tobytes())
        self._f.write(np.ascontiguousarray(u, np.uint8).tobytes())
        self._f.write(np.ascontiguousarray(v, np.uint8).tobytes())
        self.frames_written += 1

    def close(self) -> None:
        self._f.flush()
        if self._owns:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
