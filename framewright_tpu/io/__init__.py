"""Media I/O: containers, frame sequences, color conversion, prefetch.

The reference framework's dataflow is PNG-per-frame directories written
and read by external binaries (restorer.py:1110-1138). Here the unit of
I/O is a numpy RGB frame batch headed for device HBM; container support:

- Y4M (YUV4MPEG2): self-contained pure-Python reader/writer, lossless,
  streamable, understood by ffmpeg/mpv — the default interchange format
  on hosts without ffmpeg.
- PNG/frame directories via PIL/imageio (reference-compatible layout).
- ffmpeg rawvideo pipes when the binary is present (production hosts):
  decode any container straight into the frame ring buffer.
"""

from framewright_tpu.io.video import (  # noqa: F401
    VideoMeta,
    open_reader,
    open_writer,
    probe,
)
from framewright_tpu.io.y4m import Y4MReader, Y4MWriter  # noqa: F401
from framewright_tpu.io.png_seq import FrameDirReader, FrameDirWriter  # noqa: F401
