"""Restoration processors — the capability surface (SURVEY.md §2.D).

Each processor follows the reference's idiom (one class per op with a
Config dataclass + Result dataclass) but operates on in-memory frame
batches rather than frame directories: ``process_batch(frames) ->
frames`` is the hot API (device arrays in, device arrays out), with a
``process_video(reader, writer)`` convenience driving the ring buffer.
"""

from framewright_tpu.processors.base import (  # noqa: F401
    FrameProcessor,
    ProcessorResult,
)
