"""Error taxonomy for framewright-tpu.

Equivalent capability to the reference's ``core/errors.py:62-1678``
(FramewrightError tree, TransientError-vs-FatalError split,
``classify_error`` from backend messages, retry decorators with
exponential backoff) — redesigned for an in-process JAX runtime where
the failure surface is XLA compilation, device OOM (HBM), host I/O and
media parsing, rather than subprocess stderr scraping.
"""

from __future__ import annotations

import functools
import logging
import random
import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Type

logger = logging.getLogger(__name__)


class FramewrightError(Exception):
    """Base class for all framework errors."""

    def __init__(self, message: str, *, details: Optional[dict] = None):
        super().__init__(message)
        self.message = message
        self.details = details or {}

    def to_dict(self) -> dict:
        return {
            "type": type(self).__name__,
            "message": self.message,
            "details": self.details,
        }


class TransientError(FramewrightError):
    """Recoverable error — retry (possibly with reduced resources)."""


class FatalError(FramewrightError):
    """Unrecoverable error — abort the stage or job."""


# --- Configuration / input errors -------------------------------------------

class ConfigError(FatalError):
    """Invalid configuration value or combination."""


class InputError(FatalError):
    """Bad user input (missing file, unsupported format)."""


class MediaFormatError(InputError):
    """Could not parse a media container or frame file."""


class DependencyError(FatalError):
    """A required optional dependency (e.g. ffmpeg binary) is missing."""


# --- Device / memory errors --------------------------------------------------

class DeviceError(FramewrightError):
    """Problem with the accelerator device."""


class HBMError(TransientError, DeviceError):
    """Device out-of-memory. Analog of the reference's VRAMError
    (``core/errors.py``): the tile/batch planner reacts by shrinking the
    working set and retrying."""


class CompilationError(FatalError, DeviceError):
    """XLA failed to compile the program (usually a shape/dtype bug)."""


class DeviceUnavailableError(FatalError, DeviceError):
    """No usable accelerator and CPU fallback was not permitted."""


# --- Pipeline / runtime errors ------------------------------------------------

class StageError(FramewrightError):
    """A pipeline stage failed."""

    def __init__(self, message: str, *, stage: str = "", **kw):
        super().__init__(message, **kw)
        self.stage = stage
        self.details.setdefault("stage", stage)


class CheckpointError(TransientError):
    """Checkpoint read/write failure."""


class ValidationError(FramewrightError):
    """Output failed quality gates (PSNR/SSIM below thresholds)."""


class DiskSpaceError(TransientError):
    """Insufficient free disk for intermediate artifacts."""


class CancelledError(FramewrightError):
    """Job was cancelled by the user."""


class ModelError(FatalError):
    """Model weights missing/corrupt or architecture mismatch."""


class ShardingError(FatalError):
    """Invalid mesh/sharding configuration for the requested run."""


# --- Classification -----------------------------------------------------------

# Substring → exception class. XLA/JAX runtime errors arrive as RuntimeError /
# XlaRuntimeError with messages; we map the known signatures. This replaces the
# reference's subprocess-stderr classifier (core/errors.py `classify_error`).
_CLASSIFIERS: list[tuple[tuple[str, ...], Type[FramewrightError]]] = [
    (("resource exhausted", "out of memory", "oom", "allocat"), HBMError),
    # "http 500"/"tpu_compile": the axon remote compile server's crash
    # signature on oversized kernels (PERF.md "compiler fragility";
    # repro scripts/probe_compiler_crashes.py) — the SR processor
    # downshifts the frame batch on these
    (("mosaic", "lowering", "unsupported", "http 500", "tpu_compile",
      "compilation failure"), CompilationError),
    (("no such file", "not found", "does not exist"), InputError),
    (("no space left", "disk full"), DiskSpaceError),
    (("permission denied",), FatalError),
    (("connection", "timeout", "timed out", "unavailable"), TransientError),
]


def classify_error(exc: BaseException) -> FramewrightError:
    """Wrap an arbitrary exception in the framework taxonomy.

    Already-classified errors pass through unchanged.
    """
    if isinstance(exc, FramewrightError):
        return exc
    msg = str(exc)
    low = msg.lower()
    for needles, cls in _CLASSIFIERS:
        if any(n in low for n in needles):
            return cls(msg, details={"original_type": type(exc).__name__})
    return FramewrightError(msg, details={"original_type": type(exc).__name__})


def is_transient(exc: BaseException) -> bool:
    return isinstance(classify_error(exc), TransientError)


# --- Retry machinery ------------------------------------------------------------

@dataclass
class RetryPolicy:
    """Exponential backoff with jitter; retries only transient errors.

    Same contract as the reference's retry decorators (core/errors.py),
    with an ``on_retry`` hook the restorer uses to downshift tile size
    after an HBMError (reference behavior: restorer.py:1737-1767).
    """

    max_attempts: int = 3
    base_delay: float = 0.5
    max_delay: float = 30.0
    backoff: float = 2.0
    jitter: float = 0.1
    retry_on: tuple = (TransientError,)
    on_retry: Optional[Callable[[int, BaseException], None]] = None

    def delay_for(self, attempt: int) -> float:
        d = min(self.base_delay * (self.backoff ** attempt), self.max_delay)
        return d * (1.0 + random.uniform(-self.jitter, self.jitter))

    def run(self, fn: Callable, *args, **kwargs):
        last: Optional[BaseException] = None
        for attempt in range(self.max_attempts):
            try:
                return fn(*args, **kwargs)
            except Exception as exc:  # noqa: BLE001
                err = classify_error(exc)
                last = err
                if not isinstance(err, self.retry_on) or attempt == self.max_attempts - 1:
                    raise err from exc
                if self.on_retry is not None:
                    self.on_retry(attempt, err)
                delay = self.delay_for(attempt)
                logger.warning(
                    "transient error (attempt %d/%d), retrying in %.2fs: %s",
                    attempt + 1, self.max_attempts, delay, err,
                )
                time.sleep(delay)
        raise last  # pragma: no cover - unreachable


def with_retry(policy: Optional[RetryPolicy] = None):
    """Decorator form of :class:`RetryPolicy`."""

    pol = policy or RetryPolicy()

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            return pol.run(fn, *args, **kwargs)

        return wrapper

    return deco


@dataclass
class ErrorReport:
    """Aggregate errors across a run for end-of-job reporting
    (analog of the reference's ErrorReport aggregation)."""

    errors: list = field(default_factory=list)

    def record(self, exc: BaseException, *, stage: str = "", frame: Optional[int] = None):
        err = classify_error(exc)
        self.errors.append(
            {
                "stage": stage,
                "frame": frame,
                "type": type(err).__name__,
                "message": err.message,
                "transient": isinstance(err, TransientError),
            }
        )

    @property
    def count(self) -> int:
        return len(self.errors)

    def summary(self) -> dict:
        by_type: dict[str, int] = {}
        for e in self.errors:
            by_type[e["type"]] = by_type.get(e["type"], 0) + 1
        return {"total": self.count, "by_type": by_type}
