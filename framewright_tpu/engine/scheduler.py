"""Priority job scheduler with a worker thread.

Capability parity with the reference's engine/scheduler.py:386-1156
(JobScheduler: priority queue, submit/cancel/pause/resume/retry,
persistence, statistics, event callbacks). Persistence rides the SQLite
JobStore; execution defaults to VideoRestorer.
"""

from __future__ import annotations

import heapq
import itertools
import logging
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

from framewright_tpu.events import EventBus, EventType
from framewright_tpu.persistence import JobRecord, JobStore

logger = logging.getLogger(__name__)


@dataclass(order=True)
class _QueueEntry:
    sort_key: tuple
    job_id: str = field(compare=False)


class JobScheduler:
    """Single-worker priority scheduler (higher priority first, FIFO
    within a priority level)."""

    def __init__(self, store: JobStore,
                 process_fn: Optional[Callable[[JobRecord], None]] = None,
                 events: Optional[EventBus] = None,
                 max_retries: int = 1):
        self.store = store
        self.events = events or EventBus()
        self.max_retries = max_retries
        self._counter = itertools.count()
        self._heap: List[_QueueEntry] = []
        self._priorities: Dict[str, int] = {}
        self._retries: Dict[str, int] = {}
        self._cancelled: set = set()
        self._paused = threading.Event()
        self._stop = threading.Event()
        self._cv = threading.Condition()
        self._thread: Optional[threading.Thread] = None
        self._process_fn = process_fn or self._default_process
        self.stats = {"completed": 0, "failed": 0, "cancelled": 0, "retried": 0}

    @staticmethod
    def _default_process(job: JobRecord) -> None:
        from framewright_tpu.config import Config
        from framewright_tpu.restorer import VideoRestorer

        cfg = Config.from_dict(job.config) if job.config else Config()
        VideoRestorer(cfg).restore_video(job.source, output=job.output or None)

    # ------------------------------------------------------------------
    def submit(self, source: str, output: str = "", config: Optional[dict] = None,
               priority: int = 50) -> str:
        jid = self.store.create_job(source, output, config=config or {})
        with self._cv:
            self._priorities[jid] = priority
            heapq.heappush(self._heap, _QueueEntry(
                (-priority, next(self._counter)), jid))
            self._cv.notify()
        return jid

    def cancel(self, job_id: str) -> None:
        with self._cv:
            self._cancelled.add(job_id)
        self.store.set_state(job_id, "cancelled")
        self.stats["cancelled"] += 1

    def pause(self) -> None:
        self._paused.set()

    def resume(self) -> None:
        self._paused.clear()
        with self._cv:
            self._cv.notify()

    # ------------------------------------------------------------------
    def start(self) -> None:
        self._thread = threading.Thread(target=self._worker_loop, daemon=True,
                                        name="fw-scheduler")
        self._thread.start()

    def stop(self, wait: bool = True) -> None:
        self._stop.set()
        with self._cv:
            self._cv.notify_all()
        if wait and self._thread:
            self._thread.join(timeout=10)

    def _next_job(self, timeout: float) -> Optional[str]:
        with self._cv:
            deadline = time.time() + timeout
            while not self._stop.is_set():
                while self._heap:
                    entry = heapq.heappop(self._heap)
                    if entry.job_id not in self._cancelled:
                        return entry.job_id
                remaining = deadline - time.time()
                if remaining <= 0:
                    return None
                self._cv.wait(remaining)
            return None

    def _worker_loop(self) -> None:
        while not self._stop.is_set():
            if self._paused.is_set():
                time.sleep(0.05)
                continue
            jid = self._next_job(timeout=0.2)
            if jid is None:
                continue
            job = self.store.get_job(jid)
            if job is None:
                continue
            self.store.set_state(jid, "running")
            self.events.emit(EventType.JOB_STARTED, job_id=jid)
            try:
                self._process_fn(job)
                self.store.set_state(jid, "completed")
                self.stats["completed"] += 1
                self.events.emit(EventType.JOB_COMPLETED, job_id=jid)
            except Exception as exc:  # noqa: BLE001
                retries = self._retries.get(jid, 0)
                if retries < self.max_retries:
                    self._retries[jid] = retries + 1
                    self.stats["retried"] += 1
                    # requeue BEFORE flipping the state so wait_idle
                    # never observes an empty queue mid-retry
                    with self._cv:
                        heapq.heappush(self._heap, _QueueEntry(
                            (-self._priorities.get(jid, 50), next(self._counter)),
                            jid))
                        self._cv.notify()
                    self.store.set_state(jid, "pending")
                else:
                    logger.exception("job %s failed", jid)
                    self.store.set_state(jid, "failed", error=str(exc))
                    self.stats["failed"] += 1
                    self.events.emit(EventType.JOB_FAILED, job_id=jid,
                                     error=str(exc))

    def wait_idle(self, timeout: float = 30.0) -> bool:
        """Block until the queue drains (tests/CLI)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            with self._cv:
                empty = not self._heap
            running = bool(self.store.list_jobs("running"))
            if empty and not running:
                return True
            time.sleep(0.05)
        return False
