"""Multi-host coordination: chunk mailboxes over a shared filesystem.

The reference's render farm (distributed/coordinator.py:97-496,
worker.py:147-640, discovery.py:109-477) coordinates nodes with UDP
multicast discovery plus shared-filesystem JSON assignment/result
mailboxes, merging chunk outputs with ffmpeg concat. For TPU pods the
intra-slice path is jax.sharding (distributor.py); ACROSS slices/jobs
this module keeps the reference's battle-tested shared-FS design — it
needs no extra network stack, survives worker crashes (stale
reassignment), and is trivially testable.

Layout under work_dir/:
    job.json                     job spec (source, config hash, chunks)
    assignments/chunk_<i>.json   chunk -> worker claims (atomic create)
    results/chunk_<i>.json       completion records
    heartbeats/<worker>.json     liveness (mtime = last beat)
    parts/chunk_<i>.y4m          chunk outputs, concatenated at the end
"""

from __future__ import annotations

import json
import logging
import os
import socket
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional

from framewright_tpu.errors import FramewrightError
from framewright_tpu.parallel.distributor import ChunkState, FrameChunk, make_scene_chunks

logger = logging.getLogger(__name__)


@dataclass
class RenderJob:
    job_id: str
    source: str
    output: str
    config: Dict
    total_frames: int
    chunk_frames: int = 100
    scene_boundaries: List[int] = field(default_factory=list)

    def chunks(self) -> List[FrameChunk]:
        return make_scene_chunks(self.total_frames, self.chunk_frames,
                                 self.scene_boundaries)


class SharedDirCoordinator:
    """Coordinator side: publish the job, watch results, reassign stale
    chunks, merge parts when complete."""

    def __init__(self, work_dir: Path, heartbeat_timeout: float = 60.0):
        self.work_dir = Path(work_dir)
        self.heartbeat_timeout = heartbeat_timeout
        for sub in ("assignments", "results", "heartbeats", "parts"):
            (self.work_dir / sub).mkdir(parents=True, exist_ok=True)

    def submit(self, job: RenderJob) -> None:
        (self.work_dir / "job.json").write_text(json.dumps(asdict(job), indent=2))

    def load_job(self) -> RenderJob:
        p = self.work_dir / "job.json"
        if not p.exists():
            raise FramewrightError(
                f"no farm job published in {self.work_dir} (missing job.json)")
        return RenderJob(**json.loads(p.read_text()))

    # ------------------------------------------------------------------
    def chunk_status(self, n_chunks: int) -> Dict[int, str]:
        status = {}
        for i in range(n_chunks):
            if (self.work_dir / "results" / f"chunk_{i}.json").exists():
                status[i] = "done"
            elif (self.work_dir / "assignments" / f"chunk_{i}.json").exists():
                status[i] = "assigned"
            else:
                status[i] = "pending"
        return status

    def live_workers(self) -> List[str]:
        now = time.time()
        out = []
        for p in (self.work_dir / "heartbeats").glob("*.json"):
            if now - p.stat().st_mtime < self.heartbeat_timeout:
                out.append(p.stem)
        return out

    def reassign_stale(self) -> int:
        """Delete assignment claims whose worker heartbeat went stale."""
        live = set(self.live_workers())
        n = 0
        for p in (self.work_dir / "assignments").glob("chunk_*.json"):
            idx = p.stem.split("_")[1]
            if (self.work_dir / "results" / f"chunk_{idx}.json").exists():
                continue
            try:
                claim = json.loads(p.read_text())
            except json.JSONDecodeError:
                continue
            if claim.get("worker") not in live:
                p.unlink(missing_ok=True)
                n += 1
        if n:
            logger.info("reassigned %d stale chunks", n)
        return n

    def is_complete(self, n_chunks: int) -> bool:
        return all(v == "done" for v in self.chunk_status(n_chunks).values())

    def merge(self, job: RenderJob) -> Path:
        """Concatenate chunk outputs in order (y4m parts append
        losslessly; the reference used ffmpeg concat)."""
        from framewright_tpu.io.y4m import Y4MReader, Y4MWriter

        chunks = job.chunks()
        out = Path(job.output)
        writer: Optional[Y4MWriter] = None
        for c in chunks:
            part = self.work_dir / "parts" / f"chunk_{c.index}.y4m"
            if not part.exists():
                raise FramewrightError(f"missing part for chunk {c.index}")
            with Y4MReader(part) as r:
                if writer is None:
                    writer = Y4MWriter(out, r.width, r.height, fps=r.fps)
                for frame in r:
                    writer.write_frame(frame)
        if writer is not None:
            writer.close()
        return out


class SharedDirWorker:
    """Worker side: claim chunks atomically, process, report, heartbeat."""

    def __init__(self, work_dir: Path, worker_id: Optional[str] = None):
        self.work_dir = Path(work_dir)
        self.worker_id = worker_id or f"{socket.gethostname()}-{os.getpid()}"

    def heartbeat(self) -> None:
        p = self.work_dir / "heartbeats" / f"{self.worker_id}.json"
        p.write_text(json.dumps({"worker": self.worker_id, "ts": time.time()}))

    def claim_chunk(self, chunks: List[FrameChunk]) -> Optional[FrameChunk]:
        """Atomic claim via O_CREAT|O_EXCL — first writer wins."""
        for c in chunks:
            if (self.work_dir / "results" / f"chunk_{c.index}.json").exists():
                continue
            path = self.work_dir / "assignments" / f"chunk_{c.index}.json"
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                continue
            with os.fdopen(fd, "w") as f:
                json.dump({"worker": self.worker_id, "ts": time.time(),
                           "chunk": c.index}, f)
            c.state = ChunkState.ASSIGNED
            c.worker = self.worker_id
            return c
        return None

    def report(self, chunk: FrameChunk, ok: bool, **info) -> None:
        path = self.work_dir / "results" / f"chunk_{chunk.index}.json"
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps({
            "chunk": chunk.index, "worker": self.worker_id,
            "ok": ok, "ts": time.time(), **info,
        }))
        os.replace(tmp, path)

    def part_path(self, chunk: FrameChunk) -> Path:
        return self.work_dir / "parts" / f"chunk_{chunk.index}.y4m"

    # ------------------------------------------------------------------
    def work_loop(
        self,
        job: RenderJob,
        process_chunk: Callable[[FrameChunk, Path], None],
        poll_s: float = 0.5,
        max_chunks: Optional[int] = None,
    ) -> int:
        """Claim-process-report until no chunks remain. process_chunk
        writes the chunk's frames to the given part path."""
        chunks = job.chunks()
        done = 0
        while max_chunks is None or done < max_chunks:
            self.heartbeat()
            c = self.claim_chunk(chunks)
            if c is None:
                status = {p.stem for p in (self.work_dir / "results").glob("chunk_*.json")}
                if len(status) >= len(chunks):
                    break
                time.sleep(poll_s)
                continue
            try:
                process_chunk(c, self.part_path(c))
                self.report(c, ok=True, frames=c.n_frames)
                done += 1
            except Exception as exc:  # noqa: BLE001
                logger.exception("chunk %d failed", c.index)
                self.report(c, ok=False, error=str(exc))
                raise
        return done


# ---------------------------------------------------------------------------
# Live chunk execution (what remote/burst workers actually run)
# ---------------------------------------------------------------------------

def make_chunk_processor(job: RenderJob):
    """Build the ``process_chunk(chunk, part_path)`` callable that farm
    and cloud-burst workers run: extract the chunk's frame range from
    the (shared-mount) source, restore it with the job's config, and
    write the part. The reference's RenderWorker did the same via
    ffmpeg segment extraction (distributed/worker.py:438)."""
    from framewright_tpu.config import Config
    from framewright_tpu.io.y4m import Y4MReader, Y4MWriter

    def process_chunk(chunk: FrameChunk, part_path: Path) -> None:
        import tempfile

        from framewright_tpu.restorer import VideoRestorer

        part_path.parent.mkdir(parents=True, exist_ok=True)
        with tempfile.TemporaryDirectory(prefix="fw_chunk_") as td:
            slice_path = Path(td) / f"slice_{chunk.index}.y4m"
            with Y4MReader(job.source) as r:
                w = Y4MWriter(slice_path, r.width, r.height, fps=r.fps)
                for i, frame in enumerate(r):
                    if i >= chunk.end:
                        break
                    if i >= chunk.start:
                        w.write_frame(frame)
                w.close()
            cfg_dict = dict(job.config)
            cfg_dict.setdefault("checkpoint_enabled", False)
            cfg_dict.setdefault("validate_output", False)
            cfg_dict["project_dir"] = str(Path(td) / "proj")
            cfg = Config(**cfg_dict)
            VideoRestorer(cfg).restore_video(slice_path, output=part_path)

    return process_chunk


def run_worker(work_dir: Path, worker_id: Optional[str] = None,
               poll_s: float = 0.5, wait_job_s: float = 30.0) -> int:
    """Entry point for a farm/burst worker process: wait for job.json,
    then claim-and-restore chunks until the job is drained."""
    coord = SharedDirCoordinator(work_dir)
    t0 = time.time()
    while not (Path(work_dir) / "job.json").exists():
        if time.time() - t0 > wait_job_s:
            raise FramewrightError(f"no job.json in {work_dir}")
        time.sleep(poll_s)
    job = coord.load_job()
    worker = SharedDirWorker(work_dir, worker_id)
    return worker.work_loop(job, make_chunk_processor(job), poll_s=poll_s)


def run_coordinator(work_dir: Path, job: RenderJob,
                    timeout: float = 86400.0, poll_s: float = 1.0,
                    progress: Optional[Callable[[Dict[int, str]], None]] = None,
                    ) -> Path:
    """Publish the job, watch/reassign until all chunks are done, merge.
    Workers (farm hosts or burst instances) attach to work_dir."""
    coord = SharedDirCoordinator(work_dir)
    coord.submit(job)
    n = len(job.chunks())
    t0 = time.time()
    while True:
        if coord.is_complete(n):
            break
        coord.reassign_stale()
        if progress is not None:
            progress(coord.chunk_status(n))
        if time.time() - t0 > timeout:
            raise FramewrightError(
                f"farm job timed out with {coord.chunk_status(n)}")
        time.sleep(poll_s)
    return coord.merge(job)
