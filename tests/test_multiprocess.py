"""REAL multi-process distributed execution (VERDICT round-2 item 7).

Two axes, both with actual OS processes (not env parsing or threads):

1. jax.distributed two-process bring-up through
   parallel/dcn.py:ensure_distributed + a cross-process psum over a
   global mesh (the DCN analog of the reference's NCCL process group,
   reference distributed/worker.py:147-640).
2. The shared-dir render farm with coordinator + worker as separate
   processes, including a straggler kill -> stale-claim reassignment.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env(**extra):
    # strip accelerator plugins/paths: children must be pure-CPU jax
    # (the axon TPU plugin on PYTHONPATH can stall CPU processes while
    # a TPU job is running on the shared tunnel)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra)
    return env


_PSUM_CHILD = r"""
import os, sys
sys.path.insert(0, os.getcwd())
import numpy as np
from framewright_tpu.parallel.dcn import DistributedSpec, ensure_distributed

spec = DistributedSpec.from_env()
active = ensure_distributed(spec)
assert active, "expected a multi-process runtime"

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
devs = jax.devices()
assert len(devs) == 2, devs
mesh = Mesh(np.array(devs), ("d",))
local = np.array([float(jax.process_index() + 1)], np.float32)
arr = jax.make_array_from_single_device_arrays(
    (2,), NamedSharding(mesh, P("d")),
    [jax.device_put(local, jax.local_devices()[0])])

from jax.experimental.shard_map import shard_map

f = jax.jit(shard_map(lambda x: jax.lax.psum(x, "d"), mesh=mesh,
                      in_specs=P("d"), out_specs=P()))
out = f(arr)
total = float(np.asarray(out)[0])
print(f"PSUM_RESULT process={jax.process_index()} total={total}", flush=True)
assert abs(total - 3.0) < 1e-6, total
"""


@pytest.mark.slow
def test_two_process_jax_distributed(tmp_path):
    """2 OS processes -> jax.distributed via ensure_distributed -> one
    global 2-device CPU mesh -> cross-process psum(1+2) == 3 on both."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = _child_env(
            FRAMEWRIGHT_COORDINATOR=f"127.0.0.1:{port}",
            FRAMEWRIGHT_NUM_PROCESSES="2",
            FRAMEWRIGHT_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _PSUM_CHILD], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
        assert "total=3.0" in out, out


_WORKER_CHILD = r"""
import os, sys
sys.path.insert(0, os.getcwd())
from pathlib import Path
from framewright_tpu.parallel.multihost import run_worker
run_worker(Path(sys.argv[1]), worker_id=sys.argv[2])
"""

_STRAGGLER_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from pathlib import Path
from framewright_tpu.parallel.multihost import SharedDirCoordinator, SharedDirWorker

wd = Path(sys.argv[1])
coord = SharedDirCoordinator(wd)
job = coord.load_job()
w = SharedDirWorker(wd, worker_id="straggler")
w.heartbeat()
c = w.claim_chunk(job.chunks())
assert c is not None
print(f"CLAIMED {c.index}", flush=True)
time.sleep(600)   # hang forever holding the claim
"""


@pytest.mark.slow
def test_farm_straggler_reassigned_across_processes(tmp_path, monkeypatch):
    """Coordinator + workers as SEPARATE processes: a straggler claims
    a chunk and hangs; after SIGKILL its heartbeat goes stale, the
    coordinator reassigns the claim, and a healthy worker process
    finishes the job (reference distributed heartbeat -> stale-node
    cleanup -> chunk retry, discovery.py:335)."""
    monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
    from framewright_tpu.io.y4m import Y4MReader, Y4MWriter
    from framewright_tpu.parallel.multihost import (
        RenderJob,
        SharedDirCoordinator,
    )
    from tests.conftest import make_gradient_frame

    src = tmp_path / "in.y4m"
    with Y4MWriter(src, width=48, height=32, fps=25) as w:
        for t in range(6):
            w.write_frame(make_gradient_frame(32, 48, t))
    wd = tmp_path / "job"
    job = RenderJob(
        job_id="t", source=str(src), output=str(wd / "merged.y4m"),
        config={"sr_model": "realesr-animevideov3",
                "compute_dtype": "float32", "scale_factor": 4},
        total_frames=6, chunk_frames=3,
    )
    coord = SharedDirCoordinator(wd, heartbeat_timeout=3.0)
    coord.submit(job)

    env = _child_env(FRAMEWRIGHT_WEIGHTS_DIR=str(tmp_path / "w"))
    straggler = subprocess.Popen(
        [sys.executable, "-c", _STRAGGLER_CHILD, str(wd)], env=env,
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    # wait for the straggler to claim its chunk
    deadline = time.time() + 60
    while time.time() < deadline:
        if list((wd / "assignments").glob("chunk_*.json")):
            break
        time.sleep(0.2)
        assert straggler.poll() is None, straggler.stderr.read()[-2000:]
    claims = list((wd / "assignments").glob("chunk_*.json"))
    assert claims, "straggler never claimed a chunk"

    straggler.kill()
    straggler.wait(timeout=30)
    # heartbeat goes stale -> coordinator frees the claim
    deadline = time.time() + 30
    reassigned = 0
    while time.time() < deadline and not reassigned:
        time.sleep(1.0)
        reassigned = coord.reassign_stale()
    assert reassigned >= 1, "stale claim was not reassigned"

    # a healthy worker process completes the whole job
    worker = subprocess.Popen(
        [sys.executable, "-c", _WORKER_CHILD, str(wd), "healthy"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True)
    deadline = time.time() + 560
    while time.time() < deadline:
        coord.reassign_stale()
        if coord.is_complete(len(job.chunks())):
            break
        time.sleep(1.0)
        if worker.poll() not in (None, 0):
            pytest.fail(worker.stderr.read()[-3000:])
    assert coord.is_complete(len(job.chunks())), "job never completed"
    out = coord.merge(job)
    worker.wait(timeout=60)
    with Y4MReader(out) as r:
        assert r.count_frames() == 6
        assert (r.width, r.height) == (192, 128)
    # the straggler's result must have come from the healthy worker
    results = [json.loads(p.read_text())
               for p in (wd / "results").glob("chunk_*.json")]
    assert all(r["worker"] == "healthy" for r in results)
