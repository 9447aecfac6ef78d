#!/usr/bin/env python
"""Break down the WARM e2e first-frame latency (BENCH e2e_first_frame_s).

Round 5 cut the cold 396.8 s first frame to 78.6 s via the persistent
XLA cache (warmup.default_cache_dir + the warmup verb); the VERDICT r4
bar is <60 s. This probe replays bench.py's e2e with wall-clock marks
around every pre-first-frame phase so the remaining budget can be
attributed (restorer/model init, planner, cache deserialization inside
the first jit call, tunnel D2H of the first batch).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python -u scripts/probe_e2e_warm.py
"""

import logging
import os
import sys
import tempfile
import time

import numpy as np

T0 = time.time()


def mark(label):
    print(f"[{time.time() - T0:7.1f}s] {label}", flush=True)


def main():
    logging.basicConfig(level=logging.INFO, format="%(relativeCreated)8.0f ms %(name)s %(message)s")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache_dir = os.path.join(repo, ".fw_bench_xla_cache")
    mark("import framewright_tpu ...")
    from framewright_tpu.config import Config
    from framewright_tpu.io.y4m import Y4MWriter
    from framewright_tpu.restorer import VideoRestorer
    mark("imports done")

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "clip.y4m")
        rng_ = np.random.default_rng(0)
        base = (rng_.random((1080, 1920 * 2, 3)) * 255).astype(np.uint8)
        with Y4MWriter(src, width=1920, height=1080, fps=25) as wtr:
            for t in range(16):
                wtr.write_frame(base[:, t * 16:t * 16 + 1920])
        mark("source clip written")

        stamps = []

        def cb(info):
            if info.stage == "enhance" and info.frames_done > 0 and (
                    not stamps or info.frames_done > stamps[-1][0]):
                stamps.append((info.frames_done, time.time()))
                mark(f"enhance progress: {info.frames_done} frames")

        cfg_e = Config(
            project_dir=os.path.join(td, "proj"),
            sr_model="RealESRGAN_x2plus", scale_factor=2,
            compute_dtype="bfloat16", validate_output=False,
            xla_cache_dir=cache_dir,
        )
        mark("config built")
        t_run = time.time()
        r = VideoRestorer(cfg_e, progress_callback=cb)
        mark("VideoRestorer constructed")
        r.restore_video(src, output=os.path.join(td, "out.y4m"))
        mark("restore_video returned")
        if stamps:
            print(f"first_frame_s: {stamps[0][1] - t_run:.1f}  "
                  f"total_s: {time.time() - t_run:.1f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
