#!/usr/bin/env python
"""Headline benchmark: Real-ESRGAN RRDB 1080p -> 4K frames/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Baseline: the reference's published ~0.1 s/frame (~10 fps) GAN SR
figure on an unspecified GPU (reference docs/roadmap.md:116;
BASELINE.md). North star: >= 8 fps/chip on TPU v5e.

Runs the production fast path (fused Pallas RDB body) on the real
device; on CPU-only hosts falls back to a tiny proxy so the harness
still emits a line (flagged in the payload).
"""

import json
import sys
import time

import numpy as np


def _probe_platform(timeout_s: float = 300.0) -> str:
    """Probe backend init in a THROWAWAY subprocess with a timeout.

    Returns "tpu", "cpu", or "wedged". The axon dev tunnel can wedge
    hard (device grant lost server-side; PERF.md ops note) — in that
    state ``jax.devices()`` blocks forever in a claim-retry loop
    regardless of JAX_PLATFORMS (the plugin ignores the env var), which
    would hang the whole bench. A hung probe child is killed and we
    fall back to the CPU proxy (flagged in the payload) instead."""
    import subprocess
    import sys as _sys

    try:
        r = subprocess.run(
            [_sys.executable, "-c",
             "import jax; print('PLATFORM=' + jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        out = r.stdout or ""
        if "PLATFORM=tpu" in out:
            return "tpu"
        if "PLATFORM=" in out:
            return "cpu"
        return "wedged"
    except Exception:  # noqa: BLE001 — timeout/spawn failure == unreachable
        return "wedged"


def main() -> int:
    import os

    tpu_wedged = _probe_platform() == "wedged"
    if tpu_wedged:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp

    if tpu_wedged:
        # config-level force: the axon plugin ignores the env var
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001
            pass

    # persistent compilation cache: the S=112 kernels take minutes on
    # the remote compile server; cache hits make repeat benches ~60 s
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".xla_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax: cache is best-effort
        pass

    from framewright_tpu.models import rrdb

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    if on_tpu:
        h, w, blocks, reps = 1080, 1920, 23, 10
    else:
        # CPU proxy: tiny model+frame so the harness can smoke-test
        h, w, blocks, reps = 128, 160, 2, 2

    cfg = rrdb.RRDBConfig(num_block=blocks, scale=2)
    # init + param reshaping on the host CPU backend: hundreds of tiny
    # programs that would each be a remote-compile round-trip on TPU
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        fast = rrdb.make_fast_params(params)
        params = rrdb.stack_body(params)
    params, fast = jax.device_put(
        (params, fast), jax.devices(platform)[0] if on_tpu else cpu)

    x = jnp.asarray(np.random.rand(1, h, w, 3).astype(np.float32)).astype(jnp.bfloat16)

    if on_tpu:
        # out_mode="rgb_u8": the PRODUCTION output contract — the SR jit
        # ships uint8, so the headline includes the quantization (fused
        # into the tail kernel; round-5, ops/fused_tail.py out_mode)
        fwd = jax.jit(lambda p, fp, t: rrdb.apply_fast(
            p, fp, t, cfg, out_mode="rgb_u8"))
    else:
        fwd = jax.jit(lambda p, fp, t: rrdb.apply(p, t, cfg))

    def sync(t):
        # On the axon stack block_until_ready can return early for
        # committed arrays (observed: a ~2 min compile + 10 queued
        # forwards "completed" in 1 ms). Materializing a scalar always
        # waits for the producing execution.
        return float(jnp.mean(t[0, ::731, ::731, 0].astype(jnp.float32)))

    y = fwd(params, fast, x)
    sync(y)                       # warmup: wait out compile + first run

    # queue all reps, then sync on the LAST output: device execution is
    # in-order, so its scalar arriving implies every rep completed —
    # amortizes the ~25 ms host round-trip out of the measurement
    t0 = time.time()
    for _ in range(reps):
        y = fwd(params, fast, x)
    sync(y)
    dt = (time.time() - t0) / reps

    fps = 1.0 / dt
    baseline_fps = 10.0  # reference ~0.1 s/frame GAN SR claim
    result = {
        "metric": "realesrgan_x2_1080p_to_4k_fps_per_chip",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 3),
        "platform": platform,
        "proxy": not on_tpu,
        "s_per_frame": round(dt, 4),
        "batch": 1,
    }

    if on_tpu:
        # frame batching through the merge-resident body (round-4
        # sweep, scripts/bench_batch_merge.py: B=4 is 1.37x over B=1
        # bf16 — the round-2 B=2 anti-result was an artifact of the
        # per-RDB extraction working set the merge body eliminated).
        # The planner batches whole frames in production, so fps/chip
        # at the best batch IS the production per-chip rate.
        try:
            bb = 4
            xb = jnp.broadcast_to(x, (bb,) + x.shape[1:])
            yb = fwd(params, fast, xb)
            sync(yb)
            t0 = time.time()
            for _ in range(reps):
                yb = fwd(params, fast, xb)
            sync(yb)
            dtb = (time.time() - t0) / (reps * bb)
            result["b1_fps"] = result["value"]
            if 1.0 / dtb > result["value"]:
                result["value"] = round(1.0 / dtb, 3)
                result["vs_baseline"] = round(1.0 / dtb / baseline_fps, 3)
                result["s_per_frame"] = round(dtb, 4)
                result["batch"] = bb
        except Exception as exc:  # noqa: BLE001 — keep the B=1 headline
            result["batch_error"] = str(exc)[:200]
    if tpu_wedged:
        result["tpu_unreachable"] = True  # dev-tunnel wedge (PERF.md)

    if on_tpu:
        # secondary metric: the distilled 6-block fast body
        # (FW_fast6_x2, self-trained on synthetic degradations —
        # models/distill.py; quality gate in tests/test_distill.py).
        # Same bf16 fused-kernel path, ~3.8x fewer body FLOPs.
        try:
            from framewright_tpu.models import registry

            cfg6 = rrdb.RRDBConfig(num_block=6, scale=2)
            with jax.default_device(cpu):
                _, p6 = registry.init_model("FW_fast6_x2",
                                            dtype=jnp.bfloat16)
                p6 = jax.tree_util.tree_map(
                    lambda v: np.asarray(v), p6)
                fast6 = rrdb.make_fast_params(p6)
                p6 = rrdb.stack_body(p6)
            p6, fast6 = jax.device_put((p6, fast6),
                                       jax.devices(platform)[0])
            fwd6 = jax.jit(lambda p, fp, t: rrdb.apply_fast(p, fp, t, cfg6))
            y = fwd6(p6, fast6, x)
            sync(y)
            t0 = time.time()
            for _ in range(reps):
                y = fwd6(p6, fast6, x)
            sync(y)
            dt6 = (time.time() - t0) / reps
            result["distilled_fps"] = round(1.0 / dt6, 3)
            result["distilled_s_per_frame"] = round(dt6, 4)
            del p6, fast6
        except Exception as exc:  # noqa: BLE001 — secondary metric only
            result["distilled_error"] = str(exc)[:200]

        # secondary metric: the SRVGG compact fast model (FW_fastvgg_x2,
        # trained in-repo, +0.69 dB over bicubic — the reference's own
        # fast-video-model family; its realesr-animevideov3 is
        # SRVGGNetCompact). Production path: plain XLA convs with frame
        # batching (measured 22 fps/chip at B=6; the fused chain kernel
        # ops/fused_srvgg.py matches XLA's body rate but loses on tail
        # overhead — PERF.md round-3 SRVGG section).
        try:
            from framewright_tpu.models import registry, srvgg

            bv = 6
            with jax.default_device(cpu):
                specv, pv = registry.init_model(
                    "FW_fastvgg_x2", dtype=jnp.bfloat16,
                    allow_random=True)
            pv = jax.device_put(pv, jax.devices(platform)[0])
            xv = jnp.broadcast_to(x, (bv,) + x.shape[1:])
            fwdv = jax.jit(lambda p, t: srvgg.apply(
                p, t, specv.arch_config))
            y = fwdv(pv, xv)
            sync(y)
            t0 = time.time()
            for _ in range(reps):
                y = fwdv(pv, xv)
            sync(y)
            dtv = (time.time() - t0) / (reps * bv)
            result["fastvgg_fps"] = round(1.0 / dtv, 3)
            result["fastvgg_s_per_frame"] = round(dtv, 4)
            del pv
        except Exception as exc:  # noqa: BLE001 — secondary metric only
            result["fastvgg_error"] = str(exc)[:200]

        # secondary metric: the x4 compact model (FW_fastvgg_x4,
        # SRVGG-32) at the archive-restore shape 540p -> 4K. Only
        # reported once the trained checkpoint ships.
        try:
            from framewright_tpu.models import registry, srvgg

            ck4 = (registry.packaged_weights_dir()
                   / "FW_fastvgg_x4.npz")
            if ck4.exists():
                bv4 = 4
                with jax.default_device(cpu):
                    spec4, p4 = registry.init_model(
                        "FW_fastvgg_x4", dtype=jnp.bfloat16,
                        allow_random=False)
                p4 = jax.device_put(p4, jax.devices(platform)[0])
                x4 = jnp.asarray(
                    np.random.rand(bv4, 540, 960, 3).astype(np.float32)
                ).astype(jnp.bfloat16)
                fwd4 = jax.jit(lambda p, t: srvgg.apply(
                    p, t, spec4.arch_config))
                y = fwd4(p4, x4)
                sync(y)
                t0 = time.time()
                for _ in range(reps):
                    y = fwd4(p4, x4)
                sync(y)
                dt4 = (time.time() - t0) / (reps * bv4)
                result["fastvgg_x4_540p_fps"] = round(1.0 / dt4, 3)
                del p4
        except Exception as exc:  # noqa: BLE001 — secondary metric only
            result["fastvgg_x4_error"] = str(exc)[:200]

        # secondary metric: the int8 fast mode (compute_dtype=int8 —
        # the TensorRT-INT8 analog; PSNR cost bounded in
        # tests/test_int8_mode.py). Headline stays bf16-exact.
        try:
            with jax.default_device(cpu):
                p0 = rrdb.init(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.bfloat16)
            # static activation scales calibrated on the bench input —
            # production default (int8_scales="static"). Calibration
            # runs ON the accelerator (the CPU bf16 scan takes minutes)
            p_dev = jax.device_put(p0, jax.devices(platform)[0])
            sample = jnp.asarray(
                np.asarray(x[:, :256, :256], np.float32))
            amax = np.asarray(rrdb.calibrate_act_scales(p_dev, cfg, sample))
            del p_dev
            with jax.default_device(cpu):
                fast8 = rrdb.make_fast_params(p0, compute_dtype="int8",
                                              act_amax=amax)
                p0 = rrdb.stack_body(p0)
            p8, fast8 = jax.device_put((p0, fast8), jax.devices(platform)[0])
            fwd8 = jax.jit(lambda p, fp, t: rrdb.apply_fast(p, fp, t, cfg))
            y = fwd8(p8, fast8, x)
            sync(y)
            t0 = time.time()
            for _ in range(reps):
                y = fwd8(p8, fast8, x)
            sync(y)
            dt8 = (time.time() - t0) / reps
            result["int8_fps"] = round(1.0 / dt8, 3)
            result["int8_s_per_frame"] = round(dt8, 4)
            result["int8_batch"] = 1
            # int8 batching plateau is B=3 (B=4 fails to compile on the
            # axon remote compiler — scripts/bench_batch_merge.py)
            try:
                b8 = 3
                x8 = jnp.broadcast_to(x, (b8,) + x.shape[1:])
                y = fwd8(p8, fast8, x8)
                sync(y)
                t0 = time.time()
                for _ in range(reps):
                    y = fwd8(p8, fast8, x8)
                sync(y)
                dt8b = (time.time() - t0) / (reps * b8)
                if 1.0 / dt8b > result["int8_fps"]:
                    result["int8_b1_fps"] = result["int8_fps"]
                    result["int8_fps"] = round(1.0 / dt8b, 3)
                    result["int8_s_per_frame"] = round(dt8b, 4)
                    result["int8_batch"] = b8
            except Exception as exc:  # noqa: BLE001
                result["int8_batch_error"] = str(exc)[:200]
        except Exception as exc:  # noqa: BLE001 — secondary metric only
            result["int8_error"] = str(exc)[:200]

    if on_tpu:
        # measured Y4M -> Y4M end-to-end (VERDICT round-2 weak item 7:
        # "transfer fully hidden" was extrapolated): steady-state fps
        # from per-frame completion timestamps, plus time-to-first-frame
        try:
            import tempfile

            from framewright_tpu.config import Config
            from framewright_tpu.io.y4m import Y4MWriter
            from framewright_tpu.restorer import VideoRestorer

            n_frames = 16
            with tempfile.TemporaryDirectory() as td:
                src = os.path.join(td, "clip.y4m")
                rng_ = np.random.default_rng(0)
                base = (rng_.random((1080, 1920 * 2, 3)) * 255).astype(
                    np.uint8)
                with Y4MWriter(src, width=1920, height=1080, fps=25) as wtr:
                    for t in range(n_frames):
                        wtr.write_frame(base[:, t * 16:t * 16 + 1920])
                # (frames_done, time) pairs — progress may arrive in
                # batch-sized jumps, so fps must come from count deltas,
                # not from assuming one callback per frame
                stamps = []

                def cb(info):
                    if (info.stage == "enhance" and info.frames_done > 0
                            and (not stamps
                                 or info.frames_done > stamps[-1][0])):
                        stamps.append((info.frames_done, time.time()))

                # share the bench's persistent cache: the restorer's
                # default user-level cache dir also works, but pinning
                # the repo-local dir makes the bench self-contained —
                # once any bench/warmup populated it, first frame is a
                # cache load, not a ~6 min remote cold compile
                # (round-4 BENCH measured e2e_first_frame_s 397.6 on a
                # fresh tempdir project whose per-project cache was
                # always empty).
                cfg_e = Config(
                    project_dir=os.path.join(td, "proj"),
                    sr_model="RealESRGAN_x2plus", scale_factor=2,
                    compute_dtype="bfloat16", validate_output=False,
                    xla_cache_dir=cache_dir,
                )
                t_run = time.time()
                VideoRestorer(cfg_e, progress_callback=cb).restore_video(
                    src, output=os.path.join(td, "out.y4m"))
                t_total = time.time() - t_run
                if stamps and stamps[-1][0] >= n_frames:
                    half = [s for s in stamps if s[0] > n_frames // 2]
                    if len(half) >= 2:
                        steady = (half[-1][0] - half[0][0]) / max(
                            half[-1][1] - half[0][1], 1e-6)
                    else:  # one big batch: fall back to the whole run
                        steady = stamps[-1][0] / max(
                            stamps[-1][1] - t_run, 1e-6)
                    result["e2e_fps"] = round(steady, 3)
                    result["e2e_first_frame_s"] = round(
                        stamps[0][1] - t_run, 1)
                    result["e2e_total_s"] = round(t_total, 1)
        except Exception as exc:  # noqa: BLE001 — secondary metric only
            result["e2e_error"] = str(exc)[:200]

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
