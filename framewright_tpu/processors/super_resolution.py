"""Super-resolution processor: the pipeline's hot stage.

Replaces the reference's per-frame `realesrgan-ncnn-vulkan` subprocess
loop and the PyTorch RealESRGANer path (restorer.py:1386-1601,
processors/pytorch_realesrgan.py) with one jit-compiled program: HBM
planner chooses tile/batch geometry, the tiler feeds the model (fused
Pallas body on TPU, plain conv path elsewhere), and OOM triggers the
same shrink-and-retry downshift as the reference's adaptive tile
fallback (utils/gpu.py:468, restorer.py:1737-1756).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np

from framewright_tpu import planner as planner_mod
from framewright_tpu.errors import HBMError, classify_error
from framewright_tpu.processors.base import (
    FrameProcessor,
    require_shape,
    to_float,
    to_uint8,
)

logger = logging.getLogger(__name__)


@dataclass
class SRConfig:
    model_name: str = "RealESRGAN_x2plus"
    compute_dtype: str = "bfloat16"
    tile_size: int = 0            # 0 = planner decides
    tile_overlap: int = 0         # 0 = receptive default for the family
    batch_size: int = 0           # 0 = planner decides
    sharding: str = "auto"        # auto|data|2d|none: "data" shards the
                                  # frame axis; "2d" adds height-axis
                                  # spatial sharding (frames x space
                                  # mesh — XLA inserts conv halo
                                  # exchanges over ICI)
    hbm_utilization: float = 0.85
    weights_dir: Optional[str] = None
    allow_random_weights: bool = True   # bench/test mode
    use_fused_kernel: Optional[bool] = None  # None = auto (TPU yes)
    outscale: float = 0.0         # final resize; 0 = model scale
    max_oom_retries: int = 3
    output_color: str = "rgb"     # rgb | yuv420 (device-side CSC; the
                                  # restorer enables this when writing
                                  # straight to Y4M — 1.5 B/px D2H)
    yuv_full_range: bool = False  # BT.601 limited (Y4M default)
    device_stats: bool = False    # per-frame PSNR/SSIM vs the bicubic
                                  # baseline computed INSIDE the SR jit,
                                  # so the quality gate composes with
                                  # the YUV fast path at no extra D2H
    enhancement_cap: float = 1.0  # <1 lerps output toward the plain
                                  # bicubic upscale ON DEVICE (reference
                                  # authenticity guard,
                                  # max_enhancement_strength)
    diffusion_steps: int = 0      # diffusion family: DDIM steps (0=arch)
    diffusion_strength: float = 0.0  # diffusion family: propagate_t
    int8_scales: str = "static"   # static (calibrate on the first batch,
                                  # faster) | dynamic (in-kernel absmax)
    int8_calib_margin: float = 1.25  # headroom over observed activation
                                     # ranges (static mode)


class SuperResolution(FrameProcessor):
    name = "super_resolution"

    def __init__(self, config: Optional[SRConfig] = None):
        self.config = config or SRConfig()
        self._fn = None
        self._plan = None
        self._spec = None
        self._params = None
        self._fast_params = None
        self._int8_calibrate = False

    # ------------------------------------------------------------------
    @staticmethod
    def _host_ctx():
        """Context manager placing jax ops on the host CPU backend
        (weight transforms stay off the device/tunnel); null context
        when no CPU backend exists."""
        import contextlib

        import jax

        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            return contextlib.nullcontext()
        return jax.default_device(cpu)

    def setup(self, height: int, width: int) -> None:
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models.registry import init_model
        from framewright_tpu.ops import tiling

        cfg = self.config
        # int8 fast mode: weights load/store bf16; the fused body
        # quantizes in-kernel (TensorRT-INT8 analog, reference
        # infrastructure/gpu/backends/tensorrt.py:110-455)
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                 "int8": jnp.bfloat16}.get(cfg.compute_dtype, jnp.bfloat16)
        # host numpy params: the wide/fused weight transforms below are
        # pure host work; doing them on device arrays costs one tunnel
        # D2H round trip PER WEIGHT on the axon stack (~314 s of setup,
        # scripts/probe_e2e_warm.py) — prep on host, ship ONE device_put
        spec, params = init_model(
            cfg.model_name,
            weights_dir=cfg.weights_dir,
            dtype=dtype,
            allow_random=cfg.allow_random_weights,
            device=False,
        )
        if spec.family == "diffusion" and (cfg.diffusion_steps
                                           or cfg.diffusion_strength):
            import dataclasses as _dc

            arch = spec.arch_config
            if cfg.diffusion_steps:
                arch = _dc.replace(arch, steps=cfg.diffusion_steps)
            if cfg.diffusion_strength:
                arch = _dc.replace(arch, propagate_t=cfg.diffusion_strength)
            spec = _dc.replace(spec, arch_config=arch)
        self._spec = spec
        self.scale = spec.scale

        on_tpu = jax.devices()[0].platform == "tpu"
        use_fused = cfg.use_fused_kernel
        if use_fused is None:
            # srvgg stays on plain XLA: the conv chain is a shape XLA
            # already compiles well, and frame batching scales it to
            # ~22 fps/chip at 1080p x2 vs 9.8 through the fused kernel
            # (tail/layout overheads dominate; PERF.md round-3 SRVGG
            # section). The fused chain kernel remains reachable via
            # use_fused_kernel=True (int8 mode needs it).
            use_fused = on_tpu and spec.family == "rrdb"

        host_ctx = self._host_ctx()
        if spec.family == "srvgg" and use_fused:
            from framewright_tpu.ops import fused_srvgg

            if cfg.compute_dtype == "int8":
                # static scales from the first batch, like the rrdb path
                self._int8_calibrate = True
                self._fast_params = None
            else:
                with host_ctx:
                    self._fast_params = fused_srvgg.make_fast_params(
                        params, spec.arch_config)
        if spec.family == "rrdb":
            from framewright_tpu.models import rrdb

            if use_fused:
                int8 = cfg.compute_dtype == "int8"
                if int8 and cfg.int8_scales == "static":
                    # static scales need activation ranges: calibrated
                    # on the FIRST batch (dispatch), so the kernel skips
                    # the serializing in-kernel absmax. jit is lazy —
                    # nothing compiles until the first call.
                    self._int8_calibrate = True
                    self._fast_params = None
                else:
                    with host_ctx:
                        self._fast_params = rrdb.make_fast_params(
                            params, compute_dtype="int8" if int8 else "bf16")
            with host_ctx:
                params = rrdb.stack_body(params)
        # host copy kept for later weight re-transforms (int8
        # calibration rebuilds fast params from it without pulling the
        # device copies back through the tunnel)
        self._host_params = params
        self._params = params

        overlap = cfg.tile_overlap or tiling.receptive_overlap(spec.family)
        self._plan = planner_mod.plan(
            height, width, spec.scale,
            family=spec.family, dtype=cfg.compute_dtype,
            hbm_utilization=cfg.hbm_utilization,
            tile_size_override=cfg.tile_size,
            overlap=overlap,
            max_batch=cfg.batch_size or 16,
        )
        logger.info("SR plan: %s", self._plan)

        # frame-axis data parallelism over the local mesh: the analog of
        # the reference's MultiGPUDistributor (utils/multi_gpu.py:549)
        self._mesh = None
        self._spatial = False
        if cfg.sharding in ("auto", "data", "2d") and len(jax.devices()) > 1:
            from framewright_tpu.parallel.mesh import build_mesh, frame_sharding, replicate

            nd = len(jax.devices())
            shape = ()
            if cfg.sharding == "2d" and nd % 2 == 0 and height % 2 == 0:
                # frames x space: the height axis is sharded too, so the
                # conv stencils halo-exchange over ICI (the TPU analog of
                # the reference's per-GPU spatial tiling)
                shape = (nd // 2, 2)
                self._spatial = True
            self._mesh = build_mesh(shape)
            self._frame_sharding = frame_sharding(
                self._mesh, spatial=self._spatial)
            self._params = jax.device_put(self._params, replicate(self._mesh))
            if self._fast_params is not None:
                self._fast_params = jax.device_put(
                    self._fast_params, replicate(self._mesh))
            logger.info("SR sharded over %d devices (%s)",
                        len(self._mesh.devices.flat),
                        "frames x space" if self._spatial else "frames axis")
        else:
            # single-device: one bulk transfer of the host-prepped
            # params (weights were kept off the device until now)
            self._params = jax.device_put(self._params, jax.devices()[0])
            if self._fast_params is not None:
                self._fast_params = jax.device_put(
                    self._fast_params, jax.devices()[0])
        self._jit_dtype = dtype
        self._jit_fused = use_fused
        if cfg.output_color == "yuv420" and cfg.outscale:
            # post-model resize operates in RGB; CSC fast path is only
            # for the straight-to-writer case
            self.config.output_color = "rgb"
        self._compile(dtype, use_fused)

    def set_output_color(self, color: str) -> None:
        """Switch rgb <-> yuv420 after setup (compile is lazy; calling
        before the first batch costs nothing)."""
        if color == self.config.output_color:
            return
        self.config.output_color = color
        self._compile(self._jit_dtype, self._jit_fused)

    def _compile(self, dtype, use_fused: bool) -> None:
        import jax
        import jax.numpy as jnp

        from framewright_tpu.ops import tiling

        spec = self._spec
        params = self._params
        fast = self._fast_params
        plan = self._plan

        model_fn_out = None
        if spec.family == "rrdb" and use_fused:
            import os as _os

            from framewright_tpu.models import rrdb

            # FW_INTERPRET=1 runs the SAME fused production program in
            # the Pallas interpreter (CPU CI coverage of the processor's
            # fused output path)
            interp = _os.environ.get("FW_INTERPRET", "") == "1"

            def model_fn(t):
                return rrdb.apply_fast(params, fast, t, spec.arch_config,
                                       interpret=interp)

            def model_fn_out(t, out_mode, full_range):
                return rrdb.apply_fast(params, fast, t, spec.arch_config,
                                       out_mode=out_mode,
                                       full_range=full_range,
                                       interpret=interp)
        elif spec.family == "srvgg" and use_fused:
            from framewright_tpu.ops import fused_srvgg

            def model_fn(t):
                return fused_srvgg.apply_fast(params, fast, t,
                                              spec.arch_config)
        else:
            def model_fn(t):
                return spec.apply_fn(params, t, spec.arch_config)

        yuv = self.config.output_color == "yuv420"
        full_range = self.config.yuv_full_range
        with_stats = self.config.device_stats
        cap = float(self.config.enhancement_cap)

        # fused output epilogue: when the rrdb fast path runs whole
        # frames and nothing downstream needs float RGB, the production
        # quantization (and for Y4M the BT.601 CSC + 4:2:0 subsample)
        # happens INSIDE the tail kernel (ops/fused_tail.py out_mode) —
        # no 4K float intermediates, uint8 depth-to-space, 10.7x less
        # kernel output traffic on the YUV path
        fused_out = (model_fn_out is not None and plan is not None
                     and not plan.tiled and cap >= 1.0
                     and not (yuv and self.config.outscale))
        if fused_out:
            from framewright_tpu.ops.tiling import pad_mod

            s, u = plan.scale, plan.body_divisor
            mode = "yuv420_u8" if yuv else "rgb_u8"

            def _u8_stats(yf, x):
                # same gate signals as the float path, computed from the
                # quantized output (±0.5/255 — irrelevant for gating).
                # In YUV mode yf is the Y plane, so psnr/ssim are
                # luma-domain (PSNR-Y, the standard SR reporting metric)
                from framewright_tpu.models.layers import resize_bicubic
                from framewright_tpu.ops.metrics import (
                    psnr_per_frame,
                    ssim_per_frame,
                )

                ref = resize_bicubic(x.astype(jnp.float32), yf.shape[1:3])
                if yf.shape[-1] == 1:   # luma domain
                    kr, kg, kb = 0.299, 0.587, 0.114
                    ref = (kr * ref[..., 0] + kg * ref[..., 1]
                           + kb * ref[..., 2])[..., None]
                return {
                    "psnr": psnr_per_frame(yf, ref),
                    "ssim": ssim_per_frame(yf, ref),
                    "luma": jnp.mean(yf, axis=(1, 2, 3)) * 255.0,
                    "std": jnp.std(yf * 255.0, axis=(1, 2, 3)),
                    "finite": jnp.all(jnp.isfinite(yf), axis=(1, 2, 3)),
                }

            @jax.jit
            def run(x_u8):
                b, h, w, _ = x_u8.shape
                x = x_u8.astype(dtype) / jnp.asarray(255.0, dtype)
                hp = -(-h // u) * u
                wp = -(-w // u) * u
                xp = pad_mod(x, hp - h, wp - w)
                # chunk oversize batches at the planner batch (callers
                # beyond the restorer ring may feed bigger arrays)
                nb = max(int(plan.batch), 1)
                chunks = [model_fn_out(xp[i:min(i + nb, b)], mode,
                                       full_range)
                          for i in range(0, b, nb)]
                if yuv:
                    yp, up, vp = (c[0] for c in chunks), \
                        (c[1] for c in chunks), (c[2] for c in chunks)
                    yp = jnp.concatenate(list(yp), axis=0)
                    up = jnp.concatenate(list(up), axis=0)
                    vp = jnp.concatenate(list(vp), axis=0)
                    planes = (yp[:, : h * s, : w * s],
                              up[:, : h * s // 2, : w * s // 2],
                              vp[:, : h * s // 2, : w * s // 2])
                    if with_stats:
                        # dequantize the Y plane back to [0,1] luma
                        y0, yr = ((16.0, 219.0) if not full_range
                                  else (0.0, 255.0))
                        yf = ((planes[0].astype(jnp.float32) - y0)
                              / yr)[..., None]
                        return planes, _u8_stats(jnp.clip(yf, 0.0, 1.0), x)
                    return planes
                out = jnp.concatenate(chunks, axis=0)[:, : h * s, : w * s]
                if with_stats:
                    return out, _u8_stats(
                        out.astype(jnp.float32) / 255.0, x)
                return out

            self._fn = run
            return

        @jax.jit
        def run(x_u8):
            # uint8 in, uint8 out: normalize/denormalize ON DEVICE so the
            # host link carries 1 byte/px each way instead of 4 out (the
            # axon tunnel moves ~18 MiB/s; a 4K f32 batch was ~10 s of
            # pure transfer) and the host never touches float pixels.
            x = x_u8.astype(dtype) / jnp.asarray(255.0, dtype)
            y = tiling.tiled_apply(model_fn, x, plan)
            if cap < 1.0:
                # authenticity guard (reference max_enhancement_strength):
                # lerp toward the plain resize ON DEVICE — preserves era
                # character without an extra host pass
                base = jax.image.resize(
                    x.astype(jnp.float32),
                    (x.shape[0], y.shape[1], y.shape[2], x.shape[3]),
                    method="linear").astype(y.dtype)
                y = base + jnp.asarray(cap, y.dtype) * (y - base)
            y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0) * 255.0
            stats = None
            if with_stats:
                # quality-gate stats ride in the SAME program as SR: the
                # host fetches 3 scalars/frame, not RGB frames, so the
                # validator composes with the YUV420 fast path for free
                # (reference validators.py:332-393 semantics)
                from framewright_tpu.models.layers import resize_bicubic
                from framewright_tpu.ops.metrics import (
                    psnr_per_frame,
                    ssim_per_frame,
                )

                yf = y / 255.0
                ref = resize_bicubic(
                    x.astype(jnp.float32), yf.shape[1:3])
                stats = {
                    "psnr": psnr_per_frame(yf, ref),
                    "ssim": ssim_per_frame(yf, ref),
                    "luma": jnp.mean(y, axis=(1, 2, 3)),
                    # frame-integrity signals (reference
                    # validate_frame_integrity, validators.py — called
                    # after every enhancement): NaN/Inf and flat/black
                    # detection ride the same program
                    "std": jnp.std(y, axis=(1, 2, 3)),
                    "finite": jnp.all(jnp.isfinite(y),
                                      axis=(1, 2, 3)),
                }
            if not yuv:
                # round-half-away like to_uint8 (max 255.5 floors to 255)
                out = jnp.floor(y + 0.5).astype(jnp.uint8)
                return (out, stats) if with_stats else out
            # fused RGB->YUV420 (BT.601, io/color.py math): the SR tail
            # ships 1.5 B/px planes instead of 3 B/px RGB
            kr, kg, kb = 0.299, 0.587, 0.114
            r, g, b = y[..., 0], y[..., 1], y[..., 2]
            yy = kr * r + kg * g + kb * b
            uu = (b - yy) / (2.0 * (1.0 - kb))
            vv = (r - yy) / (2.0 * (1.0 - kr))
            if not full_range:
                yy = yy * (219.0 / 255.0) + 16.0
                uu = uu * (224.0 / 255.0)
                vv = vv * (224.0 / 255.0)
            n, hh, ww = yy.shape
            uu = uu.reshape(n, hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))
            vv = vv.reshape(n, hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))
            planes = (jnp.clip(jnp.floor(yy + 0.5), 0, 255).astype(jnp.uint8),
                      jnp.clip(jnp.floor(uu + 128.5), 0, 255).astype(jnp.uint8),
                      jnp.clip(jnp.floor(vv + 128.5), 0, 255).astype(jnp.uint8))
            return (planes, stats) if with_stats else planes

        self._fn = run

    def enable_device_stats(self) -> None:
        """Turn on in-jit quality stats (recompiles lazily)."""
        if self.config.device_stats:
            return
        self.config.device_stats = True
        self._compile(self._jit_dtype, self._jit_fused)

    # ------------------------------------------------------------------
    def _calibrate_int8(self, x_u8: np.ndarray) -> None:
        """Build static-scale int8 fast params from the first batch's
        activation ranges (the TensorRT Int8Calibrator analog,
        reference tensorrt.py:331-455): one bf16 instrumented pass on a
        center crop, then the int8 kernel runs with scalar scales."""
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import rrdb

        cfg = self.config
        b, h, w, _ = x_u8.shape
        ch = min(h, 256) & ~7          # /8-safe for any scale variant
        cw = min(w, 256) & ~7
        r0, c0 = (h - ch) // 2, (w - cw) // 2
        sample = jnp.asarray(
            x_u8[:1, r0:r0 + ch, c0:c0 + cw].astype(np.float32) / 255.0)
        # activation ranges come from ONE instrumented device pass
        # (self._params, jit); the weight re-transform runs on the host
        # copy — per-weight D2H through the tunnel measured ~5 min
        # (scripts/probe_e2e_warm.py)
        host = getattr(self, "_host_params", None)
        host = host if host is not None else self._params
        if self._spec.family == "srvgg":
            from framewright_tpu.ops import fused_srvgg

            amax = np.asarray(fused_srvgg.calibrate_act_scales(
                self._params, self._spec.arch_config, sample,
                margin=cfg.int8_calib_margin))
            with self._host_ctx():
                self._fast_params = fused_srvgg.make_fast_params_int8(
                    host, self._spec.arch_config, amax)
        else:
            amax = np.asarray(rrdb.calibrate_act_scales(
                self._params, self._spec.arch_config, sample,
                margin=cfg.int8_calib_margin))
            with self._host_ctx():
                self._fast_params = rrdb.make_fast_params(
                    host, compute_dtype="int8", act_amax=amax)
        if self._mesh is not None:
            from framewright_tpu.parallel.mesh import replicate

            self._fast_params = jax.device_put(
                self._fast_params, replicate(self._mesh))
        else:
            self._fast_params = jax.device_put(
                self._fast_params, jax.devices()[0])
        self._int8_calibrate = False
        self._compile(self._jit_dtype, True)
        logger.info("int8 static scales calibrated (margin %.2f)",
                    cfg.int8_calib_margin)

    def dispatch(self, frames: np.ndarray):
        """Enqueue a batch on the device WITHOUT blocking (jax async
        dispatch) and return an opaque handle for ``materialize``. The
        restorer dispatches batch N+1 before fetching batch N so device
        compute overlaps the device→host transfer — the transfer is the
        larger cost on slow host links (PERF.md e2e section)."""
        require_shape(frames, self.name)
        import jax

        x = frames if frames.dtype == np.uint8 else to_uint8(frames)
        if self._int8_calibrate:
            self._calibrate_int8(x)
        n = x.shape[0]
        if self._mesh is not None:
            from framewright_tpu.parallel.mesh import pad_batch_for_mesh

            n_pad = pad_batch_for_mesh(n, self._mesh)
            if n_pad != n:
                x = np.concatenate(
                    [x, np.broadcast_to(x[-1:], (n_pad - n,) + x.shape[1:])], 0)
        try:
            xin = x
            if self._mesh is not None:
                xin = jax.device_put(x, self._frame_sharding)
            y, exc = self._fn(xin), None
        except Exception as e:  # noqa: BLE001 — surfaces at materialize
            y, exc = None, e
        return {"y": y, "exc": exc, "x": x, "n": n}

    def materialize(self, handle) -> np.ndarray:
        """Block on a dispatched batch; device OOM triggers the plan
        downshift + recompile + synchronous retry here (async errors
        surface at fetch time)."""
        cfg = self.config
        for attempt in range(cfg.max_oom_retries + 1):
            try:
                if handle["y"] is None:
                    raise handle["exc"]
                res, n = handle["y"], handle["n"]
                if (isinstance(res, tuple) and len(res) == 2
                        and isinstance(res[1], dict)):
                    res, stats = res
                    handle["stats_np"] = {
                        k: np.asarray(v)[:n] for k, v in stats.items()}
                if isinstance(res, tuple):   # yuv420 planes
                    out = tuple(np.asarray(p)[:n] for p in res)
                else:
                    out = np.asarray(res)[:n]
                break
            except Exception as exc:  # noqa: BLE001
                err = classify_error(exc)
                from framewright_tpu.errors import CompilationError

                # compiler crash (axon HTTP 500 / tpu_compile_helper —
                # PERF.md "compiler fragility") is batch-sensitive:
                # halving the frame batch is the known workaround, same
                # downshift path as OOM
                compile_retry = (isinstance(err, CompilationError)
                                 and self._plan is not None
                                 and self._plan.batch > 1)
                if (not (isinstance(err, HBMError) or compile_retry)
                        or attempt == cfg.max_oom_retries):
                    raise err from exc
                # device OOM / batch-sensitive compiler crash: downshift
                # the plan and recompile (the reference's adaptive tile
                # fallback), then rerun
                self._plan = self._plan.downshift()
                logger.warning("%s; downshifted plan to %s",
                               "compiler failure" if compile_retry
                               else "HBM OOM", self._plan)
                import jax.numpy as jnp

                dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(
                    cfg.compute_dtype, jnp.bfloat16
                )
                self._compile(dtype, self._fast_params is not None)
                handle = self.dispatch(handle["x"][: handle["n"]])
        if cfg.outscale and cfg.outscale != self.scale:
            out = self._resize(out, cfg.outscale)
        return out

    def process_batch(self, frames: np.ndarray) -> np.ndarray:
        return self.materialize(self.dispatch(frames))

    def _resize(self, frames: np.ndarray, outscale: float) -> np.ndarray:
        import jax.numpy as jnp

        from framewright_tpu.models.layers import resize_bicubic

        b, h, w, c = frames.shape
        oh = int(round(h / self.scale * outscale))
        ow = int(round(w / self.scale * outscale))
        y = resize_bicubic(jnp.asarray(to_float(frames)), (oh, ow))
        return to_uint8(np.asarray(y))

    def output_size(self, height: int, width: int):
        # outscale follows RealESRGANer semantics: final scale relative
        # to the input, applied as a bicubic resize after the model
        if self.config.outscale:
            return (int(round(height * self.config.outscale)),
                    int(round(width * self.config.outscale)))
        return height * self.scale, width * self.scale
