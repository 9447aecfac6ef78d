"""Motion-compensated multi-frame temporal denoising.

The heart of the reference's config-3 path (processors/
temporal_denoise.py:114-1064): a sliding window of 2r+1 frames (r=3
default) is aligned to the center frame by optical flow, blended with
similarity weights (pixels that moved wrongly fall back to the center
frame), with scene-change reset; optional learned single-frame pass
(NAFNet) on top — the reference's TAP backend. Also includes the
flicker reducer (temporal luma smoothing) from FlickerReducer:480.

Flow comes from the IFNet pyramid (the reference lists RIFE among its
flow methods) — one model serves interpolation and alignment.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

import numpy as np

from framewright_tpu.processors.base import to_float, to_uint8
from framewright_tpu.processors.scene_detection import frame_pair_scores

logger = logging.getLogger(__name__)


@dataclass
class TemporalDenoiseConfig:
    radius: int = 3                 # window = 2r+1 (reference default)
    strength: float = 0.5           # blend of denoised vs original
    method: str = "temporal"        # auto | temporal | nafnet | restormer
    #                                 | bilateral ("auto" profiles the
    #                                 first window with NoiseProfiler
    #                                 and configures itself)
    flow_align: bool = True         # motion-compensate neighbors (needs flow weights)
    flow_model: str = "ifnet"       # ifnet | raft (RAFT-class estimator)
    similarity_sigma: float = 0.08  # photometric rejection width ([0,1] units)
    scene_change_threshold: float = 0.30
    flicker_reduction: bool = True
    chroma_only: bool = False       # denoise chroma, preserve luma
    compute_dtype: str = "float32"
    weights_dir: Optional[str] = None
    batch: int = 0                  # center frames per device step
    #                                 (0 = mesh size when sharded, else 1)
    sharding: str = "none"          # none | data: shard the center batch
    #                                 over the local ``frames`` mesh —
    #                                 the BASELINE config-5 recipe path
    #                                 (each device denoises its own
    #                                 centers; the time-axis halo is the
    #                                 per-center neighbor stack, so no
    #                                 cross-device exchange is needed)


@dataclass
class TemporalDenoiseResult:
    frames: int = 0
    scene_resets: int = 0
    profile: Optional[dict] = None  # NoiseProfile.to_dict() in auto mode


class TemporalDenoiser:
    """Streaming sliding-window denoiser."""

    def __init__(self, config: Optional[TemporalDenoiseConfig] = None):
        self.config = config or TemporalDenoiseConfig()
        self._align_fn = None
        self._naf_fn = None
        self._naf_params = None
        self._mesh = None
        self._batch = 1          # setup() raises it to the mesh size
        self.result = TemporalDenoiseResult()

    # ------------------------------------------------------------------
    def setup(self, height: int = 0, width: int = 0) -> None:
        cfg = self.config
        self._dims = (height, width)
        if cfg.method == "auto":
            # deferred: _auto_configure resolves the method from the
            # first window's noise profile, then calls setup again
            return
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import ifnet
        from framewright_tpu.ops.warp import flow_warp
        if cfg.flow_model == "raft":
            from framewright_tpu.models import raft
            from framewright_tpu.models.registry import init_model

            raft_cfg = raft.RAFTConfig(iters=8)
            _, flow_params = init_model("raft-things",
                                        weights_dir=cfg.weights_dir)

            def flow_fn(fp, a, b):
                return raft.estimate_flow(fp, a, b, raft_cfg)
        else:
            arch = ifnet.IFNetConfig(channels=(96, 64), scales=(4, 2),
                                     num_res_convs=4)
            flow_params = ifnet.init(jax.random.PRNGKey(1), arch)

            def flow_fn(fp, a, b):
                return ifnet.estimate_flow(fp, a, b, arch)
        sigma2 = 2.0 * cfg.similarity_sigma ** 2

        def blend_one(fp, center, neighbors, mask):
            """center (H,W,3); neighbors (K,H,W,3); mask (K,) with 1 for
            real neighbors, 0 for padding -> denoised (H,W,3).

            Each neighbor is warped toward the center using IFNet flow
            (timestep 1 -> flow from center to neighbor), then blended
            with photometric confidence weights.  Padded neighbor slots
            (short windows at segment edges / scene cuts) carry zero
            weight, so a masked K-slot window is numerically identical
            to the variable-length window it stands in for.
            """
            c_rep = jnp.broadcast_to(center[None], neighbors.shape)
            if cfg.flow_align:
                # flow estimated center->neighbor; warp neighbor back
                flow_full = flow_fn(fp, c_rep, neighbors)
                warped = flow_warp(neighbors, flow_full)
            else:
                warped = neighbors
            diff = ((warped - c_rep) ** 2).mean(axis=-1, keepdims=True)
            m = mask[:, None, None, None]
            # adaptive rejection width: the typical diff level IS the
            # noise floor for a static aligned scene (the reference
            # feeds NoiseProfiler output here); configured sigma is the
            # lower bound so clean content still rejects mismatches.
            # Median over REAL neighbors only (padding is NaN-ed out).
            noise_floor = jnp.nanmedian(jnp.where(m > 0, diff, jnp.nan))
            noise_floor = jnp.where(jnp.isnan(noise_floor), 0.0, noise_floor)
            s2 = jnp.maximum(sigma2, 2.0 * noise_floor)
            wgt = jnp.exp(-diff / s2) * m
            num = center + (warped * wgt).sum(axis=0)
            den = 1.0 + wgt.sum(axis=0)
            return num / den

        # batched over centers: (B,H,W,3) x (B,K,H,W,3) x (B,K) ->
        # (B,H,W,3).  B is the mesh-shardable axis (each device owns a
        # slice of centers plus their full neighbor windows).
        self._align_fn = jax.jit(jax.vmap(blend_one,
                                          in_axes=(None, 0, 0, 0)))
        self._flow_params = flow_params

        # frame-axis data parallelism over the local mesh (the recipe
        # analog of SuperResolution's sharding; reference
        # utils/multi_gpu.py:549 distribute_frames)
        self._mesh = None
        if cfg.sharding == "data" and len(jax.devices()) > 1:
            from framewright_tpu.parallel.mesh import (
                FRAME_AXIS,
                build_mesh,
                frame_sharding,
                replicate,
            )
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._mesh = build_mesh()
            self._in_sharding = NamedSharding(self._mesh, P(FRAME_AXIS))
            self._flow_params = jax.device_put(
                self._flow_params, replicate(self._mesh))
            logger.info("temporal denoise sharded over %d devices",
                        len(self._mesh.devices.flat))
        nf = (len(self._mesh.devices.flat) if self._mesh is not None
              else 1)
        self._batch = cfg.batch or nf

        if cfg.method in ("nafnet", "restormer"):
            params = None
            if cfg.method == "restormer":
                from framewright_tpu.models import restormer as net

                ncfg = net.RestormerConfig(dim=8, num_blocks=(1, 1, 1, 1),
                                           num_refinement=1)
                full_cfg = net.RestormerConfig()
                weight_file = "restormer.npz"
            else:
                from framewright_tpu.models import nafnet as net

                ncfg = net.NAFNetConfig(width=16, enc_blocks=(1, 1),
                                        middle_blocks=1, dec_blocks=(1, 1))
                full_cfg = net.NAFNetConfig()
                weight_file = "nafnet.npz"
            if cfg.weights_dir:
                from pathlib import Path

                from framewright_tpu.models import torch_port

                npz = Path(cfg.weights_dir) / weight_file
                if npz.exists():
                    params = torch_port.import_npz(npz)
                    ncfg = full_cfg  # full-size once weighted
            if params is None and cfg.method == "nafnet":
                # packaged trained-in-repo denoiser (FW_nafnet_dn,
                # models/distill.py:train_denoiser); honor the caller's
                # pinned weights_dir like the raft path above
                try:
                    from framewright_tpu.models import registry

                    spec, params = registry.init_model(
                        "FW_nafnet_dn", allow_random=False,
                        weights_dir=cfg.weights_dir or None)
                    ncfg = spec.arch_config
                except Exception:  # noqa: BLE001 — checkpoint optional
                    params = None
            if params is None:
                params = net.init(jax.random.PRNGKey(2), ncfg)
            self._naf_params = jax.tree_util.tree_map(jnp.asarray, params)
            if self._mesh is not None:
                from framewright_tpu.parallel.mesh import replicate

                self._naf_params = jax.device_put(
                    self._naf_params, replicate(self._mesh))
            self._naf_fn = jax.jit(lambda p, x: net.apply_padded(p, x, ncfg))

    # ------------------------------------------------------------------
    def _denoise_batch(self, windows: List[tuple]) -> List[np.ndarray]:
        """Denoise a batch of centers in ONE device step.

        ``windows``: list of (window_frames, center_idx) — each window a
        list of uint8 frames.  Windows shorter than the full 2r slots
        are padded with the center frame under a zero mask (numerically
        a no-op).  The batch axis is padded up to the mesh ``frames``
        axis and sharded when configured; results come back in order.
        """
        import jax
        import jax.numpy as jnp

        cfg = self.config
        if not windows:
            return []
        k_slots = 2 * cfg.radius
        centers, neighbors, masks = [], [], []
        for window, center_idx in windows:
            c = to_float(window[center_idx][None])[0]
            nb = [to_float(f[None])[0]
                  for i, f in enumerate(window) if i != center_idx]
            m = np.zeros((k_slots,), np.float32)
            m[: len(nb)] = 1.0
            while len(nb) < k_slots:
                nb.append(c)
            centers.append(c)
            neighbors.append(np.stack(nb[:k_slots]))
            masks.append(m)
        n = len(centers)
        n_pad = n
        if self._mesh is not None:
            from framewright_tpu.parallel.mesh import pad_batch_for_mesh

            n_pad = pad_batch_for_mesh(n, self._mesh)
        while len(centers) < n_pad:
            centers.append(centers[-1])
            neighbors.append(neighbors[-1])
            masks.append(masks[-1])
        cb = np.stack(centers)
        if cfg.method in ("temporal", "nafnet", "restormer") \
                and k_slots > 0:
            nbb, mb = np.stack(neighbors), np.stack(masks)
            if self._mesh is not None:
                cbj = jax.device_put(jnp.asarray(cb), self._in_sharding)
                nbb = jax.device_put(jnp.asarray(nbb), self._in_sharding)
                mb = jax.device_put(jnp.asarray(mb), self._in_sharding)
            else:
                cbj = jnp.asarray(cb)
            out = self._align_fn(self._flow_params, cbj,
                                 jnp.asarray(nbb), jnp.asarray(mb))
        else:
            out = cb
        if cfg.method in ("nafnet", "restormer") and self._naf_fn is not None:
            out = self._naf_fn(self._naf_params, jnp.asarray(out))
        elif cfg.method == "bilateral":
            out = self._bilateral(cb)
        out = np.asarray(out)[:n]
        cb = cb[:n]
        blended = cfg.strength * out + (1.0 - cfg.strength) * cb
        if cfg.chroma_only and blended.shape[-1] == 3:
            # keep the original luma, take denoised chroma: adding the
            # luma delta to every channel shifts Y and leaves U/V
            # untouched (the BT.601 chroma coefficients sum to zero) —
            # reference DenoiserType.CHROMA_ONLY semantics
            w = np.asarray([0.299, 0.587, 0.114], np.float32)
            dy = ((cb - blended) * w).sum(-1, keepdims=True)
            blended = blended + dy
        u8 = to_uint8(np.clip(blended, 0.0, 1.0))
        return [u8[i] for i in range(n)]

    # ------------------------------------------------------------------
    def _auto_configure(self, head: List[np.ndarray]) -> None:
        """Profile the head frames and configure method/strength/
        rejection width (the reference wires NoiseProfiler output into
        denoiser choice the same way, noise_profiler.py:542)."""
        from framewright_tpu.processors.noise_profiler import NoiseProfiler

        cfg = self.config
        prof = NoiseProfiler(sample_frames=len(head)).analyze_frames(head)
        cfg.method = (prof.recommended_denoiser
                      if prof.recommended_denoiser != "none" else "none")
        if cfg.method != "none":
            cfg.strength = max(0.1, prof.recommended_strength)
            cfg.similarity_sigma = max(cfg.similarity_sigma,
                                       prof.similarity_sigma)
            cfg.chroma_only = prof.chroma_only
        self.result.profile = prof.to_dict()
        logger.info("auto denoise: %s strength=%.2f (noise %s, sigma %.2f)",
                    cfg.method, cfg.strength, prof.dominant_type.value,
                    prof.characteristics.luma_sigma)
        if cfg.method != "none":
            self.setup(*getattr(self, "_dims", (0, 0)))

    @staticmethod
    def _bilateral(x: np.ndarray) -> np.ndarray:
        """Cheap edge-preserving spatial fallback (3x3 bilateral-ish)."""
        import jax
        import jax.numpy as jnp

        img = jnp.asarray(x)
        acc = jnp.zeros_like(img)
        wacc = jnp.zeros_like(img[..., :1])
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                sh = jnp.roll(img, (dy, dx), axis=(1, 2))
                d2 = ((sh - img) ** 2).mean(-1, keepdims=True)
                w = jnp.exp(-d2 / 0.01) * np.exp(-(dy * dy + dx * dx) / 2.0)
                acc = acc + sh * w
                wacc = wacc + w
        return np.asarray(acc / wacc)

    # ------------------------------------------------------------------
    def denoise_stream(self, frames_iter: Iterator[np.ndarray]) -> Iterator[np.ndarray]:
        """Stream with a look-ahead buffer of r frames; windows are cut
        at scene changes (reference scene-change reset)."""
        cfg = self.config
        if cfg.method == "auto":
            import itertools

            head = list(itertools.islice(frames_iter,
                                         max(8, 2 * cfg.radius + 1)))
            self._auto_configure(head)
            frames_iter = itertools.chain(head, frames_iter)
        if cfg.method == "none":
            for frame in frames_iter:
                self.result.frames += 1
                yield frame
            return
        r = cfg.radius
        buf: List[np.ndarray] = []
        segment_start = 0  # index within buf where the current scene begins
        out_idx = 0
        pending: List[tuple] = []  # captured (window, center_idx) queue

        def queue(center_pos: int) -> None:
            lo = max(segment_start, center_pos - r)
            hi = min(len(buf), center_pos + r + 1)
            # copy the slice: buf is mutated after queueing, the frames
            # themselves are shared refs
            pending.append((list(buf[lo:hi]), center_pos - lo))
            self.result.frames += 1

        prev: Optional[np.ndarray] = None
        for frame in frames_iter:
            if prev is not None:
                score = float(frame_pair_scores(prev[None], frame[None])[0])
                if score >= cfg.scene_change_threshold:
                    # queue everything before the cut, then reset
                    while out_idx < len(buf):
                        queue(out_idx)
                        out_idx += 1
                    self.result.scene_resets += 1
                    buf = buf[out_idx:]
                    out_idx = 0
                    segment_start = 0
            buf.append(frame)
            prev = frame
            # queue frames whose full forward context is available
            while out_idx + r < len(buf):
                queue(out_idx)
                out_idx += 1
                if out_idx - r > segment_start:
                    # drop frames no longer needed
                    drop = out_idx - r - segment_start
                    if segment_start == 0 and drop > 0:
                        buf = buf[drop:]
                        out_idx -= drop
            if len(pending) >= self._batch:
                yield from self._denoise_batch(pending)
                pending = []
        while out_idx < len(buf):
            queue(out_idx)
            out_idx += 1
        yield from self._denoise_batch(pending)


class FlickerReducer:
    """Global-luma temporal smoothing (reference FlickerReducer:480):
    equalize per-frame mean luminance against a moving average —
    the classic fix for vintage footage exposure flicker."""

    def __init__(self, window: int = 9, strength: float = 0.8):
        self.window = window
        self.strength = strength

    def reduce_stream(self, frames_iter: Iterator[np.ndarray]) -> Iterator[np.ndarray]:
        hist: List[float] = []
        buf: List[np.ndarray] = []
        half = self.window // 2
        for frame in frames_iter:
            buf.append(frame)
            hist.append(float(frame.astype(np.float32).mean()))
            if len(buf) > half:
                yield self._correct(buf, hist, len(buf) - half - 1)
            if len(buf) > self.window:
                buf.pop(0)
                hist.pop(0)
        start = max(0, len(buf) - half)
        for i in range(start, len(buf)):
            yield self._correct(buf, hist, i)

    def _correct(self, buf, hist, idx) -> np.ndarray:
        target = float(np.mean(hist))
        cur = hist[idx]
        if cur < 1e-3:
            return buf[idx]
        gain = 1.0 + self.strength * (target / cur - 1.0)
        out = buf[idx].astype(np.float32) * gain
        return np.clip(out, 0, 255).astype(np.uint8)
