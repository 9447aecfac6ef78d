"""Dense optical flow estimation with selectable backends.

TPU-native rebuild of the reference's RAFT flow surface
(reference processors/raft_flow.py:70-407: ``RAFTFlowEstimator`` with
``estimate / estimate_bidirectional / check_flow_consistency /
warp_frame`` wrapping torchvision RAFT on CUDA).  Backends:

- ``raft``  — models/raft.py, the full RAFT basic architecture in JAX
  (all-pairs MXU correlation + lax.scan GRU iterations);
- ``ifnet`` — the RIFE-class pyramid flow (models/ifnet.py), ~10x
  cheaper, adequate for small motion (the default alignment flow).

Both run under one jit per resolution; confidence comes from
forward-backward consistency (occlusion-aware), not torch heuristics.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

VALID_FLOW_BACKENDS = ("ifnet", "raft")


@dataclass
class FlowField:
    """Reference RAFTFlowField analog (raft_flow.py:53-68)."""

    flow: np.ndarray          # (H, W, 2) pixels, (x, y)
    magnitude: np.ndarray     # (H, W)
    confidence: np.ndarray    # (H, W) in [0, 1]
    iterations_used: int = 0

    @property
    def flow_x(self) -> np.ndarray:
        return self.flow[..., 0]

    @property
    def flow_y(self) -> np.ndarray:
        return self.flow[..., 1]


class FlowEstimator:
    """Frame-pair dense flow with a selectable TPU backend."""

    def __init__(self, backend: str = "ifnet", iters: int = 12,
                 weights_dir: Optional[str] = None):
        if backend not in VALID_FLOW_BACKENDS:
            from framewright_tpu.errors import ConfigError

            raise ConfigError(
                f"flow backend must be one of {VALID_FLOW_BACKENDS}")
        self.backend = backend
        self.iters = iters
        self.weights_dir = weights_dir
        self._fn = None
        self._params = None

    # ------------------------------------------------------------------
    def setup(self) -> None:
        if self._fn is not None:
            return
        import jax

        if self.backend == "raft":
            from framewright_tpu.models import raft
            from framewright_tpu.models.registry import init_model

            spec, params = init_model("raft-things",
                                      weights_dir=self.weights_dir)
            cfg = raft.RAFTConfig(iters=self.iters)
            self._params = params

            @jax.jit
            def fn(p, a, b):
                return raft.estimate_flow(p, a, b, cfg)
        else:
            from framewright_tpu.models import ifnet

            arch = ifnet.IFNetConfig(channels=(96, 64), scales=(4, 2),
                                     num_res_convs=4)
            self._params = ifnet.init(jax.random.PRNGKey(1), arch)

            @jax.jit
            def fn(p, a, b):
                return ifnet.estimate_flow(p, a, b, arch)

        self._fn = fn

    # ------------------------------------------------------------------
    def estimate(self, frame0: np.ndarray, frame1: np.ndarray,
                 with_confidence: bool = True) -> FlowField:
        """Flow from frame0 toward frame1 (uint8 or float HWC)."""
        self.setup()
        a, b = self._prep(frame0), self._prep(frame1)
        fw = np.asarray(self._fn(self._params, a, b)[0], np.float32)
        mag = np.hypot(fw[..., 0], fw[..., 1])
        if with_confidence:
            bw = np.asarray(self._fn(self._params, b, a)[0], np.float32)
            conf = self._consistency_confidence(fw, bw)
        else:
            conf = np.ones(mag.shape, np.float32)
        iters = self.iters if self.backend == "raft" else 0
        return FlowField(flow=fw, magnitude=mag, confidence=conf,
                         iterations_used=iters)

    def estimate_bidirectional(
            self, frame0: np.ndarray,
            frame1: np.ndarray) -> Tuple[FlowField, FlowField]:
        self.setup()
        a, b = self._prep(frame0), self._prep(frame1)
        fw = np.asarray(self._fn(self._params, a, b)[0], np.float32)
        bw = np.asarray(self._fn(self._params, b, a)[0], np.float32)
        return (
            FlowField(fw, np.hypot(fw[..., 0], fw[..., 1]),
                      self._consistency_confidence(fw, bw)),
            FlowField(bw, np.hypot(bw[..., 0], bw[..., 1]),
                      self._consistency_confidence(bw, fw)),
        )

    @staticmethod
    def check_flow_consistency(fw: np.ndarray, bw: np.ndarray,
                               alpha: float = 0.01,
                               beta: float = 0.5) -> np.ndarray:
        """Occlusion mask: True where forward and backward flows agree
        (|f(p) + b(p + f(p))|^2 < a*(|f|^2+|b|^2) + beta — the standard
        Sundaram/Brox criterion the reference approximates)."""
        h, w, _ = fw.shape
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        px = np.clip(xs + fw[..., 0], 0, w - 1)
        py = np.clip(ys + fw[..., 1], 0, h - 1)
        x0 = px.astype(np.int32)
        y0 = py.astype(np.int32)
        bw_at = bw[y0, x0]        # nearest is enough for a gate
        err = np.sum((fw + bw_at) ** 2, axis=-1)
        bound = alpha * (np.sum(fw ** 2, -1) + np.sum(bw_at ** 2, -1)) + beta
        return err < bound

    @staticmethod
    def _consistency_confidence(fw: np.ndarray,
                                bw: np.ndarray) -> np.ndarray:
        h, w, _ = fw.shape
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        px = np.clip(xs + fw[..., 0], 0, w - 1).astype(np.int32)
        py = np.clip(ys + fw[..., 1], 0, h - 1).astype(np.int32)
        err = np.sqrt(np.sum((fw + bw[py, px]) ** 2, axis=-1))
        return np.exp(-err).astype(np.float32)

    @staticmethod
    def warp_frame(frame: np.ndarray, flow: np.ndarray) -> np.ndarray:
        """Backward-warp ``frame`` by ``flow`` (reference
        raft_flow.py:365-397): out[p] = frame[p + flow[p]]."""
        import jax.numpy as jnp

        from framewright_tpu.ops.warp import flow_warp

        was_uint8 = frame.dtype == np.uint8
        f = frame.astype(np.float32) / 255.0 if was_uint8 \
            else frame.astype(np.float32)
        out = np.asarray(flow_warp(jnp.asarray(f[None]),
                                   jnp.asarray(flow[None]))[0])
        if was_uint8:
            return np.clip(out * 255.0 + 0.5, 0, 255).astype(np.uint8)
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def _prep(frame: np.ndarray):
        import jax.numpy as jnp

        f = frame.astype(np.float32)
        if frame.dtype == np.uint8:
            f = f / 255.0
        return jnp.asarray(f[None])
