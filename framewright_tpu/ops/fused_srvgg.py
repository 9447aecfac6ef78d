"""Fused SRVGGNetCompact conv-chain Pallas kernel — the fast-path SR hot loop.

The reference's fast video models (`realesr-animevideov3`,
`realesr-general-x4v3` — reference processors/pytorch_realesrgan.py:
118-127) are SRVGGNetCompact: a plain chain of 3x3 64-channel convs
with PReLU, ~6.5x fewer FLOPs than the 23-block RRDBNet.  On TPU that
chain is the ideal fused-kernel shape: no dense-block concats, one
64->64 conv after another, so a single Pallas pass can run K
consecutive convs on a VMEM-resident block with a K-deep halo.

Design (same measured playbook as ops/fused_rrdb.py):
- channel-major flattened (64, S*S) layout; im2col taps are single
  lane rotations (pltpu.roll); activations stored PACKED two bf16
  channels per int32 word (lane rolls move both packed channels).
- each conv is ONE wide-matmul accumulation group: W (64 targets,
  9*64 taps) split into tap chunks (K=256 per dot) — MXU-shaped.
- PReLU per channel: alpha arrives as an (NF, 1) column, broadcast
  over lanes on the VPU.
- frame-border exactness: PReLU(0)=0 but biases are not
  zero-preserving, so activations outside the frame's valid rect are
  masked to zero after every conv (prefetched per-block extents) to
  reproduce SAME zero-padding semantics — exactly as the RDB kernel.
- geometry: one halo row/col is consumed per conv, so a group of G
  convs needs HALO=G.  G=8 keeps the halo-recompute factor at
  (112/96)^2 = 1.36 and (unlike the RDB's halo 5) is aligned to the
  (8, 128) sublane tiling, which keeps every DMA slice legal.

The 16-conv animevideov3-class body runs in TWO pallas passes (plus an
XLA first conv 3->64 and the XLA conv_last/pixel-shuffle tail).
"""

from __future__ import annotations

import functools
import os as _os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NF = 64                      # SRVGG feature width (fixed channel plan)
# Block geometry: S_V x S_V blocks, G convs fused per pass -> halo G.
S_V = int(_os.environ.get("FW_VGG_S", "112"))
GROUP = int(_os.environ.get("FW_VGG_G", "8"))
BH_V = S_V - 2 * GROUP       # valid interior per pass
PX_V = S_V * S_V
TAPS = tuple((di, dj) for di in range(3) for dj in range(3))
TPC = int(_os.environ.get("FW_VGG_TPC", "4"))   # taps per dot chunk
TPC_I8 = int(_os.environ.get("FW_VGG_TPC_I8", "4"))
VMEM_LIMIT = int(_os.environ.get("FW_RDB_VMEM_MB", "100")) * 1024 * 1024


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------


def _wide_conv(p: Dict) -> Tuple[np.ndarray, np.ndarray]:
    """conv params {w: (3, 3, 64, 64), b: (64,)} -> (W (64, 9*64) bf16
    row-major by tap then source channel, b (64, 1) f32)."""
    w = np.asarray(p["w"], np.float32)           # (kh, kw, cin, cout)
    # tap-major, matching the kernel's chunk concat order:
    # rows of the rhs chunk are [tap0 ch0..63, tap1 ch0..63, ...]
    wt = w.transpose(3, 0, 1, 2).reshape(NF, 9 * NF)   # (cout, taps*cin)
    return wt, np.asarray(p["b"], np.float32).reshape(NF, 1)


def make_fast_params(params: Dict, cfg) -> Dict:
    """SRVGG params (models/srvgg.py layout) -> fused-kernel params.

    Returns {"groups": [(W (g, 64, 576) bf16, b (g, 64, 1) f32,
    alpha (g, 64, 1) f32), ...]} covering body convs 1..num_conv (the
    0th conv is 3->64 and runs in XLA, as does conv_last).
    """
    convs = params["body"][1:]            # 64->64 chain
    acts = params["act"][1:]              # PReLU after each
    assert len(convs) == cfg.num_conv and len(acts) == cfg.num_conv
    groups = []
    for base in range(0, cfg.num_conv, GROUP):
        chunk = convs[base:base + GROUP]
        achunk = acts[base:base + GROUP]
        ws, bs, als = [], [], []
        for conv_p, act_p in zip(chunk, achunk):
            wt, b = _wide_conv(conv_p)
            ws.append(wt)
            bs.append(b)
            als.append(np.asarray(act_p["alpha"], np.float32).reshape(NF, 1))
        groups.append((
            jnp.asarray(np.stack(ws), jnp.bfloat16),
            jnp.asarray(np.stack(bs), jnp.float32),
            jnp.asarray(np.stack(als), jnp.float32),
        ))
    return {"groups": groups}


def make_fast_params_int8(params: Dict, cfg, act_amax) -> Dict:
    """int8 fast-mode weights (TensorRT-INT8 analog, static calibrated
    activation scales — the RDB kernel's measured-fastest recipe).

    act_amax: (num_conv + 1,) f32 — max |activation| of the chain input
    (post-conv0 PReLU) and of each body conv's PReLU output, from
    ``calibrate_act_scales``. Weights are per-row symmetric int8.
    """
    convs = params["body"][1:]
    acts = params["act"][1:]
    amax = np.maximum(np.asarray(act_amax, np.float32), 1e-6)
    groups = []
    for base in range(0, cfg.num_conv, GROUP):
        chunk = convs[base:base + GROUP]
        achunk = acts[base:base + GROUP]
        g = len(chunk)
        wqs, wss, bs, als = [], [], [], []
        for conv_p, act_p in zip(chunk, achunk):
            wt, b = _wide_conv(conv_p)
            rs = np.maximum(np.abs(wt).max(axis=1, keepdims=True), 1e-8)
            wqs.append(np.clip(np.round(wt / rs * 127.0), -127, 127
                               ).astype(np.int8))
            wss.append((rs / 127.0).astype(np.float32))
            bs.append(b)
            als.append(np.asarray(act_p["alpha"], np.float32).reshape(NF, 1))
        sa = amax[base:base + g + 1] / 127.0      # dequant scales
        inv = 1.0 / sa                            # quant multipliers
        groups.append((
            jnp.asarray(np.stack(wqs)),                       # (g,64,576) i8
            jnp.asarray(np.stack(wss), jnp.float32),          # (g,64,1)
            jnp.asarray(np.stack(bs), jnp.float32),
            jnp.asarray(np.stack(als), jnp.float32),
            jnp.asarray(np.concatenate([sa, inv]), jnp.float32),  # SMEM
        ))
    return {"groups": groups}


def calibrate_act_scales(params: Dict, cfg, sample: jnp.ndarray,
                         margin: float = 1.25) -> jnp.ndarray:
    """(num_conv + 1,) f32 activation ranges for the int8 chain, from
    one instrumented bf16 forward on a small sample (ranges are nearly
    resolution-invariant; mirror of rrdb.calibrate_act_scales)."""
    from framewright_tpu.models.layers import conv2d

    @jax.jit
    def run(x):
        feat = conv2d(params["body"][0], x)
        al = params["act"][0]["alpha"]
        feat = jnp.where(feat >= 0, feat, feat * al.astype(feat.dtype))
        stats = [jnp.max(jnp.abs(feat))]
        for conv_p, act_p in zip(params["body"][1:], params["act"][1:]):
            feat = conv2d(conv_p, feat)
            a = act_p["alpha"]
            feat = jnp.where(feat >= 0, feat, feat * a.astype(feat.dtype))
            stats.append(jnp.max(jnp.abs(feat)))
        return jnp.stack(stats)

    return run(sample.astype(jnp.bfloat16)).astype(jnp.float32) * margin


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _tap_roll(src, di, dj):
    shift = (1 - di) * S_V + (1 - dj)
    if shift == 0:
        return src
    return pltpu.roll(src, shift % PX_V, axis=1)


def _conv_accum(src_packed, w, acc_ref):
    """One 64->64 conv: src_packed (32, PX) int32 (packed bf16),
    w (64, 576) bf16 -> acc_ref (64, PX) f32 overwritten."""
    n = len(TAPS)
    t = 0
    k = 0
    while t < n:
        m = min(TPC, n - t)
        parts = [_tap_roll(src_packed, *TAPS[t + u]) for u in range(m)]
        packed = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
        chunk = pltpu.bitcast(packed, jnp.bfloat16)   # (m*64, PX)
        contrib = jnp.dot(w[:, k:k + m * NF], chunk,
                          preferred_element_type=jnp.float32)
        if t == 0:
            acc_ref[...] = contrib
        else:
            acc_ref[...] += contrib
        k += m * NF
        t += m


def _make_chain_kernel(g: int):
    """Kernel running g sequential conv+PReLU steps on one block."""

    def kern(ext_ref, x_ref, w_ref, b_ref, al_ref, o_ref,
             acc_ref, pa_ref, pb_ref):
        bi = pl.program_id(0)
        r0, r1 = ext_ref[bi, 0], ext_ref[bi, 1]
        c0, c1 = ext_ref[bi, 2], ext_ref[bi, 3]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, PX_V), 1)
        rows = lanes // S_V
        cols = lanes % S_V
        valid = (rows >= r0) & (rows < r1) & (cols >= c0) & (cols < c1)

        pa_ref[...] = pltpu.bitcast(x_ref[0], jnp.int32)
        bufs = (pa_ref, pb_ref)
        for i in range(g):
            src, dst = bufs[i % 2], bufs[(i + 1) % 2]
            _conv_accum(src[...], w_ref[i], acc_ref)
            v = acc_ref[...] + b_ref[i]
            v = jnp.where(v >= 0, v, v * al_ref[i])      # PReLU
            a = jnp.where(valid, v.astype(jnp.bfloat16), jnp.bfloat16(0.0))
            if i == g - 1:
                o_ref[0] = a
            else:
                dst[...] = pltpu.bitcast(a, jnp.int32)

    return kern


def _make_chain_kernel_int8(g: int):
    """int8 chain: static calibrated activation scales (SMEM), per-row
    weight scales, int8 MXU dots (2x bf16 rate on v5e)."""

    def kern(ext_ref, aq_ref, x_ref, w_ref, ws_ref, b_ref, al_ref, o_ref,
             acc_ref, pa_ref, pb_ref):
        bi = pl.program_id(0)
        r0, r1 = ext_ref[bi, 0], ext_ref[bi, 1]
        c0, c1 = ext_ref[bi, 2], ext_ref[bi, 3]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, PX_V), 1)
        rows = lanes // S_V
        cols = lanes % S_V
        valid = (rows >= r0) & (rows < r1) & (cols >= c0) & (cols < c1)

        def quant_pack(a, stage):
            # a: f32 (64, PX), masked. stage's inv lives at g+1+stage.
            q = jnp.clip(jnp.round(a * aq_ref[g + 1 + stage]),
                         -127.0, 127.0)
            return pltpu.bitcast(q.astype(jnp.int8), jnp.int32)

        x0 = jnp.where(valid, x_ref[0].astype(jnp.float32), 0.0)
        pa_ref[...] = quant_pack(x0, 0)
        bufs = (pa_ref, pb_ref)
        n = len(TAPS)
        for i in range(g):
            src, dst = bufs[i % 2], bufs[(i + 1) % 2]
            scale = ws_ref[i] * aq_ref[i]          # (64, 1) f32
            t = 0
            k = 0
            while t < n:
                m = min(TPC_I8, n - t)
                parts = [_tap_roll(src[...], *TAPS[t + u])
                         for u in range(m)]
                packed = parts[0] if m == 1 else jnp.concatenate(
                    parts, axis=0)
                chunk = pltpu.bitcast(packed, jnp.int8)   # (m*64, PX)
                contrib = jax.lax.dot_general(
                    w_ref[i, :, k:k + m * NF], chunk,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * scale
                if t == 0:
                    acc_ref[...] = contrib
                else:
                    acc_ref[...] += contrib
                k += m * NF
                t += m
            v = acc_ref[...] + b_ref[i]
            v = jnp.where(v >= 0, v, v * al_ref[i])        # PReLU
            v = jnp.where(valid, v, 0.0)
            if i == g - 1:
                o_ref[0] = v.astype(jnp.bfloat16)
            else:
                dst[...] = quant_pack(v, i + 1)

    return kern


def fused_conv_chain_int8(blocks: jnp.ndarray, extents: jnp.ndarray,
                          group: Tuple,
                          interpret: bool = False) -> jnp.ndarray:
    """int8 counterpart of fused_conv_chain (bf16 at the interface;
    quantization internal). group: (Wq (g, 64, 576) int8, ws (g, 64, 1)
    f32, b, alpha, aq (2g+2,) f32 [sa..., inv...])."""
    wq, ws, b, al, aq = group
    g = int(wq.shape[0])
    nb = blocks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, NF, PX_V), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, NF, PX_V), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NF, PX_V), jnp.float32),      # conv accumulator
            pltpu.VMEM((NF // 4, PX_V), jnp.int32),   # ping (packed int8)
            pltpu.VMEM((NF // 4, PX_V), jnp.int32),   # pong
        ],
    )
    return pl.pallas_call(
        _make_chain_kernel_int8(g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, NF, PX_V), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(extents, aq, blocks, wq, ws, b, al)


def fused_conv_chain(blocks: jnp.ndarray, extents: jnp.ndarray,
                     group: Tuple, interpret: bool = False) -> jnp.ndarray:
    """Run g fused conv+PReLU steps over channel-major flat blocks.

    blocks: (NB, 64, S_V*S_V) bf16; extents: (NB, 4) int32 valid rects;
    group: (W (g, 64, 576) bf16, b (g, 64, 1) f32, alpha (g, 64, 1) f32).
    Returns (NB, 64, S_V*S_V) bf16.
    """
    w, b, al = group
    g = int(w.shape[0])
    nb = blocks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, NF, PX_V), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, NF, PX_V), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NF, PX_V), jnp.float32),      # conv accumulator
            pltpu.VMEM((NF // 2, PX_V), jnp.int32),   # ping (packed bf16)
            pltpu.VMEM((NF // 2, PX_V), jnp.int32),   # pong
        ],
    )
    return pl.pallas_call(
        _make_chain_kernel(g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, NF, PX_V), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(extents, blocks, w, b, al)


# ---------------------------------------------------------------------------
# Block extraction / assembly (XLA, traced around the kernel) — the
# same geometry as fused_rrdb's but with this module's S/halo.
# ---------------------------------------------------------------------------


def _grid_dims(h: int, w: int) -> Tuple[int, int]:
    return -(-h // BH_V), -(-w // BH_V)


def _block_extents(h: int, w: int, nh: int, nw: int) -> np.ndarray:
    extents = []
    for i in range(nh):
        for j in range(nw):
            r0 = GROUP if i == 0 else 0
            r1 = min(S_V, GROUP + h - i * BH_V)
            c0 = GROUP if j == 0 else 0
            c1 = min(S_V, GROUP + w - j * BH_V)
            extents.append((r0, r1, c0, c1))
    return np.asarray(extents, np.int32)


def _extract(feat_cm: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b = feat_cm.shape[0]
    nh, nw = _grid_dims(h, w)
    hp, wp = nh * BH_V, nw * BH_V
    x = jnp.pad(feat_cm, ((0, 0), (0, 0), (GROUP, hp - h + GROUP),
                          (GROUP, wp - w + GROUP)))
    windows = []
    for i in range(nh):
        for j in range(nw):
            windows.append(jax.lax.slice(
                x, (0, 0, i * BH_V, j * BH_V),
                (b, NF, i * BH_V + S_V, j * BH_V + S_V)))
    return jnp.stack(windows, axis=1).reshape(b * nh * nw, NF, PX_V)


def _assemble(blocks: jnp.ndarray, b: int, h: int, w: int) -> jnp.ndarray:
    nh, nw = _grid_dims(h, w)
    hp, wp = nh * BH_V, nw * BH_V
    out = blocks.reshape(b, nh, nw, NF, S_V, S_V)[
        :, :, :, :, GROUP:S_V - GROUP, GROUP:S_V - GROUP]
    out = out.transpose(0, 3, 1, 4, 2, 5).reshape(b, NF, hp, wp)
    return out[:, :, :h, :w]


# ---------------------------------------------------------------------------
# Full fast forward
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_conv", "scale",
                                             "interpret"))
def _apply_fast_impl(params: Dict, fast: Dict, x: jnp.ndarray,
                     num_conv: int, scale: int,
                     interpret: bool = False) -> jnp.ndarray:
    from framewright_tpu.models.layers import (
        conv2d, pixel_shuffle, upsample_nearest)

    b, h, w, _ = x.shape
    nh, nw = _grid_dims(h, w)

    # conv0 (3->64) + PReLU in XLA: exact SAME padding on the image
    feat = conv2d(params["body"][0], x)
    al0 = params["act"][0]["alpha"]
    feat = jnp.where(feat >= 0, feat, feat * al0.astype(feat.dtype))

    fcm = feat.transpose(0, 3, 1, 2).astype(jnp.bfloat16)   # (B, 64, h, w)
    ext = jnp.asarray(np.tile(_block_extents(h, w, nh, nw), (b, 1)))
    # int8 groups carry 5 leaves (Wq, ws, b, alpha, aq) vs bf16's 3 —
    # pytree STRUCTURE, so the dispatch is static under jit
    run = (fused_conv_chain_int8 if len(fast["groups"][0]) == 5
           else fused_conv_chain)
    for group in fast["groups"]:
        blocks = _extract(fcm, h, w)
        blocks = run(blocks, ext, group, interpret=interpret)
        fcm = _assemble(blocks, b, h, w)

    feat = fcm.transpose(0, 2, 3, 1).astype(jnp.float32)
    out = conv2d(params["conv_last"], feat)
    out = pixel_shuffle(out, scale)
    return out + upsample_nearest(x, scale)


def apply_fast(params: Dict, fast: Dict, x: jnp.ndarray, cfg,
               interpret: bool = False) -> jnp.ndarray:
    """SRVGG forward through the fused conv-chain kernels.

    Numerics match models/srvgg.py:apply up to bf16 rounding of the
    body activations (parity test: tests/test_fused_srvgg.py).
    x: (B, H, W, 3) float in [0, 1].
    """
    assert cfg.num_feat == NF, "fused path is specialized to 64 features"
    return _apply_fast_impl(params, fast, x, cfg.num_conv, cfg.scale,
                            interpret=interpret)
