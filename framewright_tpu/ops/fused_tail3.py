"""Resident tail (tail3): the WHOLE Real-ESRGAN tail computed on the
merge body's resident blocks, with no image-level round trip.

The round-4 device trace showed that after the merge-in-kernel body
landed, the remaining non-kernel frame budget was dominated by the
body assembly (interior crop + 6-D transpose of the 540-res 64ch
image), the XLA ``conv_body`` + skip add at image level, and the tail2
block re-extraction (pad + window slices + stack). All three exist
only to move data between two block partitions of the same image.

tail3 removes the round trip with a TWO-kernel split over the body's
(S=112, HALO=8) resident blocks:

  K1 (this module): ring-merge (the same 8-operand neighbor machinery
     as the body's merge kernels, fused_rrdb.py) + conv_body 3x3 +
     bias + skip(feat) — consumes 1 of the 8 halo rings.
  K2: the EXISTING extended phase tail (fused_tail._make_tail2_kernel)
     run at the body geometry s2=S=112 directly on K1's output blocks
     — conv_up1/conv_up2/conv_hr/conv_last consume 4 more rings
     (phase decomposition, no 4K intermediates). 5 rings used <= 8.

A first attempt fused ALL five convs into one kernel; at S=112
(PX=12544 lanes) that ~120-dot program reproducibly crashes the axon
remote compile helper (HTTP 500, helper exit 1) — kernel-alone probe
scripts/probe_tail3_compile.py. The split keeps each program at a size
the Mosaic compiler handles (K2's body is the already-deployed tail2
kernel, geometry-parametrized).

The skip operand is the head output's ORIGINAL extraction blocks (the
scan's initial carry) whose rings are valid by construction.
Frame-border zero-pad semantics via the same per-block valid extents
as the body kernels; outer rings of K1's output hold wrap garbage that
K2's inward ring consumption never reads (same halo argument as the
body's ring-merge sweeps).

Reference analog: the monolithic TensorRT engine the reference builds
over RRDBNet (reference src/framewright/infrastructure/gpu/backends/
tensorrt.py; processors/pytorch_realesrgan.py tail) — here the fusion
is explicit and the hardware is the v5e MXU/VMEM.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from framewright_tpu.ops import fused_rrdb as fr
from framewright_tpu.ops import fused_tail as ft

S, HALO, BH, PX, NF = fr.S, fr.HALO, fr.BH, fr.PX, fr.NF


def tail3_phase_weights(conv_body: Dict, tail2: Dict) -> Dict:
    """Weight bundle: conv_body in wide tap-major form + the tail2
    bundle (shared arrays, no duplication)."""
    w = np.asarray(conv_body["w"], np.float32)
    ws = np.concatenate([w[di, dj].T for di, dj in fr.TAPS], axis=1)
    out = dict(tail2)
    out["Ws"] = jnp.asarray(ws, jnp.bfloat16)              # (64, 576)
    out["bs"] = jnp.asarray(
        np.asarray(conv_body["b"], np.float32).reshape(-1, 1))
    return out


def _cbody_kernel(ext_ref, x_ref, up_ref, dn_ref, lf_ref, rt_ref,
                  dul_ref, dur_ref, ddl_ref, ddr_ref, feat_ref,
                  ws_ref, bs_ref, o_ref, xm_ref):
    """K1: ring-merge + conv_body + bias + skip on one resident block."""
    valid = fr._merge_ring_packed(ext_ref, x_ref, up_ref, dn_ref, lf_ref,
                                  rt_ref, dul_ref, dur_ref, ddl_ref,
                                  ddr_ref, xm_ref)
    acc = None
    for t in range(0, 9, 3):
        parts = [fr._tap_roll(xm_ref[:], *fr.TAPS[t + u]) for u in range(3)]
        chunk = pltpu.bitcast(jnp.concatenate(parts, axis=0), jnp.bfloat16)
        c = jnp.dot(ws_ref[:, t * NF:(t + 3) * NF], chunk,
                    preferred_element_type=jnp.float32)
        acc = c if acc is None else acc + c
    sv = acc + bs_ref[:] + feat_ref[0].astype(jnp.float32)
    o_ref[0] = jnp.where(valid, sv.astype(jnp.bfloat16), jnp.bfloat16(0.0))


def conv_body_skip_blocks(blocks: jnp.ndarray, feat_blocks: jnp.ndarray,
                          extents: jnp.ndarray, wts: Dict, nw: int,
                          interpret: bool = False) -> jnp.ndarray:
    """blocks: the merge body's output blocks (NB, 64, PX) bf16 with
    stale rings (refreshed in-kernel from neighbor interiors);
    feat_blocks: the head extraction blocks (valid rings).
    Returns (NB, 64, PX) bf16 conv_body+skip blocks, valid to ring
    depth HALO-1 (enough for the 4-conv phase tail: 4 < HALO)."""
    nb = blocks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=fr._merge_in_specs(nb, nw)
                 + [pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                                 memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NF // 2, PX), jnp.int32),   # ring-merged input
        ],
    )
    return pl.pallas_call(
        _cbody_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, NF, PX), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=fr.VMEM_LIMIT),
        interpret=interpret,
    )(extents, *([blocks] * 9), feat_blocks, wts["Ws"], wts["bs"])


def _crop_assemble(out: jnp.ndarray, rows: int, b: int, nh: int, nw: int,
                   h: int, w: int) -> jnp.ndarray:
    """Phase blocks (NB, rows, PX) -> channel-major image
    (B, rows, h, w) via interior crop + block transpose."""
    out = out.reshape(b, nh, nw, rows, S, S)[
        :, :, :, :, HALO:S - HALO, HALO:S - HALO]
    out = out.reshape(b, nh, nw, rows, BH, BH)
    out = out.transpose(0, 3, 1, 4, 2, 5).reshape(b, rows, nh * BH, nw * BH)
    return out[:, :, :h, :w]


def _d2s(t: jnp.ndarray, f: int, b: int, h: int, w: int) -> jnp.ndarray:
    """Phase-planar (B, f*f, h, w) -> (B, f*h, f*w), phase index P*f+Q.
    Two-stage interleave (lanes Q first, then rows P) — measured faster
    than the single 6-D transpose (scripts/bench_d2s_ctx.py)."""
    y = t.reshape(b, f, f, h, w).transpose(0, 1, 3, 4, 2)  # (B,P,h,w,Q)
    y = y.reshape(b, f, h, f * w)
    return y.transpose(0, 2, 1, 3).reshape(b, f * h, f * w)


def tail3_image(out_blocks: jnp.ndarray, feat_blocks: jnp.ndarray,
                extents: jnp.ndarray, b: int, nh: int, nw: int,
                h: int, w: int, wts: Dict,
                interpret: bool = False, out_mode: str = "bf16",
                full_range: bool = False):
    """Resident blocks -> the full-tail output image/planes.

    K1 (conv_body+skip) then K2 (phase tail at the body geometry), then
    the interior crop + two-stage depth-to-space (see
    fused_tail.fused_tail2_image). ``out_mode``:
      bf16      -> (B, 4h, 4w, 3) bf16 RGB
      rgb_u8    -> (B, 4h, 4w, 3) uint8 RGB (quantized in-kernel)
      yuv420_u8 -> ((B, 4h, 4w) Y, (B, 2h, 2w) U, (B, 2h, 2w) V) uint8
                   (BT.601 CSC + 4:2:0 subsample fused into K2 — the
                   SR jit's whole-4K XLA CSC disappears and the
                   depth-to-space runs on uint8 planes)"""
    sblk = conv_body_skip_blocks(out_blocks, feat_blocks, extents, wts,
                                 nw, interpret=interpret)
    out = ft.fused_tail2_blocks(sblk, extents, wts, interpret=interpret,
                                out_mode=out_mode, full_range=full_range)
    if out_mode == "yuv420_u8":
        img = _crop_assemble(out, 24, b, nh, nw, h, w)  # (B, 24, h, w)
        yp = _d2s(img[:, 0:16], 4, b, h, w)             # (B, 4h, 4w)
        up = _d2s(img[:, 16:20], 2, b, h, w)            # (B, 2h, 2w)
        vp = _d2s(img[:, 20:24], 2, b, h, w)
        return yp, up, vp
    img = _crop_assemble(out, 128, b, nh, nw, h, w)
    t = img.reshape(b, 4, 4, 8, h, w)[:, :, :, :3]   # (B, P, Q, 3, h, w)
    y = t.transpose(0, 3, 1, 4, 5, 2).reshape(b, 3, 4, h, 4 * w)
    y = y.transpose(0, 1, 3, 2, 4).reshape(b, 3, 4 * h, 4 * w)
    return y.transpose(0, 2, 3, 1)
