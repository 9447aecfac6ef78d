"""Resident tail: the WHOLE Real-ESRGAN tail computed on the merge
body's resident blocks (tail3).

The round-4 device trace showed that after the merge-in-kernel body
landed, the remaining non-kernel frame budget was dominated by the
body assembly (interior crop + 6-D transpose of the 540-res 64ch
image), the XLA ``conv_body`` + skip add at image level, and the tail2
block re-extraction (pad + 77 window slices + stack). All three exist
only to move data between two block partitions of the same image.

tail3 removes the round trip entirely: it runs ONE Pallas sweep over
the body's (S=112, HALO=8) resident blocks, refreshing each block's
halo ring in-kernel from its neighbors' interiors (the same 8-operand
ring-merge machinery as the body's merge kernels, fused_rrdb.py), and
computes all FIVE remaining convs in one kernel:

  S : conv_body 3x3 + bias + skip(feat)        (no activation)
  A0: conv_up1-after-nearest2x -> 4 phases of the 2x image
  A : conv_up2-after-nearest2x -> 16 phases of the 4x image
      (phase-of-phase routing, see fused_tail.py tail2)
  B : conv_hr 3x3 at 4x, phase-routed over the 16-phase form
  C : conv_last 3x3 at 4x -> 16 phases x 8 rows (rows 0-2 = RGB)

Five convs need halo 5 <= HALO=8, so the body's ring depth covers the
tail with no extra exchange. The skip operand is the head output's
ORIGINAL extraction blocks (the scan's initial carry) whose rings are
valid by construction. Frame-border zero-pad semantics via the same
per-block valid extents as the body kernels.

Reference analog: the monolithic TensorRT engine the reference builds
over RRDBNet (reference src/framewright/infrastructure/gpu/backends/
tensorrt.py; processors/pytorch_realesrgan.py tail) — here the fusion
is explicit and the hardware is the v5e MXU/VMEM.
"""

from __future__ import annotations

from typing import Dict, Tuple

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


def _rollb(src, dr, dc):
    shift = (-dr) * S + (-dc)
    if shift == 0:
        return src
    return pltpu.roll(src, shift % PX, axis=1)


def _tail3_kernel(ext_ref, x_ref, up_ref, dn_ref, lf_ref, rt_ref,
                  dul_ref, dur_ref, ddl_ref, ddr_ref, feat_ref,
                  ws_ref, wa0_ref, wa_ref, wb_ref, wc_ref,
                  bs_ref, ba0_ref, ba_ref, bb_ref, bc_ref,
                  o_ref, xm_ref, s_ref, a0_ref, a_ref, b_ref):
    valid = fr._merge_ring_packed(ext_ref, x_ref, up_ref, dn_ref, lf_ref,
                                  rt_ref, dul_ref, dur_ref, ddl_ref,
                                  ddr_ref, xm_ref)

    def act_pack(v):
        m = jnp.where(valid, ft._lrelu(v).astype(jnp.bfloat16),
                      jnp.bfloat16(0.0))
        return pltpu.bitcast(m, jnp.int32)

    # S: conv_body 3x3 on the ring-merged body output + bias + skip
    acc = None
    for t in range(0, 9, 3):
        parts = [fr._tap_roll(xm_ref[:], *fr.TAPS[t + u]) for u in range(3)]
        chunk = pltpu.bitcast(jnp.concatenate(parts, axis=0), jnp.bfloat16)
        c = jnp.dot(ws_ref[:, t * NF:(t + 3) * NF], chunk,
                    preferred_element_type=jnp.float32)
        acc = c if acc is None else acc + c
    sv = acc + bs_ref[:] + feat_ref[0].astype(jnp.float32)
    s_ref[:] = pltpu.bitcast(
        jnp.where(valid, sv.astype(jnp.bfloat16), jnp.bfloat16(0.0)),
        jnp.int32)

    # A0: conv_up1 phases (input 540 -> 1080-phase form)
    for pi, ph in enumerate(ft.PHASES):
        parts = [_rollb(s_ref[:], dr, dc) for dr, dc in ft._TAPS_A[ph]]
        chunk = pltpu.bitcast(jnp.concatenate(parts, axis=0), jnp.bfloat16)
        acc = jnp.dot(wa0_ref[pi], chunk,
                      preferred_element_type=jnp.float32)
        a0_ref[pi * 32:(pi + 1) * 32] = act_pack(acc + ba0_ref[:])

    # A: conv_up2 phase-of-phase (1080-phase form -> 16-phase 4x form)
    for pi, (P, Q) in enumerate(ft._PHASES16):
        wa_idx = (P & 1) * 2 + (Q & 1)
        parts = [
            _rollb(a0_ref[ip * 32:(ip + 1) * 32], dr, dc)
            for ip, dr, dc in ft._TAPS_A2[(P, Q)]
        ]
        chunk = pltpu.bitcast(jnp.concatenate(parts, axis=0), jnp.bfloat16)
        acc = jnp.dot(wa_ref[wa_idx], chunk,
                      preferred_element_type=jnp.float32)
        a_ref[pi * 32:(pi + 1) * 32] = act_pack(acc + ba_ref[:])

    # B: conv_hr at 4x (phase-routed 3x3 over the 16-phase form)
    for pi, ph in enumerate(ft._PHASES16):
        taps = ft._TAPS_BC2[ph]
        acc = None
        for t in range(0, 9, 3):
            m = min(3, 9 - t)
            parts = [
                _rollb(a_ref[tp[0] * 32:tp[0] * 32 + 32], tp[1], tp[2])
                for tp in taps[t:t + m]
            ]
            packed = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
            chunk = pltpu.bitcast(packed, jnp.bfloat16)
            c = jnp.dot(wb_ref[0, :, t * NF:(t + m) * NF], chunk,
                        preferred_element_type=jnp.float32)
            acc = c if acc is None else acc + c
        b_ref[pi * 32:(pi + 1) * 32] = act_pack(acc + bb_ref[:])

    # C: conv_last at 4x -> 16 phases x 8 rows (3 RGB + pad)
    for pi, ph in enumerate(ft._PHASES16):
        taps = ft._TAPS_BC2[ph]
        acc = None
        for t in range(0, 9, 3):
            m = min(3, 9 - t)
            parts = [
                _rollb(b_ref[tp[0] * 32:tp[0] * 32 + 32], tp[1], tp[2])
                for tp in taps[t:t + m]
            ]
            packed = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
            chunk = pltpu.bitcast(packed, jnp.bfloat16)
            c = jnp.dot(wc_ref[0, :, t * NF:(t + m) * NF], chunk,
                        preferred_element_type=jnp.float32)
            acc = c if acc is None else acc + c
        out = jnp.where(valid, acc + bc_ref[:], 0.0)
        o_ref[0, pi * 8:(pi + 1) * 8] = out.astype(jnp.bfloat16)


def fused_tail3_blocks(blocks: jnp.ndarray, feat_blocks: jnp.ndarray,
                       extents: jnp.ndarray, wts: Dict, nw: int,
                       interpret: bool = False) -> jnp.ndarray:
    """blocks: the merge body's output blocks (NB, 64, PX) bf16 with
    stale rings (refreshed in-kernel from neighbor interiors);
    feat_blocks: the head extraction blocks (valid rings).
    Returns (NB, 128, PX) bf16 (16 4x-phases x 8 rows, rows 0-2 = RGB).
    """
    nb = blocks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=fr._merge_in_specs(nb, nw)
                 + [pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                                 memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec((1, 128, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NF // 2, PX), jnp.int32),   # ring-merged input
            pltpu.VMEM((NF // 2, PX), jnp.int32),   # stage-S out (packed)
            pltpu.VMEM((128, PX), jnp.int32),       # A0: 4 x 64ch packed
            pltpu.VMEM((512, PX), jnp.int32),       # A: 16 x 64ch packed
            pltpu.VMEM((512, PX), jnp.int32),       # B
        ],
    )
    return pl.pallas_call(
        _tail3_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 128, PX), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=fr.VMEM_LIMIT),
        interpret=interpret,
    )(extents, *([blocks] * 9), feat_blocks, wts["Ws"], wts["Wa0"],
      wts["Wa"], wts["Wb"], wts["Wc"], wts["bs"], wts["ba0"], wts["ba"],
      wts["bb"], wts["bc"])


def tail3_image(out_blocks: jnp.ndarray, feat_blocks: jnp.ndarray,
                extents: jnp.ndarray, b: int, nh: int, nw: int,
                h: int, w: int, wts: Dict,
                interpret: bool = False) -> jnp.ndarray:
    """Resident blocks -> (B, 4h, 4w, 3) bf16 image (two-stage
    depth-to-space, see fused_tail.fused_tail2_image)."""
    out = fused_tail3_blocks(out_blocks, feat_blocks, extents, wts, nw,
                             interpret=interpret)
    out = out.reshape(b, nh, nw, 128, S, S)[
        :, :, :, :, HALO:S - HALO, HALO:S - HALO]
    out = out.reshape(b, nh, nw, 128, BH, BH)
    out = out.transpose(0, 3, 1, 4, 2, 5).reshape(b, 128, nh * BH, nw * BH)
    out = out[:, :, :h, :w]
    t = out.reshape(b, 4, 4, 8, h, w)[:, :, :, :3]   # (B, P, Q, 3, h, w)
    y = t.transpose(0, 3, 1, 4, 5, 2).reshape(b, 3, 4, h, 4 * w)
    y = y.transpose(0, 1, 3, 2, 4).reshape(b, 3, 4 * h, 4 * w)
    return y.transpose(0, 2, 3, 1)
