"""Fused Real-ESRGAN tail: conv_up2 -> conv_hr -> conv_last as ONE
Pallas kernel at LOW resolution via phase decomposition.

Replaces the XLA tail's 4K-resolution convs (the 64-channel 3x3s run at
~10-23 TFLOP/s there — C=64 half-fills the 128-wide MXU and the 4K
intermediates are ~1 GB of HBM traffic each). The phase trick:

- ``conv_up2`` consumes a nearest-2x upsample: output 4K pixel
  (2i+a, 2j+b) only reads low-res pixels {i-1+a, i+a} x {j-1+b, j+b},
  so per output phase (a, b) it is a 2x2-tap conv at LOW res
  (exactly fold_upconv_nearest2's sparsity, exploited instead of
  padded dense).
- ``conv_hr``/``conv_last`` consume a (virtual) pixel_shuffle: 4K tap
  (di, dj) of output phase (a, b) reads input phase
  ((a+di-1) mod 2, (b+dj-1) mod 2) at low-res offset
  (floor((a+di-1)/2), floor((b+dj-1)/2)) — 9 taps per output phase,
  same FLOPs as the 4K conv, but everything stays at low res in VMEM
  and no shuffle is ever materialized.

The kernel keeps a spatial block resident across all 3 convs (halo 3),
stores activations packed two-bf16-per-int32 (lane rolls move whole
words — see ops/fused_rrdb.py), and emits 12-channel phase-RGB
(channel = (a*2+b)*3 + rgb); one cheap XLA depth-to-space produces the
4K image. Border exactness via per-block valid extents (biases make
the net non-zero-preserving, so out-of-frame activations are masked
after every conv, reproducing SAME zero-padding at 4K).

This is the TPU-native answer to the reference's TensorRT-fused
upsample tail (reference processors/pytorch_realesrgan.py RRDBNet
tail; infrastructure/gpu/backends/tensorrt.py engine fusion).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

S = int(_os.environ.get("FW_TAIL_S", "64"))
HALO = 3                  # 3 convs, each needs 1 low-res halo px
BH = S - 2 * HALO
PX = S * S
NF = 64
PHASES = tuple((a, b) for a in (0, 1) for b in (0, 1))


# ---------------------------------------------------------------------------
# Weight preparation (host)
# ---------------------------------------------------------------------------

def _up2_phase_weights(w: np.ndarray, a: int, b: int
                       ) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """Per-phase 2x2 tap weights for conv-after-nearest-2x.

    w: (3,3,64,64) HWIO. Returns (W (64, 4*64) tap-major, taps
    [(dr,dc)x4]). Phase a row offsets: a=0 -> (-1, 0) with rows
    (w0, w1+w2); a=1 -> (0, 1) with (w0+w1, w2)."""
    def axis_groups(a):
        if a == 0:
            return [(-1, [0]), (0, [1, 2])]
        return [(0, [0, 1]), (1, [2])]

    taps = []
    cols = []
    for dr, dis in axis_groups(a):
        for dc, djs in axis_groups(b):
            ww = np.zeros((w.shape[2], w.shape[3]), np.float32)
            for di in dis:
                for dj in djs:
                    ww += w[di, dj]
            taps.append((dr, dc))
            cols.append(ww.T)  # (out, in)
    return np.concatenate(cols, axis=1), taps


def _ps_phase_taps(a: int, b: int) -> List[Tuple[int, int, int, int]]:
    """conv-3x3-after-pixel-shuffle tap map for output phase (a, b):
    [(in_phase_p, in_phase_q, dr, dc) for each of the 9 4K taps]."""
    out = []
    for di in range(3):
        r = a + di - 1
        p, dr = r & 1, (r - (r & 1)) // 2
        for dj in range(3):
            c = b + dj - 1
            q, dc = c & 1, (c - (c & 1)) // 2
            out.append((p, q, dr, dc))
    return out


def tail_phase_weights(conv_up2: Dict, conv_hr: Dict, conv_last: Dict,
                       dtype=jnp.bfloat16) -> Dict:
    """Build the kernel's weight bundle from the three tail convs
    (HWIO ``w`` + ``b`` each, as stored by models/rrdb.py)."""
    w_up2 = np.asarray(conv_up2["w"], np.float32)
    w_hr = np.asarray(conv_hr["w"], np.float32)
    w_last = np.asarray(conv_last["w"], np.float32)
    n_out = w_last.shape[3]            # 3 RGB
    pad_out = 8                        # sublane-align the last conv

    wa, wb, wc = [], [], []
    taps_a = []
    for (a, b) in PHASES:
        w, taps = _up2_phase_weights(w_up2, a, b)
        wa.append(w)
        taps_a.append(taps)
        # hr / last: weight columns in 4K-tap order (di, dj); the
        # in-phase/roll routing (_ps_phase_taps) is applied kernel-side
        cols_hr = []
        cols_last = []
        for di in range(3):
            for dj in range(3):
                cols_hr.append(w_hr[di, dj].T)
                cl = np.zeros((pad_out, w_last.shape[2]), np.float32)
                cl[:n_out] = w_last[di, dj].T
                cols_last.append(cl)
        wb.append(np.concatenate(cols_hr, axis=1))
        wc.append(np.concatenate(cols_last, axis=1))

    bl = np.zeros((pad_out, 1), np.float32)
    bl[:n_out, 0] = np.asarray(conv_last["b"], np.float32)
    return {
        "Wa": jnp.asarray(np.stack(wa), dtype),          # (4, 64, 256)
        "Wb": jnp.asarray(np.stack(wb), dtype),          # (4, 64, 576)
        "Wc": jnp.asarray(np.stack(wc), dtype),          # (4, 8, 576)
        "ba": jnp.asarray(np.asarray(conv_up2["b"], np.float32)
                          .reshape(-1, 1)),
        "bb": jnp.asarray(np.asarray(conv_hr["b"], np.float32)
                          .reshape(-1, 1)),
        "bc": jnp.asarray(bl),
    }


# Static tap tables (phase structure is architecture-fixed)
_TAPS_A = {ph: _up2_phase_weights(np.zeros((3, 3, 1, 1), np.float32),
                                  *ph)[1] for ph in PHASES}
_TAPS_BC = {ph: _ps_phase_taps(*ph) for ph in PHASES}


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _roll(src, dr, dc):
    shift = (-dr) * S + (-dc)
    if shift == 0:
        return src
    return pltpu.roll(src, shift % PX, axis=1)


def _lrelu(v):
    return jnp.where(v >= 0, v, 0.2 * v)


def _tail_kernel(ext_ref, x_ref, wa_ref, wb_ref, wc_ref, ba_ref, bb_ref,
                 bc_ref, o_ref, a_ref, b_ref):
    bi = pl.program_id(0)
    r0 = ext_ref[bi, 0]
    r1 = ext_ref[bi, 1]
    c0 = ext_ref[bi, 2]
    c1 = ext_ref[bi, 3]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    rows = lanes // S
    cols = lanes % S
    valid = (rows >= r0) & (rows < r1) & (cols >= c0) & (cols < c1)

    def act_pack(v):
        m = jnp.where(valid, _lrelu(v).astype(jnp.bfloat16),
                      jnp.bfloat16(0.0))
        return pltpu.bitcast(m, jnp.int32)

    xp = pltpu.bitcast(x_ref[0], jnp.int32)       # (32, PX) packed 64ch

    # stage A: conv_up2 per phase (2x2 taps, K=256 single dot)
    for pi, ph in enumerate(PHASES):
        parts = [_roll(xp, dr, dc) for dr, dc in _TAPS_A[ph]]
        chunk = pltpu.bitcast(jnp.concatenate(parts, axis=0), jnp.bfloat16)
        acc = jnp.dot(wa_ref[pi], chunk, preferred_element_type=jnp.float32)
        a_ref[pi * 32:(pi + 1) * 32] = act_pack(acc + ba_ref[:])

    # stage B: conv_hr per phase (9 taps over phase blocks, K=128 chunks)
    for pi, ph in enumerate(PHASES):
        taps = _TAPS_BC[ph]
        acc = None
        for t in range(0, 9, 2):
            m = min(2, 9 - t)
            parts = [
                _roll(a_ref[(tp[0] * 2 + tp[1]) * 32:
                            (tp[0] * 2 + tp[1]) * 32 + 32], tp[2], tp[3])
                for tp in taps[t:t + m]
            ]
            packed = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
            chunk = pltpu.bitcast(packed, jnp.bfloat16)
            c = jnp.dot(wb_ref[pi, :, t * NF:(t + m) * NF], chunk,
                        preferred_element_type=jnp.float32)
            acc = c if acc is None else acc + c
        b_ref[pi * 32:(pi + 1) * 32] = act_pack(acc + bb_ref[:])

    # stage C: conv_last per phase (9 taps, 8 output rows: 3 RGB + pad)
    for pi, ph in enumerate(PHASES):
        taps = _TAPS_BC[ph]
        acc = None
        for t in range(0, 9, 2):
            m = min(2, 9 - t)
            parts = [
                _roll(b_ref[(tp[0] * 2 + tp[1]) * 32:
                            (tp[0] * 2 + tp[1]) * 32 + 32], tp[2], tp[3])
                for tp in taps[t:t + m]
            ]
            packed = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
            chunk = pltpu.bitcast(packed, jnp.bfloat16)
            c = jnp.dot(wc_ref[pi, :, t * NF:(t + m) * NF], chunk,
                        preferred_element_type=jnp.float32)
            acc = c if acc is None else acc + c
        out = jnp.where(valid, acc + bc_ref[:], 0.0)
        o_ref[0, pi * 8:(pi + 1) * 8] = out.astype(jnp.bfloat16)


def fused_tail_blocks(blocks: jnp.ndarray, extents: jnp.ndarray,
                      wts: Dict, interpret: bool = False) -> jnp.ndarray:
    """blocks: (NB, 64, PX) bf16 -> (NB, 32, PX) bf16 (4 phases x 8 rows,
    rows 0-2 of each group = RGB)."""
    nb = blocks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, 32, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((128, PX), jnp.int32),   # stage-A phases (256 ch)
            pltpu.VMEM((128, PX), jnp.int32),   # stage-B phases
        ],
    )
    return pl.pallas_call(
        _tail_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 32, PX), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_os.environ.get("FW_RDB_VMEM_MB", "100"))
            * 1024 * 1024),
        interpret=interpret,
    )(extents, blocks, wts["Wa"], wts["Wb"], wts["Wc"], wts["ba"],
      wts["bb"], wts["bc"])


# ---------------------------------------------------------------------------
# Image-level wrapper
# ---------------------------------------------------------------------------

def _grid_dims(h: int, w: int) -> Tuple[int, int]:
    return -(-h // BH), -(-w // BH)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def fused_tail_image(feat_cm: jnp.ndarray, wts: Dict, h: int, w: int,
                     interpret: bool = False) -> jnp.ndarray:
    """feat_cm: (B, 64, h, w) bf16 (input of conv_up2's upsample, i.e.
    the lrelu(conv_up1(...)) output) -> (B, 2h, 2w, 3) bf16."""
    b = feat_cm.shape[0]
    nh, nw = _grid_dims(h, w)
    hp, wp = nh * BH, nw * BH
    x = jnp.pad(feat_cm, ((0, 0), (0, 0), (HALO, hp - h + HALO),
                          (HALO, wp - w + HALO)))
    windows = []
    extents = []
    for i in range(nh):
        for j in range(nw):
            windows.append(jax.lax.slice(
                x, (0, 0, i * BH, j * BH), (b, NF, i * BH + S, j * BH + S)))
            extents.append((HALO if i == 0 else 0,
                            min(S, HALO + h - i * BH),
                            HALO if j == 0 else 0,
                            min(S, HALO + w - j * BH)))
    nt = nh * nw
    blocks = jnp.stack(windows, axis=1).reshape(b * nt, NF, PX)
    ext = jnp.asarray(np.tile(np.asarray(extents, np.int32), (b, 1)))
    out = fused_tail_blocks(blocks, ext, wts, interpret=interpret)
    out = out.reshape(b, nt, 32, S, S)[:, :, :, HALO:S - HALO, HALO:S - HALO]
    out = out.reshape(b, nh, nw, 32, BH, BH)
    out = out.transpose(0, 3, 1, 4, 2, 5).reshape(b, 32, hp, wp)
    out = out[:, :, :h, :w]
    # depth-to-space: channel (a*2+b)*8 + c -> 4K pixel (2i+a, 2j+b, c)
    t = out.reshape(b, 4, 8, h, w)[:, :, :3]          # (B, 4, 3, h, w)
    t = t.reshape(b, 2, 2, 3, h, w).transpose(0, 4, 1, 5, 2, 3)
    return t.reshape(b, 2 * h, 2 * w, 3)
