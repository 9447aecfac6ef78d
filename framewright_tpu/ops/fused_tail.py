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
# Extended tail: conv_up1 folded in (input at BODY resolution).
#
# The round-4 device trace showed conv_up1's XLA conv at 1080p costs
# ~10 ms/frame (compare_select_fusion + conv fusions) plus the
# 1080-res block extraction feeding the phase-tail kernel. This
# variant takes lrelu-input feat1 = conv_body(body)+skip at 540-res
# and computes ALL FOUR tail convs in one kernel:
#   A0: conv_up1-after-nearest2x -> 4 phases of the 1080 image
#   A : conv_up2-after-nearest2x of the 1080 image -> 16 phases of the
#       4K image over the 540 grid (phase-of-phase routing)
#   B/C: conv_hr/conv_last 3x3 at 4K phase-routed over the 16 phases
# Halo 4 (one ring per stage) at 540-res blocks.
# ---------------------------------------------------------------------------

S2 = int(_os.environ.get("FW_TAIL2_S", "96"))
HALO2 = 4
BH2 = S2 - 2 * HALO2
PX2 = S2 * S2


def _phase_route_a(P: int, Q: int):
    """conv_up2 tap routing for 4K phase (P, Q) over the 540 grid:
    [(a0_phase, dr, dc) x4] in _up2_phase_weights tap order.

    4K row = 4s + P with P = 2p + A (p = 1080-phase bit, A = conv_up2
    output phase). conv_up2's 2x2 support reads 1080 rows p+d for
    d in {-1,0} (A=0) or {0,1} (A=1); 1080 row u = 2s' + p' maps to
    a0-phase p' = u & 1 at 540-offset u >> 1 (arithmetic shift keeps
    -1 correct: phase 1, offset -1)."""
    def axis(pax):
        p, amp = pax >> 1, pax & 1
        ds = (-1, 0) if amp == 0 else (0, 1)
        return [((p + d) & 1, (p + d) >> 1) for d in ds]

    taps = []
    for pr, dr in axis(P):
        for pc, dc in axis(Q):
            taps.append((pr * 2 + pc, dr, dc))
    return taps


def _phase_route_bc(P: int, Q: int):
    """3x3 conv at 4K for output phase (P, Q) over the 16-phase form:
    [(in_phase16, dr, dc) x9] in (di, dj) tap order. 4K tap row
    4s + P + di - 1 -> phase (P+di-1) mod 4 at 540-offset
    (P+di-1) >> 2."""
    out = []
    for di in range(3):
        r = P + di - 1
        pr, dr = r & 3, r >> 2
        for dj in range(3):
            c = Q + dj - 1
            pc, dc = c & 3, c >> 2
            out.append((pr * 4 + pc, dr, dc))
    return out


_PHASES16 = tuple((P, Q) for P in range(4) for Q in range(4))
_TAPS_A2 = {ph: _phase_route_a(*ph) for ph in _PHASES16}
_TAPS_BC2 = {ph: _phase_route_bc(*ph) for ph in _PHASES16}


def tail2_phase_weights(conv_up1: Dict, conv_up2: Dict, conv_hr: Dict,
                        conv_last: Dict, dtype=jnp.bfloat16) -> Dict:
    """Weight bundle for the extended tail kernel."""
    base = tail_phase_weights(conv_up2, conv_hr, conv_last, dtype)
    w_up1 = np.asarray(conv_up1["w"], np.float32)
    wa0 = []
    for (a, b) in PHASES:
        w, _ = _up2_phase_weights(w_up1, a, b)
        wa0.append(w)
    return {
        "Wa0": jnp.asarray(np.stack(wa0), dtype),        # (4, 64, 256)
        "ba0": jnp.asarray(np.asarray(conv_up1["b"], np.float32)
                           .reshape(-1, 1)),
        "Wa": base["Wa"], "Wb": base["Wb"], "Wc": base["Wc"],
        "ba": base["ba"], "bb": base["bb"], "bc": base["bc"],
    }


@functools.lru_cache(maxsize=None)
def _make_tail2_kernel(s2: int, out_mode: str = "bf16",
                       full_range: bool = False):
    """The extended phase-tail kernel body, closed over the block side
    ``s2`` (geometry-parametric: S2 is the tuned image-level default;
    the resident tail3b path runs the same kernel at the BODY geometry
    S=112 directly on the merge body's blocks — ops/fused_tail3.py).

    ``out_mode`` selects the kernel epilogue:
      "bf16"      — (nb, 128, px2) bf16 phase-RGB (16 phases x 8 rows).
      "rgb_u8"    — same layout, but quantized IN-KERNEL to uint8
                    (floor(clip(y,0,1)*255+0.5)) — the production
                    contract (the SR jit emits uint8 anyway), at half
                    the output write traffic and a uint8 downstream
                    depth-to-space (the round-4 trace's top non-kernel
                    op at ~13.5 ms/frame was the bf16 d2s ROOT reshape).
      "yuv420_u8" — three outputs (Y (nb,16,px2), U (nb,4,px2),
                    V (nb,4,px2)) uint8: BT.601 CSC folded into the
                    kernel; the 4:2:0 subsample is FREE in phase space
                    (each half-res chroma sample is the mean of 4 phase
                    rows at the SAME low-res lane) — replaces the SR
                    jit's whole-4K XLA CSC + reshape-mean subsample
                    (processors/super_resolution.py run()) and cuts
                    kernel output bytes 10.7x vs bf16 phase-RGB.
    """
    px2 = s2 * s2

    def roll(src, dr, dc):
        shift = (-dr) * s2 + (-dc)
        if shift == 0:
            return src
        return pltpu.roll(src, shift % px2, axis=1)

    def kernel(ext_ref, x_ref, wa0_ref, wa_ref, wb_ref, wc_ref,
               ba0_ref, ba_ref, bb_ref, bc_ref, *rest):
        # rest: [wy_ref, by_ref (yuv420_u8 only)], o_ref, a0_ref, a_ref,
        #       b_ref, [c_ref (u8 modes)]
        if out_mode == "yuv420_u8":
            wy_ref, by_ref = rest[0], rest[1]
            o_ref, a0_ref, a_ref, b_ref, c_ref = rest[2:]
        elif out_mode == "rgb_u8":
            o_ref, a0_ref, a_ref, b_ref, c_ref = rest
        else:
            o_ref, a0_ref, a_ref, b_ref = rest
        bi = pl.program_id(0)
        r0 = ext_ref[bi, 0]
        r1 = ext_ref[bi, 1]
        c0 = ext_ref[bi, 2]
        c1 = ext_ref[bi, 3]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, px2), 1)
        rows = lanes // s2
        cols = lanes % s2
        valid = (rows >= r0) & (rows < r1) & (cols >= c0) & (cols < c1)

        def act_pack(v):
            m = jnp.where(valid, _lrelu(v).astype(jnp.bfloat16),
                          jnp.bfloat16(0.0))
            return pltpu.bitcast(m, jnp.int32)

        xp = pltpu.bitcast(x_ref[0], jnp.int32)       # (32, px2)

        # A0: conv_up1 phases (input 540 -> 1080-phase form)
        for pi, ph in enumerate(PHASES):
            parts = [roll(xp, dr, dc) for dr, dc in _TAPS_A[ph]]
            chunk = pltpu.bitcast(jnp.concatenate(parts, axis=0),
                                  jnp.bfloat16)
            acc = jnp.dot(wa0_ref[pi], chunk,
                          preferred_element_type=jnp.float32)
            a0_ref[pi * 32:(pi + 1) * 32] = act_pack(acc + ba0_ref[:])

        # A: conv_up2 phase-of-phase (1080-phase -> 16-phase 4K form)
        for pi, (P, Q) in enumerate(_PHASES16):
            wa_idx = (P & 1) * 2 + (Q & 1)        # conv_up2 phase (A, B)
            parts = [
                roll(a0_ref[ip * 32:(ip + 1) * 32], dr, dc)
                for ip, dr, dc in _TAPS_A2[(P, Q)]
            ]
            chunk = pltpu.bitcast(jnp.concatenate(parts, axis=0),
                                  jnp.bfloat16)
            acc = jnp.dot(wa_ref[wa_idx], chunk,
                          preferred_element_type=jnp.float32)
            a_ref[pi * 32:(pi + 1) * 32] = act_pack(acc + ba_ref[:])

        # B: conv_hr at 4K (phase-routed 3x3 over the 16-phase form)
        for pi, ph in enumerate(_PHASES16):
            taps = _TAPS_BC2[ph]
            acc = None
            for t in range(0, 9, 3):
                m = min(3, 9 - t)
                parts = [
                    roll(a_ref[tp[0] * 32:tp[0] * 32 + 32], tp[1], tp[2])
                    for tp in taps[t:t + m]
                ]
                packed = (parts[0] if m == 1
                          else jnp.concatenate(parts, axis=0))
                chunk = pltpu.bitcast(packed, jnp.bfloat16)
                c = jnp.dot(wb_ref[0, :, t * NF:(t + m) * NF], chunk,
                            preferred_element_type=jnp.float32)
                acc = c if acc is None else acc + c
            b_ref[pi * 32:(pi + 1) * 32] = act_pack(acc + bb_ref[:])

        # C: conv_last at 4K -> 16 phases x 8 rows (3 RGB + pad)
        for pi, ph in enumerate(_PHASES16):
            taps = _TAPS_BC2[ph]
            acc = None
            for t in range(0, 9, 3):
                m = min(3, 9 - t)
                parts = [
                    roll(b_ref[tp[0] * 32:tp[0] * 32 + 32], tp[1], tp[2])
                    for tp in taps[t:t + m]
                ]
                packed = (parts[0] if m == 1
                          else jnp.concatenate(parts, axis=0))
                chunk = pltpu.bitcast(packed, jnp.bfloat16)
                c = jnp.dot(wc_ref[0, :, t * NF:(t + m) * NF], chunk,
                            preferred_element_type=jnp.float32)
                acc = c if acc is None else acc + c
            out = jnp.where(valid, acc + bc_ref[:], 0.0)
            if out_mode == "bf16":
                o_ref[0, pi * 8:(pi + 1) * 8] = out.astype(jnp.bfloat16)
            else:
                c_ref[pi * 8:(pi + 1) * 8] = out   # f32, 8-row aligned

        if out_mode == "rgb_u8":
            # production quantization (super_resolution.run():
            # floor(clip(y,0,1)*255+0.5)) folded into the kernel.
            # Mosaic has no f32->u8 cast: go through int32.
            cc = jnp.clip(c_ref[:], 0.0, 1.0) * 255.0
            o_ref[0] = (jnp.floor(cc + 0.5).astype(jnp.int32)
                        .astype(jnp.uint8))
        elif out_mode == "yuv420_u8":
            # everything after the RGB clip is LINEAR (BT.601 matrix,
            # range scaling, the 4:2:0 mean of 4 phase rows at the same
            # low-res lane) -> ONE (24,128)x(128,px2) dot. Rows 0:16 Y
            # per 4K phase P*4+Q, 16:20 U420 per half-res phase
            # py*2+qx, 20:24 V420. by_ref carries offset+0.5 so floor
            # rounds exactly like the XLA path.
            cc = jnp.clip(c_ref[:], 0.0, 1.0)
            yuv = jnp.dot(wy_ref[:], cc, preferred_element_type=jnp.float32)
            o_ref[0] = (jnp.clip(jnp.floor(yuv + by_ref[:]), 0.0, 255.0)
                        .astype(jnp.int32).astype(jnp.uint8))

    return kernel


@functools.lru_cache(maxsize=None)
def yuv420_matrix(full_range: bool = False):
    """(M (24,128), b (24,1)) f32: phase-RGB (clipped to [0,1]) ->
    [Y x16 phases, U420 x4, V420 x4] in the 0..255 uint8 domain,
    matching processors/super_resolution.py run()'s BT.601 math
    bit-closely (coefficients pre-multiplied; bias includes the +0.5
    rounding offset so floor() == the XLA floor(x+0.5)).

    Returns NUMPY arrays: this function is lru_cached, and a jnp array
    created during a jit trace is a tracer — caching it leaks it into
    later traces (UnexpectedTracerError on the second batch size)."""
    kr, kg, kb = 0.299, 0.587, 0.114
    fy = 219.0 if not full_range else 255.0
    fc = 224.0 if not full_range else 255.0
    m = np.zeros((24, 128), np.float32)
    b = np.zeros((24, 1), np.float32)
    ucoef = np.asarray([-kr, -kg, 1.0 - kb], np.float32) / (2.0 * (1.0 - kb))
    vcoef = np.asarray([1.0 - kr, -kg, -kb], np.float32) / (2.0 * (1.0 - kr))
    for pi in range(16):
        m[pi, pi * 8:pi * 8 + 3] = np.asarray([kr, kg, kb], np.float32) * fy
        b[pi, 0] = (16.5 if not full_range else 0.5)
    for py in (0, 1):
        for qx in (0, 1):
            j = py * 2 + qx
            for a in (0, 1):
                for bb_ in (0, 1):
                    pi = (2 * py + a) * 4 + (2 * qx + bb_)
                    m[16 + j, pi * 8:pi * 8 + 3] = 0.25 * fc * ucoef
                    m[20 + j, pi * 8:pi * 8 + 3] = 0.25 * fc * vcoef
            b[16 + j, 0] = 128.5
            b[20 + j, 0] = 128.5
    return m, b


def fused_tail2_blocks(blocks: jnp.ndarray, extents: jnp.ndarray,
                       wts: Dict, interpret: bool = False,
                       out_mode: str = "bf16",
                       full_range: bool = False) -> jnp.ndarray:
    """blocks: (NB, 64, s2*s2) bf16 at BODY res -> phase-form output
    per ``out_mode`` (see _make_tail2_kernel):
      bf16      (NB, 128, px2) bf16
      rgb_u8    (NB, 128, px2) uint8
      yuv420_u8 (NB, 24, px2) uint8 (rows 0:16 Y, 16:20 U420, 20:24 V)
    The block side s2 is inferred from the lane count (square blocks)."""
    nb = blocks.shape[0]
    px2 = int(blocks.shape[-1])
    s2 = int(round(px2 ** 0.5))
    assert s2 * s2 == px2, blocks.shape
    yuv = out_mode == "yuv420_u8"
    n_extra = 2 if yuv else 0
    scratch = [
        pltpu.VMEM((128, px2), jnp.int32),   # A0: 4 x 64ch packed
        pltpu.VMEM((512, px2), jnp.int32),   # A: 16 x 64ch packed
        pltpu.VMEM((512, px2), jnp.int32),   # B
    ]
    if out_mode != "bf16":
        scratch.append(pltpu.VMEM((128, px2), jnp.float32))  # C (f32)
    if yuv:
        out_shape = jax.ShapeDtypeStruct((nb, 24, px2), jnp.uint8)
        out_rows = 24
    elif out_mode == "rgb_u8":
        out_shape = jax.ShapeDtypeStruct((nb, 128, px2), jnp.uint8)
        out_rows = 128
    else:
        out_shape = jax.ShapeDtypeStruct((nb, 128, px2), jnp.bfloat16)
        out_rows = 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, NF, px2), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (8 + n_extra),
        out_specs=pl.BlockSpec((1, out_rows, px2), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    args = [extents, blocks, wts["Wa0"], wts["Wa"], wts["Wb"], wts["Wc"],
            wts["ba0"], wts["ba"], wts["bb"], wts["bc"]]
    if yuv:
        args.extend(jnp.asarray(a) for a in yuv420_matrix(full_range))
    return pl.pallas_call(
        _make_tail2_kernel(s2, out_mode, full_range),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_os.environ.get("FW_RDB_VMEM_MB", "100"))
            * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def fused_tail2_image(feat_cm: jnp.ndarray, wts: Dict, h: int, w: int,
                      interpret: bool = False) -> jnp.ndarray:
    """feat_cm: (B, 64, h, w) bf16 at BODY resolution (conv_body+skip
    output, BEFORE conv_up1) -> (B, 4h, 4w, 3) bf16."""
    b = feat_cm.shape[0]
    nh, nw = -(-h // BH2), -(-w // BH2)
    hp, wp = nh * BH2, nw * BH2
    x = jnp.pad(feat_cm, ((0, 0), (0, 0), (HALO2, hp - h + HALO2),
                          (HALO2, wp - w + HALO2)))
    windows = []
    extents = []
    for i in range(nh):
        for j in range(nw):
            windows.append(jax.lax.slice(
                x, (0, 0, i * BH2, j * BH2),
                (b, NF, i * BH2 + S2, j * BH2 + S2)))
            extents.append((HALO2 if i == 0 else 0,
                            min(S2, HALO2 + h - i * BH2),
                            HALO2 if j == 0 else 0,
                            min(S2, HALO2 + w - j * BH2)))
    nt = nh * nw
    blocks = jnp.stack(windows, axis=1).reshape(b * nt, NF, PX2)
    ext = jnp.asarray(np.tile(np.asarray(extents, np.int32), (b, 1)))
    out = fused_tail2_blocks(blocks, ext, wts, interpret=interpret)
    out = out.reshape(b, nt, 128, S2, S2)[
        :, :, :, HALO2:S2 - HALO2, HALO2:S2 - HALO2]
    out = out.reshape(b, nh, nw, 128, BH2, BH2)
    out = out.transpose(0, 3, 1, 4, 2, 5).reshape(b, 128, hp, wp)
    out = out[:, :, :h, :w]
    # depth-to-space x4: channel (P*4+Q)*8 + c -> 4K pixel (4i+P, 4j+Q, c).
    # Two-stage interleave (lanes Q first, then rows P, then the NHWC
    # move) instead of one 6-D transpose: the single-shot ROOT reshape
    # was the top non-kernel op in the round-4 device trace (~13.5 ms/
    # frame); this form measured ~6 ms/frame faster in context
    # (scripts/bench_d2s_ctx.py: 205.1 vs 211.4 ms full-frame).
    t = out.reshape(b, 4, 4, 8, h, w)[:, :, :, :3]   # (B, P, Q, 3, h, w)
    y = t.transpose(0, 3, 1, 4, 5, 2).reshape(b, 3, 4, h, 4 * w)
    y = y.transpose(0, 1, 3, 2, 4).reshape(b, 3, 4 * h, 4 * w)
    return y.transpose(0, 2, 3, 1)


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
