"""Fused ResidualDenseBlock Pallas kernel — the RRDB hot path.

Replaces per-frame `realesrgan-ncnn-vulkan` subprocess calls
(reference restorer.py:1462-1516) with an on-chip fused kernel. Design
(measured on TPU v5e; see bench history in commit messages):

- The naive XLA conv path runs Real-ESRGAN's 32/64-channel 3x3 convs at
  ~11 TFLOP/s (6% MXU): channel dims half/quarter-fill the 128-wide MXU
  and the dense-block concats bounce activations through HBM.
- This kernel keeps a spatial block's features resident in VMEM across
  all 5 dense-block convs and rewrites the math as wide matmuls: each
  conv is split by input source, so one matmul covers ALL remaining
  targets (K = 9*64/9*32 im2col taps, N = 192..64 target channels
  instead of 32). 9x faster than the XLA path (94 vs 11 TFLOP/s).
- Layout is channel-major flattened (C, S*S): im2col taps become single
  lane rotations (pltpu.roll), tap pairs concatenate on the sublane
  axis into K=128/256 chunks, and target-slice accumulation lands on
  8-aligned sublane offsets. Features are stored PACKED: two bf16
  channels per int32 word ((C/2, PX) int32 scratches) — pltpu.roll is
  32-bit only, but a lane-axis roll moves whole words, so both packed
  channels travel together (verified: scripts/probe_bitcast.py P1/P2,
  interleaved mapping word row r <-> bf16 rows 2r/2r+1). Packing halves
  VPU roll traffic and feature VMEM vs the earlier f32 storage and
  removes the per-chunk f32->bf16 cast; matmul operands come straight
  out of pltpu.bitcast, accumulation in f32 — numerics unchanged
  (activations were already rounded through bf16).
- Frame-border exactness: deep nets are not zero-preserving (biases),
  so activations computed for out-of-frame halo pixels must be masked
  to zero after every conv to reproduce SAME zero-padding semantics.
  Per-block valid extents arrive as prefetched scalars.
- Round 4: the MERGE body keeps blocks resident across all sweeps with
  in-kernel ring refresh (see the merge section below), and the int8
  path accumulates in PURE INT32 with shared per-row output scales
  (rdb_wide_weights_int8_i32) — all inter-conv float math collapses
  into one fused requant per stage.

Kernel geometry: S=112 blocks (12544 px lanes, = 98 lane-tiles), halo
8 (>= the 5 sequential convs AND one (8,128)-aligned ring strip for
the merge BlockSpecs), interior 96 — the same 6x10 grid at the
production 540x960 body resolution as the old halo-5 geometry.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Block geometry: interior BH = S - 2*HALO; halo 5 covers the 5
# sequential convs. Swept on v5e (scripts/bench_kernel_raw.py, raised
# VMEM limit): ms/frame body at 540x960 — S=64: 328 bf16 / 399 int8 ·
# S=96: 297/352 · S=112: 270/226 · S=128: 334/308 (padding waste +
# VMEM pressure reverse the trend). S=112 is the production default
# ((112/102)^2 = 1.21x halo recompute vs 1.40x at 64); tests pin S=64
# (smaller interpret-mode blocks) and a slow cross-S test guards 112.
S = int(_os.environ.get("FW_RDB_S", "112"))
# HALO=8 (was 5): any halo >= 5 is numerically valid (garbage grows one
# ring per conv); 8 makes the ring exactly one (8, 128)-aligned lane
# strip (HALO*S % 128 == 0 for S % 16 == 0), which the merge-kernel
# body (rrdb_body_merge) needs to fetch neighbor rings as BlockSpec
# operands. At the production x2 geometry (540x960 body) BH=96 gives
# the SAME 6x10 block grid as BH=102 did — zero extra kernel cost.
HALO = int(_os.environ.get("FW_RDB_HALO", "8"))
BH = S - 2 * HALO          # valid interior
NF, GC = 64, 32            # Real-ESRGAN fixed channel plan
PX = S * S
NT = 192                   # total target channels: 4*32 + 64
TAPS = tuple((di, dj) for di in range(3) for dj in range(3))
# taps/chunk (K per dot). Swept on v5e (scripts/sweep_tpc.py, in one
# process): bf16 best at (4,4); int8 at (4,8); (9,9) regresses (the
# giant concat temporaries outweigh the saved accumulator RMWs).
TPC_NF = int(_os.environ.get("FW_TPC_NF", "4"))    # K=4*64=256
TPC_GC = int(_os.environ.get("FW_TPC_GC", "4"))    # K=4*32=128
TPC_NF_I8 = int(_os.environ.get("FW_TPC_NF_I8", "4"))
TPC_GC_I8 = int(_os.environ.get("FW_TPC_GC_I8", "8"))
# The i32-accumulation kernel has no per-chunk dequant, so one giant
# chunk per source wins (v5e sweep: (9,9) 134.9 ms head+body vs (4,8)
# 142.6, (4,4) 143.2, (8,8) 150.0).
TPC_NF_I32 = int(_os.environ.get("FW_TPC_NF_I32", "9"))
TPC_GC_I32 = int(_os.environ.get("FW_TPC_GC_I32", "9"))
# Scoped-VMEM ceiling for the kernels: the default 16 MiB caps S at 64;
# larger blocks measurably cut the halo-recompute factor (S=96 bf16:
# 328 -> 279 ms/frame body on v5e) and the kernel working set still
# fits comfortably in the 128 MiB core VMEM.
VMEM_LIMIT = int(_os.environ.get("FW_RDB_VMEM_MB", "100")) * 1024 * 1024
# Body variant default (see rrdb_body_fast): "roundtrip" or "merge".
# Measured on v5e (scripts/bench_body_merge.py, head+body at 1080p x2,
# same process): bf16 308.6 -> 208.0 ms, int8-static 296.0 -> 186.7 ms.
_BODY_DEFAULT = "merge"


# ---------------------------------------------------------------------------
# Weight transformation: basicsr RDB params -> wide target-major form
# ---------------------------------------------------------------------------

def rdb_wide_weights(rdb_params: Dict, dtype=jnp.bfloat16) -> Dict:
    """{conv1..conv5: {w (3,3,Cin,Cout) HWIO, b}} -> wide matrices.

    W_src has shape (num_targets_from_src, 9*C_src): row t = target
    channel, columns grouped by tap (tap-major) then source channel —
    matching the kernel's chunk concat order.
    """
    convs = [rdb_params[f"conv{k}"] for k in range(1, 6)]
    outs = [32, 32, 32, 32, 64]
    # sources: x (64ch) feeds convs1-5; x1 feeds convs2-5; ... x4 feeds conv5
    def wide_for_source(src_idx: int, c_src: int) -> np.ndarray:
        # channels of this source inside conv_k's input concat start at:
        off = 64 + 32 * (src_idx - 1) if src_idx > 0 else 0
        n_targets = NT - (32 * src_idx if src_idx > 0 else 0)
        w = np.zeros((n_targets, 9 * c_src), np.float32)
        trow = 0
        for k in range(src_idx, 5):  # conv indices this source feeds
            wk = np.asarray(convs[k]["w"], np.float32)  # (3,3,Cin,Cout)
            for t, (di, dj) in enumerate(TAPS):
                # columns [t*c_src:(t+1)*c_src] = tap (di,dj)
                w[trow:trow + outs[k], t * c_src:(t + 1) * c_src] = (
                    wk[di, dj, off:off + c_src, :].T
                )
            trow += outs[k]
        return w

    b = np.zeros((NT, 1), np.float32)
    row = 0
    for k in range(5):
        b[row:row + outs[k], 0] = np.asarray(convs[k]["b"], np.float32)
        row += outs[k]
    return {
        "Wx": jnp.asarray(wide_for_source(0, NF), dtype),
        "W1": jnp.asarray(wide_for_source(1, GC), dtype),
        "W2": jnp.asarray(wide_for_source(2, GC), dtype),
        "W3": jnp.asarray(wide_for_source(3, GC), dtype),
        "W4": jnp.asarray(wide_for_source(4, GC), dtype),
        "b": jnp.asarray(b, jnp.float32),
    }


def rdb_wide_weights_int8(rdb_params: Dict, act_amax=None) -> Dict:
    """Wide RDB weights quantized to int8 with per-row (per-target-
    channel) scales — the TensorRT-INT8 analog for the fused body
    (reference infrastructure/gpu/backends/tensorrt.py:110-455).

    Without ``act_amax``, activations are quantized dynamically
    in-kernel (per-tensor absmax per block) — no calibration needed.
    With ``act_amax`` (5,) — per-stage ranges from
    rrdb.calibrate_act_scales — STATIC scales are packed alongside
    ("act_q": [sa*5, inv*5]) and the kernel skips the absmax
    reduction (measured 5.78 -> 3.68 ms/sweep on v5e)."""
    wide = rdb_wide_weights(rdb_params, dtype=jnp.float32)
    out = {"b": jnp.asarray(wide["b"], jnp.float32)}
    for k in ("Wx", "W1", "W2", "W3", "W4"):
        w = np.asarray(wide[k], np.float32)
        s = np.maximum(np.abs(w).max(axis=1, keepdims=True), 1e-12) / 127.0
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        out[k] = jnp.asarray(q)
        out["s" + k[1:]] = jnp.asarray(s, jnp.float32)  # sx, s1..s4
    if act_amax is not None:
        amax = np.maximum(np.asarray(act_amax, np.float32), 1e-8)
        sa = amax / 127.0
        out["act_q"] = jnp.asarray(np.concatenate([sa, 1.0 / sa]),
                                   jnp.float32)
    return out


def rdb_wide_weights_int8_i32(rdb_params: Dict, act_amax) -> Dict:
    """int8 wide weights for the PURE-INT32-ACCUMULATION kernel.

    The f32-accumulating int8 kernel spends 3 VPU passes per matmul
    chunk (i32->f32 cast, scale fma, accumulate) — the serial inter-conv
    VPU chain that caps int8 at ~1.1x bf16 (PERF.md). Here the weight
    quantization scales are chosen so every source's contribution to a
    target row shares ONE output scale:

        s_t = max_src(sa_src * amax_w(src, t)) / 127
        W_src rows quantized at scale s_t / sa_src
        => real contribution = s_t * (int32 dot), addable ACROSS sources

    so the accumulator stays int32 (one integer add per chunk) and all
    float math collapses into a single per-stage requant fma:
        q_next = clip(round(lrelu(acc * (s_t/sa_next) + b/sa_next)))
    (lrelu commutes with the positive scale). Requires static
    activation ranges (``act_amax`` (5,), from calibrate_act_scales).

    Weight-precision cost vs per-row scales: a source whose
    sa_src*amax_w is far below the row max loses weight bits; the
    quality gate (tests/test_int8_mode.py PSNR-vs-bf16) guards this.
    """
    wide = rdb_wide_weights(rdb_params, dtype=jnp.float32)
    amax = np.maximum(np.asarray(act_amax, np.float32), 1e-8)
    sa = amax / 127.0  # (5,) activation scales for [x, x1..x4]
    keys = ("Wx", "W1", "W2", "W3", "W4")
    ws = [np.asarray(wide[k], np.float32) for k in keys]
    s_t = np.zeros((NT,), np.float32)
    for k, w in enumerate(ws):
        g0 = 32 * k if k > 0 else 0
        cand = sa[k] * np.abs(w).max(axis=1) / 127.0
        s_t[g0:g0 + w.shape[0]] = np.maximum(s_t[g0:g0 + w.shape[0]], cand)
    s_t = np.maximum(s_t, 1e-12)
    out = {}
    for k, w in enumerate(ws):
        g0 = 32 * k if k > 0 else 0
        srow = (s_t[g0:g0 + w.shape[0]] / sa[k])[:, None]
        out[keys[k]] = jnp.asarray(
            np.clip(np.round(w / srow), -127, 127).astype(np.int8))
    b = np.asarray(wide["b"], np.float32)[:, 0]
    osc = np.zeros((NT, 1), np.float32)
    ob = np.zeros((NT, 1), np.float32)
    for k in range(1, 5):  # conv_k rows -> quantized as stage k (sa[k])
        r0, r1 = (k - 1) * 32, k * 32
        osc[r0:r1, 0] = s_t[r0:r1] / sa[k]
        ob[r0:r1, 0] = b[r0:r1] / sa[k]
    osc[128:NT, 0] = s_t[128:NT]
    ob[128:NT, 0] = b[128:NT]
    out["oscale"] = jnp.asarray(osc)
    out["obias"] = jnp.asarray(ob)
    out["act_q"] = jnp.asarray(np.concatenate([sa, 1.0 / sa]), jnp.float32)
    return out


def fold_upconv_nearest2(p: Dict) -> Dict:
    """Fold conv3x3-after-nearest-2x into ONE conv at LOW resolution.

    Identity: for nearest-2x upsampled input, output pixel (2i+a, 2j+b)
    reads only low-res rows {i-1+a, i+a} x cols {j-1+b, j+b}, with taps
    that share a low-res pixel summed. Expressed as a single 3x3 conv
    with 4x the output channels (one block per phase, pixel_shuffle
    ordering) whose per-phase weights are structurally zero outside the
    phase's 2x2 support. Exact (weight fold only); 4/9 the tap-FLOPs of
    the high-res conv and — decisively on TPU — C_out=256 fills the
    128-wide MXU that C_out=64 leaves 50% idle (measured 10.6 vs 62
    TFLOP/s on v5e; PERF.md roadmap item 6).
    """
    w = np.asarray(p["w"], np.float32)   # (3,3,Cin,Cout) HWIO
    b = np.asarray(p["b"], np.float32)
    cin, cout = w.shape[2], w.shape[3]
    # phase a: high tap row di lands on folded kernel row map_a[di]
    rowmap = {0: (0, 1, 1), 1: (1, 1, 2)}
    wf = np.zeros((3, 3, cin, cout * 4), np.float32)
    for a in (0, 1):
        for bb in (0, 1):
            ph = a * 2 + bb
            for di in range(3):
                for dj in range(3):
                    li, lj = rowmap[a][di], rowmap[bb][dj]
                    wf[li, lj, :, ph::4] += w[di, dj]
    return {"w": wf, "b": np.repeat(b, 4)}


def fold_conv_after_ps2(p: Dict) -> Dict:
    """Fold a 3x3 conv APPLIED AFTER pixel_shuffle(x, 2) into ONE dense
    2x2 conv over the pre-shuffle 4C-channel tensor + a phase-shifted
    shuffle (conv_after_ps2_apply).

    High-res output (2i+a, 2j+b) tap (di, dj) reads high pixel
    (2i+a+di-1, ...) = low pixel (i+ly, j+lx) of phase (p, q) with
    r = a+di-1, p = r mod 2, ly = floor(r/2). Each output phase's
    support spans 2 low rows/cols STARTING at (i+a-1, j+b-1), so one
    2x2 conv evaluated at position (i+a, j+b) covers every phase:
    kernel index ki = ly + 1 - a (always in {0, 1}). The per-phase
    evaluation offset is absorbed by the shifted shuffle. Exact; 16/9
    more MACs than the high-res 3x3 but at K=4C/N=4C_out MXU widths
    instead of C=64 at 4x the pixels.
    """
    w = np.asarray(p["w"], np.float32)   # (3,3,C,Cout)
    b = np.asarray(p["b"], np.float32)
    c_in, c_out = w.shape[2], w.shape[3]
    wf = np.zeros((2, 2, c_in * 4, c_out * 4), np.float32)
    for a in (0, 1):
        for bb in (0, 1):
            for di in range(3):
                r = a + di - 1
                ph_p = r % 2
                ly = (r - ph_p) // 2
                for dj in range(3):
                    s = bb + dj - 1
                    ph_q = s % 2
                    lx = (s - ph_q) // 2
                    ki, kj = ly + 1 - a, lx + 1 - bb
                    wf[ki, kj, ph_p * 2 + ph_q::4,
                       (a * 2 + bb)::4] += w[di, dj]
    return {"w": wf, "b": np.repeat(b, 4)}


def conv_after_ps2_apply(folded: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a fold_conv_after_ps2 conv: x (N,H,W,4C) pre-shuffle ->
    (N,2H,2W,C_out), numerically equal to conv3x3(pixel_shuffle(x, 2)).
    """
    import jax.lax as lax

    w = folded["w"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = (y + folded["b"].astype(jnp.float32)).astype(x.dtype)
    n, h1, w1, c4 = y.shape  # (H+1, W+1) positions
    h, wd = h1 - 1, w1 - 1
    c = c4 // 4
    # phase (a,b) reads its conv at position (i+a, j+b)
    parts = [y[:, a:h + a, bb:wd + bb, (a * 2 + bb)::4]
             for a in (0, 1) for bb in (0, 1)]
    t = jnp.stack(parts, axis=3)                      # (n,h,w,4,c)
    t = t.reshape(n, h, wd, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(n, 2 * h, 2 * wd, c)


def rrdb_fast_params(params: Dict, dtype=jnp.bfloat16,
                     compute_dtype: str = "bf16",
                     act_amax=None, int8_scheme: str = None) -> Dict:
    """Full RRDBNet params -> fast-path params: wide RDB weights stacked
    (num_block, 3, ...) for lax.scan; upsample convs folded to low-res
    phase convs (fold_upconv_nearest2); other tail convs unchanged.

    compute_dtype="int8" builds int8 wide weights + scales for the int8
    fast mode; ``act_amax`` (num_block, 3, 5) from
    rrdb.calibrate_act_scales switches it to static activation scales
    (faster — see _rdb_kernel_int8_static)."""
    body = params["body"]
    if not isinstance(body, list):      # stacked storage -> per-block
        nb = jax.tree_util.tree_leaves(body)[0].shape[0]
        body = [jax.tree_util.tree_map(lambda v, i=i: np.asarray(v[i]), body)
                for i in range(nb)]
    if compute_dtype == "int8":
        amax = (None if act_amax is None
                else np.asarray(act_amax, np.float32))
        scheme = int8_scheme or _os.environ.get("FW_INT8_SCHEME", "i32")

        def make(blk_i, rdb_j, rdbp):
            a = None if amax is None else amax[blk_i, rdb_j]
            if a is not None and scheme == "i32":
                return rdb_wide_weights_int8_i32(rdbp, act_amax=a)
            return rdb_wide_weights_int8(rdbp, act_amax=a)
    else:
        def make(blk_i, rdb_j, rdbp):
            return rdb_wide_weights(rdbp, dtype=dtype)
    wides = [
        [make(i, j - 1, blk[f"rdb{j}"]) for j in (1, 2, 3)]
        for i, blk in enumerate(body)
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[
        jax.tree_util.tree_map(lambda *ys: jnp.stack(ys), *w3) for w3 in wides
    ])
    out = {k: v for k, v in params.items() if k != "body"}
    out["body_wide"] = stacked
    for k in ("conv_up1", "conv_up2"):
        if k in params:
            f = fold_upconv_nearest2(params[k])
            out[k + "_folded"] = {"w": jnp.asarray(f["w"]),
                                  "b": jnp.asarray(f["b"])}
    if all(k in params for k in ("conv_up2", "conv_hr", "conv_last")):
        from framewright_tpu.ops.fused_tail import tail_phase_weights
        out["tail_phase"] = tail_phase_weights(
            params["conv_up2"], params["conv_hr"], params["conv_last"])
    if all(k in params for k in ("conv_up1", "conv_up2", "conv_hr",
                                 "conv_last")):
        from framewright_tpu.ops.fused_tail import tail2_phase_weights
        out["tail2_phase"] = tail2_phase_weights(
            params["conv_up1"], params["conv_up2"], params["conv_hr"],
            params["conv_last"])
        if "conv_body" in params:
            from framewright_tpu.ops.fused_tail3 import tail3_phase_weights
            out["tail3_phase"] = tail3_phase_weights(
                params["conv_body"], out["tail2_phase"])
    return out


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _tap_roll(src, di, dj):
    shift = (1 - di) * S + (1 - dj)
    if shift == 0:
        return src
    return pltpu.roll(src, shift % PX, axis=1)


def _accum_conv(src_packed, w_ref, acc_ref, c, tpc, off, init=False):
    # src_packed: (c//2, PX) int32, two bf16 channels per word.
    n = len(TAPS)
    t = 0
    k = 0
    while t < n:
        m = min(tpc, n - t)
        parts = [_tap_roll(src_packed, *TAPS[t + u]) for u in range(m)]
        packed = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
        chunk = pltpu.bitcast(packed, jnp.bfloat16)  # (m*c, PX)
        contrib = jnp.dot(
            w_ref[:, k:k + m * c],
            chunk,
            preferred_element_type=jnp.float32,
        )
        if init and t == 0:
            acc_ref[off:NT] = contrib
        else:
            acc_ref[off:NT] += contrib
        k += m * c
        t += m


def _lrelu(v):
    return jnp.where(v >= 0, v, 0.2 * v)


def _rdb_kernel(ext_ref, x_ref, wx_ref, w1_ref, w2_ref, w3_ref, w4_ref, b_ref,
                o_ref, acc_ref, xf_ref, x1_ref, x2_ref, x3_ref, x4_ref):
    # ext_ref (scalar prefetch): (NB, 4) valid extents [r0, r1, c0, c1)
    # in block coords; activations outside are masked to zero to match
    # SAME zero-pad conv semantics at frame borders.
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
        # lrelu -> bf16 round -> border mask -> pack 2 channels/word
        a = jnp.where(valid, _lrelu(v).astype(jnp.bfloat16),
                      jnp.bfloat16(0.0))
        return pltpu.bitcast(a, jnp.int32)

    xf_ref[:] = pltpu.bitcast(x_ref[0], jnp.int32)
    _accum_conv(xf_ref[:], wx_ref, acc_ref, NF, TPC_NF, 0, init=True)
    x1_ref[:] = act_pack(acc_ref[0:32] + b_ref[0:32])
    _accum_conv(x1_ref[:], w1_ref, acc_ref, GC, TPC_GC, 32)
    x2_ref[:] = act_pack(acc_ref[32:64] + b_ref[32:64])
    _accum_conv(x2_ref[:], w2_ref, acc_ref, GC, TPC_GC, 64)
    x3_ref[:] = act_pack(acc_ref[64:96] + b_ref[64:96])
    _accum_conv(x3_ref[:], w3_ref, acc_ref, GC, TPC_GC, 96)
    x4_ref[:] = act_pack(acc_ref[96:128] + b_ref[96:128])
    _accum_conv(x4_ref[:], w4_ref, acc_ref, GC, TPC_GC, 128)
    x5 = acc_ref[128:NT] + b_ref[128:NT]
    o_ref[0] = (0.2 * jnp.where(valid, x5, 0.0)).astype(jnp.bfloat16) + x_ref[0]


def _accum_conv_int8(src_packed, w_ref, ws_ref, sa, acc_ref, c, tpc, off,
                     init=False):
    """int8 variant: src_packed (c//4, PX) int32 holds 4 int8 channels
    per word; w_ref int8 (rows, 9c); ws_ref f32 (rows, 1) per-row weight
    scales; sa f32 scalar activation scale. MXU runs int8 x int8 -> i32
    at 2x the bf16 rate (394 TOP/s on v5e); dequant is one VPU fma per
    chunk: acc += (ws * sa) * i32."""
    n = len(TAPS)
    rows = NT - off
    scale = ws_ref[0:rows] * sa  # (rows, 1) f32
    t = 0
    k = 0
    while t < n:
        m = min(tpc, n - t)
        parts = [_tap_roll(src_packed, *TAPS[t + u]) for u in range(m)]
        packed = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
        chunk = pltpu.bitcast(packed, jnp.int8)  # (m*c, PX)
        contrib = jax.lax.dot_general(
            w_ref[:, k:k + m * c], chunk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * scale
        if init and t == 0:
            acc_ref[off:NT] = contrib
        else:
            acc_ref[off:NT] += contrib
        k += m * c
        t += m


def _accum_conv_int8_raw(src_packed, w_ref, acc_ref, c, tpc, off,
                         init=False):
    """Pure-int32 accumulation: no per-chunk dequant — one integer add
    per chunk (see rdb_wide_weights_int8_i32 for the scale algebra)."""
    n = len(TAPS)
    t = 0
    k = 0
    while t < n:
        m = min(tpc, n - t)
        parts = [_tap_roll(src_packed, *TAPS[t + u]) for u in range(m)]
        packed = parts[0] if m == 1 else jnp.concatenate(parts, axis=0)
        chunk = pltpu.bitcast(packed, jnp.int8)
        contrib = jax.lax.dot_general(
            w_ref[:, k:k + m * c], chunk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if init and t == 0:
            acc_ref[off:NT] = contrib
        else:
            acc_ref[off:NT] += contrib
        k += m * c
        t += m


def _rdb_kernel_int8(ext_ref, x_ref, wx_ref, w1_ref, w2_ref, w3_ref, w4_ref,
                     sx_ref, s1_ref, s2_ref, s3_ref, s4_ref, b_ref,
                     o_ref, acc_ref, xq_ref, x1_ref, x2_ref, x3_ref, x4_ref):
    """int8 fast-mode RDB: dynamic per-tensor (per-block) activation
    scales + per-row weight scales. ~2x MXU rate vs bf16 at a measured
    PSNR cost (see tests/test_int8_mode.py and PERF.md)."""
    bi = pl.program_id(0)
    r0 = ext_ref[bi, 0]
    r1 = ext_ref[bi, 1]
    c0 = ext_ref[bi, 2]
    c1 = ext_ref[bi, 3]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    rows = lanes // S
    cols = lanes % S
    valid = (rows >= r0) & (rows < r1) & (cols >= c0) & (cols < c1)

    def quant_pack(a):
        # a: f32 (c, PX), already masked. Dynamic symmetric scale.
        amax = jnp.maximum(jnp.max(jnp.abs(a)), 1e-8)
        sa = amax * (1.0 / 127.0)
        q = jnp.clip(jnp.round(a * (127.0 / amax)), -127.0, 127.0)
        return pltpu.bitcast(q.astype(jnp.int8), jnp.int32), sa

    def act(v):
        return jnp.where(valid, _lrelu(v), 0.0)

    xq, sa_x = quant_pack(x_ref[0].astype(jnp.float32))
    xq_ref[:] = xq
    _accum_conv_int8(xq_ref[:], wx_ref, sx_ref, sa_x, acc_ref, NF,
                     TPC_NF_I8, 0, init=True)
    q, sa = quant_pack(act(acc_ref[0:32] + b_ref[0:32]))
    x1_ref[:] = q
    _accum_conv_int8(x1_ref[:], w1_ref, s1_ref, sa, acc_ref, GC,
                     TPC_GC_I8, 32)
    q, sa = quant_pack(act(acc_ref[32:64] + b_ref[32:64]))
    x2_ref[:] = q
    _accum_conv_int8(x2_ref[:], w2_ref, s2_ref, sa, acc_ref, GC,
                     TPC_GC_I8, 64)
    q, sa = quant_pack(act(acc_ref[64:96] + b_ref[64:96]))
    x3_ref[:] = q
    _accum_conv_int8(x3_ref[:], w3_ref, s3_ref, sa, acc_ref, GC,
                     TPC_GC_I8, 96)
    q, sa = quant_pack(act(acc_ref[96:128] + b_ref[96:128]))
    x4_ref[:] = q
    _accum_conv_int8(x4_ref[:], w4_ref, s4_ref, sa, acc_ref, GC,
                     TPC_GC_I8, 128)
    x5 = acc_ref[128:NT] + b_ref[128:NT]
    o_ref[0] = (0.2 * jnp.where(valid, x5, 0.0)).astype(jnp.bfloat16) + x_ref[0]


def _rdb_kernel_int8_static(ext_ref, aq_ref, x_ref, wx_ref, w1_ref, w2_ref,
                            w3_ref, w4_ref, sx_ref, s1_ref, s2_ref, s3_ref,
                            s4_ref, b_ref, o_ref, acc_ref, xq_ref, x1_ref,
                            x2_ref, x3_ref, x4_ref):
    """int8 fast mode with CALIBRATED static activation scales.

    aq_ref (SMEM, (10,)): [sa_x, sa_1..sa_4, inv_x, inv_1..inv_4].
    Identical math to _rdb_kernel_int8 except the per-block absmax
    reduction (which serializes the VPU between convs) is replaced by
    scalar loads — measured 5.78 -> 3.68 ms per 180-block sweep."""
    bi = pl.program_id(0)
    r0 = ext_ref[bi, 0]
    r1 = ext_ref[bi, 1]
    c0 = ext_ref[bi, 2]
    c1 = ext_ref[bi, 3]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    rows = lanes // S
    cols = lanes % S
    valid = (rows >= r0) & (rows < r1) & (cols >= c0) & (cols < c1)

    def quant_pack(a, stage):
        inv = aq_ref[5 + stage]
        q = jnp.clip(jnp.round(a * inv), -127.0, 127.0)
        return pltpu.bitcast(q.astype(jnp.int8), jnp.int32)

    def act(v):
        return jnp.where(valid, _lrelu(v), 0.0)

    xq_ref[:] = quant_pack(x_ref[0].astype(jnp.float32), 0)
    _accum_conv_int8(xq_ref[:], wx_ref, sx_ref, aq_ref[0], acc_ref, NF,
                     TPC_NF_I8, 0, init=True)
    x1_ref[:] = quant_pack(act(acc_ref[0:32] + b_ref[0:32]), 1)
    _accum_conv_int8(x1_ref[:], w1_ref, s1_ref, aq_ref[1], acc_ref, GC,
                     TPC_GC_I8, 32)
    x2_ref[:] = quant_pack(act(acc_ref[32:64] + b_ref[32:64]), 2)
    _accum_conv_int8(x2_ref[:], w2_ref, s2_ref, aq_ref[2], acc_ref, GC,
                     TPC_GC_I8, 64)
    x3_ref[:] = quant_pack(act(acc_ref[64:96] + b_ref[64:96]), 3)
    _accum_conv_int8(x3_ref[:], w3_ref, s3_ref, aq_ref[3], acc_ref, GC,
                     TPC_GC_I8, 96)
    x4_ref[:] = quant_pack(act(acc_ref[96:128] + b_ref[96:128]), 4)
    _accum_conv_int8(x4_ref[:], w4_ref, s4_ref, aq_ref[4], acc_ref, GC,
                     TPC_GC_I8, 128)
    x5 = acc_ref[128:NT] + b_ref[128:NT]
    o_ref[0] = (0.2 * jnp.where(valid, x5, 0.0)).astype(jnp.bfloat16) + x_ref[0]


def fused_rdb_blocks_int8(blocks: jnp.ndarray, extents: jnp.ndarray,
                          wide: Dict, interpret: bool = False) -> jnp.ndarray:
    """int8-mode counterpart of fused_rdb_blocks (blocks stay bf16 at
    the interface; quantization is internal to the kernel).

    NOTE (measured, PERF.md round 2): a paired-block variant that
    interleaved two blocks' step lists to hide the serial VPU phase was
    1.8x SLOWER (register/VMEM pressure spills) — removed."""
    nb = blocks.shape[0]
    static = "act_q" in wide
    scratch = [
        pltpu.VMEM((NT, PX), jnp.float32),       # accumulator
        pltpu.VMEM((NF // 4, PX), jnp.int32),    # x  (packed int8)
        pltpu.VMEM((GC // 4, PX), jnp.int32),    # x1..x4
        pltpu.VMEM((GC // 4, PX), jnp.int32),
        pltpu.VMEM((GC // 4, PX), jnp.int32),
        pltpu.VMEM((GC // 4, PX), jnp.int32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if static else 1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    weights = (wide["Wx"], wide["W1"], wide["W2"], wide["W3"],
               wide["W4"], wide["sx"], wide["s1"], wide["s2"], wide["s3"],
               wide["s4"], wide["b"])
    if static:
        return pl.pallas_call(
            _rdb_kernel_int8_static,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, NF, PX), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )(extents, wide["act_q"], blocks, *weights)
    return pl.pallas_call(
        _rdb_kernel_int8,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, NF, PX), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(extents, blocks, *weights)


def fused_rdb_blocks(blocks: jnp.ndarray, extents: jnp.ndarray, wide: Dict,
                     interpret: bool = False) -> jnp.ndarray:
    """Run the fused RDB over channel-major flat blocks.

    blocks: (NB, 64, S*S) bf16; extents: (NB, 4) int32 valid rects.
    Returns (NB, 64, S*S) bf16 (full blocks; halo cropped by caller).
    """
    nb = blocks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NT, PX), jnp.float32),       # accumulator
            pltpu.VMEM((NF // 2, PX), jnp.int32),    # x  (packed bf16)
            pltpu.VMEM((GC // 2, PX), jnp.int32),    # x1 (packed bf16)
            pltpu.VMEM((GC // 2, PX), jnp.int32),
            pltpu.VMEM((GC // 2, PX), jnp.int32),
            pltpu.VMEM((GC // 2, PX), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _rdb_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, NF, PX), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(extents, blocks, wide["Wx"], wide["W1"], wide["W2"], wide["W3"],
      wide["W4"], wide["b"])


# ---------------------------------------------------------------------------
# Merge-in-kernel block-resident body.
#
# Round-3/4 profiler finding (scripts/trace_report.py on a real v5e
# trace): the 69 fused RDB sweeps take ~161 ms/frame (78% MXU peak) but
# the per-RDB extract/assemble glue costs ~186 ms/frame — thousands of
# small reshape/copy/slice ops, op-overhead-bound, not bandwidth-bound.
# This path extracts blocks ONCE per frame and keeps them resident
# across all sweeps; each kernel invocation refreshes its own halo ring
# by fetching the neighbors' interior strips as extra BlockSpec
# operands of the SAME blocks array:
#   - up/down/diagonal rings are (HALO*S)-lane strips — lane-block
#     aligned because HALO*S % 128 == 0 (HALO=8, S % 16 == 0)
#   - left/right neighbors are fetched as full blocks and lane-rolled
#     by BH in the packed-word domain (a lane roll moves both packed
#     bf16 channels together)
# Ring regions are pure lane predicates, and the valid-rect extents
# already gate every frame border: outside the frame the merged input
# is zero — exactly SAME zero-pad semantics. Correctness of the
# refresh: after one kernel pass a block's outer 5 pixels are garbage
# (5 convs), so rows/cols [5, HALO) and the whole interior stay valid;
# the refresh only ever reads neighbor INTERIOR strips (rows BH:BH+HALO
# and HALO:2*HALO), so the induction holds across all 69 sweeps.
# ---------------------------------------------------------------------------

HS = HALO * S  # ring strip lanes (one (8,128)-aligned lane block)


def _merge_ring_packed(ext_ref, x_ref, up_ref, dn_ref, lf_ref, rt_ref,
                       dul_ref, dur_ref, ddl_ref, ddr_ref, xm_ref):
    """Compose the ring-refreshed block input into xm_ref (packed words).

    All refs hold bf16; packing to int32 words (2 channels/word) is a
    bitcast, and every select mask is a lane predicate, so the merge
    runs entirely on packed words. Returns the (1, PX) valid mask for
    reuse by the conv body.
    """
    bi = pl.program_id(0)
    r0 = ext_ref[bi, 0]
    r1 = ext_ref[bi, 1]
    c0 = ext_ref[bi, 2]
    c1 = ext_ref[bi, 3]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    rows = lanes // S
    cols = lanes % S
    valid = (rows >= r0) & (rows < r1) & (cols >= c0) & (cols < c1)
    ring = ((rows < HALO) | (rows >= S - HALO)
            | (cols < HALO) | (cols >= S - HALO))

    def pk(ref):
        return pltpu.bitcast(ref[0], jnp.int32)

    self_p = pk(x_ref)
    lro = pltpu.roll(pk(lf_ref), (-BH) % PX, axis=1)
    rro = pltpu.roll(pk(rt_ref), BH, axis=1)
    nbv = jnp.where(cols < HALO, lro,
                    jnp.where(cols >= S - HALO, rro, self_p))
    xm_ref[:] = jnp.where(ring & valid, nbv,
                          jnp.where(ring, 0, self_p))
    # top/bottom strips overwrite (corners resolve to the diagonals)
    lanes_s = jax.lax.broadcasted_iota(jnp.int32, (1, HS), 1)
    cols_s = lanes_s % S
    top = jnp.where(cols_s < HALO, pltpu.roll(pk(dul_ref), (-BH) % HS, axis=1),
                    jnp.where(cols_s >= S - HALO,
                              pltpu.roll(pk(dur_ref), BH, axis=1),
                              pk(up_ref)))
    vt = (rows[:, 0:HS] >= r0) & (cols[:, 0:HS] >= c0) & (cols[:, 0:HS] < c1)
    xm_ref[:, 0:HS] = jnp.where(vt, top, 0)
    bot = jnp.where(cols_s < HALO, pltpu.roll(pk(ddl_ref), (-BH) % HS, axis=1),
                    jnp.where(cols_s >= S - HALO,
                              pltpu.roll(pk(ddr_ref), BH, axis=1),
                              pk(dn_ref)))
    vb = ((rows[:, PX - HS:PX] < r1) & (cols[:, PX - HS:PX] >= c0)
          & (cols[:, PX - HS:PX] < c1))
    xm_ref[:, PX - HS:PX] = jnp.where(vb, bot, 0)
    return valid


def _rdb_kernel_merge(ext_ref, x_ref, up_ref, dn_ref, lf_ref, rt_ref,
                      dul_ref, dur_ref, ddl_ref, ddr_ref,
                      wx_ref, w1_ref, w2_ref, w3_ref, w4_ref, b_ref,
                      o_ref, acc_ref, xf_ref, x1_ref, x2_ref, x3_ref, x4_ref):
    valid = _merge_ring_packed(ext_ref, x_ref, up_ref, dn_ref, lf_ref,
                               rt_ref, dul_ref, dur_ref, ddl_ref, ddr_ref,
                               xf_ref)

    def act_pack(v):
        a = jnp.where(valid, _lrelu(v).astype(jnp.bfloat16),
                      jnp.bfloat16(0.0))
        return pltpu.bitcast(a, jnp.int32)

    _accum_conv(xf_ref[:], wx_ref, acc_ref, NF, TPC_NF, 0, init=True)
    x1_ref[:] = act_pack(acc_ref[0:32] + b_ref[0:32])
    _accum_conv(x1_ref[:], w1_ref, acc_ref, GC, TPC_GC, 32)
    x2_ref[:] = act_pack(acc_ref[32:64] + b_ref[32:64])
    _accum_conv(x2_ref[:], w2_ref, acc_ref, GC, TPC_GC, 64)
    x3_ref[:] = act_pack(acc_ref[64:96] + b_ref[64:96])
    _accum_conv(x3_ref[:], w3_ref, acc_ref, GC, TPC_GC, 96)
    x4_ref[:] = act_pack(acc_ref[96:128] + b_ref[96:128])
    _accum_conv(x4_ref[:], w4_ref, acc_ref, GC, TPC_GC, 128)
    x5 = acc_ref[128:NT] + b_ref[128:NT]
    xm = pltpu.bitcast(xf_ref[:], jnp.bfloat16)
    o_ref[0] = (0.2 * jnp.where(valid, x5, 0.0)).astype(jnp.bfloat16) + xm


def _rdb_kernel_int8_static_merge(
        ext_ref, aq_ref, x_ref, up_ref, dn_ref, lf_ref, rt_ref,
        dul_ref, dur_ref, ddl_ref, ddr_ref,
        wx_ref, w1_ref, w2_ref, w3_ref, w4_ref,
        sx_ref, s1_ref, s2_ref, s3_ref, s4_ref, b_ref,
        o_ref, acc_ref, xm_ref, xq_ref, x1_ref, x2_ref, x3_ref, x4_ref):
    valid = _merge_ring_packed(ext_ref, x_ref, up_ref, dn_ref, lf_ref,
                               rt_ref, dul_ref, dur_ref, ddl_ref, ddr_ref,
                               xm_ref)

    def quant_pack(a, stage):
        inv = aq_ref[5 + stage]
        q = jnp.clip(jnp.round(a * inv), -127.0, 127.0)
        return pltpu.bitcast(q.astype(jnp.int8), jnp.int32)

    def act(v):
        return jnp.where(valid, _lrelu(v), 0.0)

    xm = pltpu.bitcast(xm_ref[:], jnp.bfloat16)
    xq_ref[:] = quant_pack(xm.astype(jnp.float32), 0)
    _accum_conv_int8(xq_ref[:], wx_ref, sx_ref, aq_ref[0], acc_ref, NF,
                     TPC_NF_I8, 0, init=True)
    x1_ref[:] = quant_pack(act(acc_ref[0:32] + b_ref[0:32]), 1)
    _accum_conv_int8(x1_ref[:], w1_ref, s1_ref, aq_ref[1], acc_ref, GC,
                     TPC_GC_I8, 32)
    x2_ref[:] = quant_pack(act(acc_ref[32:64] + b_ref[32:64]), 2)
    _accum_conv_int8(x2_ref[:], w2_ref, s2_ref, aq_ref[2], acc_ref, GC,
                     TPC_GC_I8, 64)
    x3_ref[:] = quant_pack(act(acc_ref[64:96] + b_ref[64:96]), 3)
    _accum_conv_int8(x3_ref[:], w3_ref, s3_ref, aq_ref[3], acc_ref, GC,
                     TPC_GC_I8, 96)
    x4_ref[:] = quant_pack(act(acc_ref[96:128] + b_ref[96:128]), 4)
    _accum_conv_int8(x4_ref[:], w4_ref, s4_ref, aq_ref[4], acc_ref, GC,
                     TPC_GC_I8, 128)
    x5 = acc_ref[128:NT] + b_ref[128:NT]
    o_ref[0] = (0.2 * jnp.where(valid, x5, 0.0)).astype(jnp.bfloat16) + xm


def _rdb_kernel_int8_i32_merge(
        ext_ref, aq_ref, x_ref, up_ref, dn_ref, lf_ref, rt_ref,
        dul_ref, dur_ref, ddl_ref, ddr_ref,
        wx_ref, w1_ref, w2_ref, w3_ref, w4_ref, osc_ref, ob_ref,
        o_ref, acc_ref, xm_ref, xq_ref, x1_ref, x2_ref, x3_ref, x4_ref):
    """int8 merge kernel with PURE-INT32 accumulation (acc_ref int32).

    All inter-conv float math is one fused requant per stage:
    v = acc*osc + ob (already in the next stage's quant domain),
    q = clip(round(lrelu(v))). See rdb_wide_weights_int8_i32."""
    valid = _merge_ring_packed(ext_ref, x_ref, up_ref, dn_ref, lf_ref,
                               rt_ref, dul_ref, dur_ref, ddl_ref, ddr_ref,
                               xm_ref)
    xm = pltpu.bitcast(xm_ref[:], jnp.bfloat16)
    inv0 = aq_ref[5]
    q0 = jnp.clip(jnp.round(xm.astype(jnp.float32) * inv0), -127.0, 127.0)
    xq_ref[:] = pltpu.bitcast(q0.astype(jnp.int8), jnp.int32)

    def requant(r0, r1):
        v = (acc_ref[r0:r1].astype(jnp.float32) * osc_ref[r0:r1]
             + ob_ref[r0:r1])
        q = jnp.where(valid, jnp.clip(jnp.round(_lrelu(v)), -127.0, 127.0),
                      0.0)
        return pltpu.bitcast(q.astype(jnp.int8), jnp.int32)

    _accum_conv_int8_raw(xq_ref[:], wx_ref, acc_ref, NF, TPC_NF_I32, 0,
                         init=True)
    x1_ref[:] = requant(0, 32)
    _accum_conv_int8_raw(x1_ref[:], w1_ref, acc_ref, GC, TPC_GC_I32, 32)
    x2_ref[:] = requant(32, 64)
    _accum_conv_int8_raw(x2_ref[:], w2_ref, acc_ref, GC, TPC_GC_I32, 64)
    x3_ref[:] = requant(64, 96)
    _accum_conv_int8_raw(x3_ref[:], w3_ref, acc_ref, GC, TPC_GC_I32, 96)
    x4_ref[:] = requant(96, 128)
    _accum_conv_int8_raw(x4_ref[:], w4_ref, acc_ref, GC, TPC_GC_I32, 128)
    x5 = (acc_ref[128:NT].astype(jnp.float32) * osc_ref[128:NT]
          + ob_ref[128:NT])
    o_ref[0] = (0.2 * jnp.where(valid, x5, 0.0)).astype(jnp.bfloat16) + xm


def fused_rdb_blocks_merge_int8_i32(blocks: jnp.ndarray,
                                    extents: jnp.ndarray, wide: Dict,
                                    nw: int,
                                    interpret: bool = False,
                                    carry: jnp.ndarray = None,
                                    neighbors: jnp.ndarray = None
                                    ) -> jnp.ndarray:
    """Merge-body sweep with the int32-accumulation int8 kernel.

    ``neighbors`` feeds the 8 ring-source views from a DIFFERENT array
    (wrong semantics — diagnostic only, scripts/probe_dup_operands.py:
    isolates XLA duplicate-operand buffer copies)."""
    nb = blocks.shape[0]
    nbr = blocks if neighbors is None else neighbors
    res = carry is not None
    kernel = (_rdb_kernel_int8_i32_merge_res if res
              else _rdb_kernel_int8_i32_merge)
    extra = ([pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                           memory_space=pltpu.VMEM)] if res else [])
    extra_args = (carry,) if res else ()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=_merge_in_specs(nb, nw) + extra
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NT, PX), jnp.int32),        # int32 accumulator
            pltpu.VMEM((NF // 2, PX), jnp.int32),   # merged (packed bf16)
            pltpu.VMEM((NF // 4, PX), jnp.int32),   # x quantized
            pltpu.VMEM((GC // 4, PX), jnp.int32),
            pltpu.VMEM((GC // 4, PX), jnp.int32),
            pltpu.VMEM((GC // 4, PX), jnp.int32),
            pltpu.VMEM((GC // 4, PX), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, NF, PX), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(extents, wide["act_q"], blocks, *([nbr] * 8), *extra_args, wide["Wx"],
      wide["W1"], wide["W2"], wide["W3"], wide["W4"], wide["oscale"],
      wide["obias"])


def _rdb_kernel_merge_res(ext_ref, x_ref, up_ref, dn_ref, lf_ref, rt_ref,
                          dul_ref, dur_ref, ddl_ref, ddr_ref, carry_ref,
                          wx_ref, w1_ref, w2_ref, w3_ref, w4_ref, b_ref,
                          o_ref, acc_ref, xf_ref, x1_ref, x2_ref, x3_ref,
                          x4_ref):
    """Merge kernel for the THIRD RDB of an RRDB: also applies the
    RRDB-level residual (out = 0.2*o + carry) in-kernel, replacing the
    XLA multiply_add over the whole blocks array (~10 ms/frame)."""
    valid = _merge_ring_packed(ext_ref, x_ref, up_ref, dn_ref, lf_ref,
                               rt_ref, dul_ref, dur_ref, ddl_ref, ddr_ref,
                               xf_ref)

    def act_pack(v):
        a = jnp.where(valid, _lrelu(v).astype(jnp.bfloat16),
                      jnp.bfloat16(0.0))
        return pltpu.bitcast(a, jnp.int32)

    _accum_conv(xf_ref[:], wx_ref, acc_ref, NF, TPC_NF, 0, init=True)
    x1_ref[:] = act_pack(acc_ref[0:32] + b_ref[0:32])
    _accum_conv(x1_ref[:], w1_ref, acc_ref, GC, TPC_GC, 32)
    x2_ref[:] = act_pack(acc_ref[32:64] + b_ref[32:64])
    _accum_conv(x2_ref[:], w2_ref, acc_ref, GC, TPC_GC, 64)
    x3_ref[:] = act_pack(acc_ref[64:96] + b_ref[64:96])
    _accum_conv(x3_ref[:], w3_ref, acc_ref, GC, TPC_GC, 96)
    x4_ref[:] = act_pack(acc_ref[96:128] + b_ref[96:128])
    _accum_conv(x4_ref[:], w4_ref, acc_ref, GC, TPC_GC, 128)
    x5 = acc_ref[128:NT] + b_ref[128:NT]
    xm = pltpu.bitcast(xf_ref[:], jnp.bfloat16)
    o = (0.2 * jnp.where(valid, x5, 0.0)).astype(jnp.bfloat16) + xm
    o_ref[0] = (0.2 * o).astype(jnp.bfloat16) + carry_ref[0]


def _rdb_kernel_int8_i32_merge_res(
        ext_ref, aq_ref, x_ref, up_ref, dn_ref, lf_ref, rt_ref,
        dul_ref, dur_ref, ddl_ref, ddr_ref, carry_ref,
        wx_ref, w1_ref, w2_ref, w3_ref, w4_ref, osc_ref, ob_ref,
        o_ref, acc_ref, xm_ref, xq_ref, x1_ref, x2_ref, x3_ref, x4_ref):
    """i32 int8 merge kernel + fused RRDB residual (third RDB)."""
    valid = _merge_ring_packed(ext_ref, x_ref, up_ref, dn_ref, lf_ref,
                               rt_ref, dul_ref, dur_ref, ddl_ref, ddr_ref,
                               xm_ref)
    xm = pltpu.bitcast(xm_ref[:], jnp.bfloat16)
    inv0 = aq_ref[5]
    q0 = jnp.clip(jnp.round(xm.astype(jnp.float32) * inv0), -127.0, 127.0)
    xq_ref[:] = pltpu.bitcast(q0.astype(jnp.int8), jnp.int32)

    def requant(r0, r1):
        v = (acc_ref[r0:r1].astype(jnp.float32) * osc_ref[r0:r1]
             + ob_ref[r0:r1])
        q = jnp.where(valid, jnp.clip(jnp.round(_lrelu(v)), -127.0, 127.0),
                      0.0)
        return pltpu.bitcast(q.astype(jnp.int8), jnp.int32)

    _accum_conv_int8_raw(xq_ref[:], wx_ref, acc_ref, NF, TPC_NF_I32, 0,
                         init=True)
    x1_ref[:] = requant(0, 32)
    _accum_conv_int8_raw(x1_ref[:], w1_ref, acc_ref, GC, TPC_GC_I32, 32)
    x2_ref[:] = requant(32, 64)
    _accum_conv_int8_raw(x2_ref[:], w2_ref, acc_ref, GC, TPC_GC_I32, 64)
    x3_ref[:] = requant(64, 96)
    _accum_conv_int8_raw(x3_ref[:], w3_ref, acc_ref, GC, TPC_GC_I32, 96)
    x4_ref[:] = requant(96, 128)
    _accum_conv_int8_raw(x4_ref[:], w4_ref, acc_ref, GC, TPC_GC_I32, 128)
    x5 = (acc_ref[128:NT].astype(jnp.float32) * osc_ref[128:NT]
          + ob_ref[128:NT])
    o = (0.2 * jnp.where(valid, x5, 0.0)).astype(jnp.bfloat16) + xm
    o_ref[0] = (0.2 * o).astype(jnp.bfloat16) + carry_ref[0]


def _merge_in_specs(nb: int, nw: int):
    """BlockSpecs for (self, up, down, left, right, diagUL, diagUR,
    diagDL, diagDR) views of the SAME (nb, NF, PX) blocks array."""
    sb = BH // HALO  # bottom interior strip = lane block BH/HALO

    def full(off):
        return pl.BlockSpec(
            (1, NF, PX),
            lambda k, *_, o=off: (jnp.clip(k + o, 0, nb - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def strip(off, blk):
        return pl.BlockSpec(
            (1, NF, HS),
            lambda k, *_, o=off, sbk=blk: (jnp.clip(k + o, 0, nb - 1), 0, sbk),
            memory_space=pltpu.VMEM)

    return [
        full(0),
        strip(-nw, sb), strip(nw, 1),
        full(-1), full(1),
        strip(-nw - 1, sb), strip(-nw + 1, sb),
        strip(nw - 1, 1), strip(nw + 1, 1),
    ]


def fused_rdb_blocks_merge(blocks: jnp.ndarray, extents: jnp.ndarray,
                           wide: Dict, nw: int,
                           interpret: bool = False,
                           carry: jnp.ndarray = None) -> jnp.ndarray:
    """One fused-RDB sweep over resident blocks with in-kernel ring
    refresh. blocks: (NB, 64, S*S) bf16 (rings may be stale — they are
    rebuilt from neighbor interiors before use). With ``carry`` the
    RRDB residual (0.2*o + carry) is fused into the kernel (third RDB
    of each RRDB)."""
    nb = blocks.shape[0]
    res = carry is not None
    kernel = _rdb_kernel_merge_res if res else _rdb_kernel_merge
    extra = ([pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                           memory_space=pltpu.VMEM)] if res else [])
    extra_args = (carry,) if res else ()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=_merge_in_specs(nb, nw) + extra
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NT, PX), jnp.float32),
            pltpu.VMEM((NF // 2, PX), jnp.int32),
            pltpu.VMEM((GC // 2, PX), jnp.int32),
            pltpu.VMEM((GC // 2, PX), jnp.int32),
            pltpu.VMEM((GC // 2, PX), jnp.int32),
            pltpu.VMEM((GC // 2, PX), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, NF, PX), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(extents, *([blocks] * 9), *extra_args, wide["Wx"], wide["W1"],
      wide["W2"], wide["W3"], wide["W4"], wide["b"])


def fused_rdb_blocks_merge_int8(blocks: jnp.ndarray, extents: jnp.ndarray,
                                wide: Dict, nw: int,
                                interpret: bool = False) -> jnp.ndarray:
    """int8-static counterpart of fused_rdb_blocks_merge. Requires
    calibrated static scales ("act_q"); the dynamic-scale int8 mode
    stays on the round-trip path."""
    nb = blocks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=_merge_in_specs(nb, nw)
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec((1, NF, PX), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NT, PX), jnp.float32),
            pltpu.VMEM((NF // 2, PX), jnp.int32),   # merged (packed bf16)
            pltpu.VMEM((NF // 4, PX), jnp.int32),   # x quantized
            pltpu.VMEM((GC // 4, PX), jnp.int32),
            pltpu.VMEM((GC // 4, PX), jnp.int32),
            pltpu.VMEM((GC // 4, PX), jnp.int32),
            pltpu.VMEM((GC // 4, PX), jnp.int32),
        ],
    )
    weights = (wide["Wx"], wide["W1"], wide["W2"], wide["W3"], wide["W4"],
               wide["sx"], wide["s1"], wide["s2"], wide["s3"], wide["s4"],
               wide["b"])
    return pl.pallas_call(
        _rdb_kernel_int8_static_merge,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, NF, PX), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(extents, wide["act_q"], *([blocks] * 9), *weights)


def rrdb_body_merge_blocks(feat: jnp.ndarray, fast_params: Dict,
                           interpret: bool = False):
    """Merge-body sweeps WITHOUT the final assembly: returns
    ``(out_blocks, init_blocks, extents, (b, nh, nw))`` for consumers
    that keep working in the resident block layout (the tail3 kernel,
    ops/fused_tail3.py), or ``None`` when this body can't run the merge
    path (dynamic-scale int8 stays on the round-trip kernels)."""
    b, h, w, c = feat.shape
    wide0 = fast_params["body_wide"]
    int8 = "sx" in wide0 or "oscale" in wide0
    if int8 and "act_q" not in wide0:
        return None
    nh, nw = _grid_dims(h, w)
    nb = b * nh * nw
    fcm = feat.transpose(0, 3, 1, 2).astype(jnp.bfloat16)
    blocks = extract_blocks(fcm, h, w).reshape(nb, NF, PX)
    ext = jnp.asarray(np.tile(_block_extents(h, w, nh, nw), (b, 1)))
    if "oscale" in wide0:
        run, fused_res = fused_rdb_blocks_merge_int8_i32, True
    elif int8:
        run, fused_res = fused_rdb_blocks_merge_int8, False
    else:
        run, fused_res = fused_rdb_blocks_merge, True

    def rrdb_step(carry, wide3):
        w1 = jax.tree_util.tree_map(lambda v: v[0], wide3)
        w2 = jax.tree_util.tree_map(lambda v: v[1], wide3)
        w3 = jax.tree_util.tree_map(lambda v: v[2], wide3)
        o = run(carry, ext, w1, nw, interpret=interpret)
        o = run(o, ext, w2, nw, interpret=interpret)
        if fused_res:
            return run(o, ext, w3, nw, interpret=interpret,
                       carry=carry), None
        o = run(o, ext, w3, nw, interpret=interpret)
        return (0.2 * o).astype(jnp.bfloat16) + carry, None

    unroll = int(_os.environ.get("FW_SCAN_UNROLL", "1"))
    out, _ = jax.lax.scan(rrdb_step, blocks, fast_params["body_wide"],
                          unroll=unroll)
    return out, blocks, ext, (b, nh, nw)


def rrdb_body_merge(feat: jnp.ndarray, fast_params: Dict,
                    interpret: bool = False) -> jnp.ndarray:
    """The RRDB trunk with merge-in-kernel resident blocks: ONE
    extraction, 69 ring-refreshing kernel sweeps, ONE assembly."""
    b, h, w, c = feat.shape
    res = rrdb_body_merge_blocks(feat, fast_params, interpret=interpret)
    if res is None:
        return rrdb_body_fast_roundtrip(feat, fast_params,
                                        interpret=interpret)
    out, _, _, (b, nh, nw) = res
    out = assemble_blocks(out.reshape(b * nh * nw, NF, S, S), b, h, w)
    return out.transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# Block extraction / assembly (XLA, traced around the kernel)
# ---------------------------------------------------------------------------

def _grid_dims(h: int, w: int) -> Tuple[int, int]:
    return -(-h // BH), -(-w // BH)


def _block_extents(h: int, w: int, nh: int, nw: int) -> np.ndarray:
    """(nh*nw, 4) int32 valid rects [r0, r1, c0, c1) in block coords."""
    extents = []
    for i in range(nh):
        for j in range(nw):
            r0 = HALO if i == 0 else 0
            r1 = min(S, HALO + h - i * BH)
            c0 = HALO if j == 0 else 0
            c1 = min(S, HALO + w - j * BH)
            extents.append((r0, r1, c0, c1))
    return np.asarray(extents, np.int32)


def _blocks_from_interiors(inter: jnp.ndarray) -> jnp.ndarray:
    """Interior grid (b, nh, nw, NF, BH, BH) -> halo blocks
    (b*nh*nw, NF, S, S): each block's HALO ring is filled from its
    neighbors' interiors (zeros outside the grid). Three big
    pad/concat ops instead of nh*nw overlapping window slices."""
    b, nh, nw = inter.shape[:3]
    ip = jnp.pad(inter, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    # columns first: (b, nh+2, nw, NF, BH, S)
    cols = jnp.concatenate([
        ip[:, :, :-2, :, :, BH - HALO:],
        ip[:, :, 1:-1],
        ip[:, :, 2:, :, :, :HALO],
    ], axis=-1)
    # then rows: (b, nh, nw, NF, S, S)
    wins = jnp.concatenate([
        cols[:, :-2, :, :, BH - HALO:, :],
        cols[:, 1:-1],
        cols[:, 2:, :, :, :HALO, :],
    ], axis=-2)
    return wins.reshape(b * nh * nw, NF, S, S)


def extract_blocks(feat_cm: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Channel-major image (B, 64, h, w) -> halo blocks (B*nh*nw, 64, S, S).

    Zero padding supplies both the frame-border halo ring and the
    grid-alignment slack (both outside the frame, where SAME convs see
    zeros). Per-window overlapping ``lax.slice`` loop — measured FASTER
    than the interior-tiling + neighbor-concat alternative
    (extract_blocks_concat): at the production 540p body geometry the
    slice loop is ~1.7 ms vs ~4.8 ms, because the concat route's 6-D
    interior transpose (channel axis moved inward) costs more than the
    window copies save (same-process A/B scripts/bench_extract_ab.py:
    int8 B=3 apply_fast 142.9 vs 145.0 ms/frame)."""
    b = feat_cm.shape[0]
    nh, nw = _grid_dims(h, w)
    hp, wp = nh * BH, nw * BH
    x = jnp.pad(feat_cm, ((0, 0), (0, 0), (HALO, hp - h + HALO),
                          (HALO, wp - w + HALO)))
    windows = []
    for i in range(nh):
        for j in range(nw):
            windows.append(jax.lax.slice(
                x, (0, 0, i * BH, j * BH), (b, NF, i * BH + S, j * BH + S)))
    return jnp.stack(windows, axis=1).reshape(b * nh * nw, NF, S, S)


def extract_blocks_concat(feat_cm: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Interior tiling + the same neighbor-concat ring construction as
    halo_refresh_xla. Bit-matches extract_blocks (tests) but measured
    slower in context (see extract_blocks docstring) — kept as the
    bit-match cross-check and a record of the negative result."""
    b = feat_cm.shape[0]
    nh, nw = _grid_dims(h, w)
    hp, wp = nh * BH, nw * BH
    x = jnp.pad(feat_cm, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    inter = x.reshape(b, NF, nh, BH, nw, BH).transpose(0, 2, 4, 1, 3, 5)
    return _blocks_from_interiors(inter)


def assemble_blocks(blocks: jnp.ndarray, b: int, h: int, w: int) -> jnp.ndarray:
    """Halo blocks (B*nh*nw, 64, S, S) -> channel-major image (B, 64, h, w)
    from the block interiors."""
    nh, nw = _grid_dims(h, w)
    hp, wp = nh * BH, nw * BH
    out = blocks.reshape(b, nh, nw, NF, S, S)[
        :, :, :, :, HALO:S - HALO, HALO:S - HALO]
    out = out.transpose(0, 3, 1, 4, 2, 5).reshape(b, NF, hp, wp)
    return out[:, :, :h, :w]


# ---------------------------------------------------------------------------
# Block-resident body: halo refresh between RDB kernels instead of a
# full image round-trip per RDB (PERF.md round-3 lever (a)).
# ---------------------------------------------------------------------------

def halo_refresh_xla(blocks: jnp.ndarray, b: int, nh: int, nw: int) -> jnp.ndarray:
    """Rebuild every block's HALO ring from its neighbors' interiors
    (pure XLA; the CPU/interpret fallback for halo_refresh_pallas).

    blocks: (b*nh*nw, NF, S, S) where interiors are valid and rings are
    stale. Returns blocks with rings refreshed (zero outside the grid).
    """
    x = blocks.reshape(b, nh, nw, NF, S, S)
    inter = x[:, :, :, :, HALO:S - HALO, HALO:S - HALO]
    return _blocks_from_interiors(inter)


def halo_refresh(blocks: jnp.ndarray, b: int, nh: int, nw: int) -> jnp.ndarray:
    """Two-phase halo ring exchange via static dynamic-update-slices.

    Moves ONLY the rings (~17% of block area) instead of rebuilding
    full windows: phase A copies top/bottom rings over interior
    columns from vertical neighbors; phase B copies left/right rings
    full height (corners become exact because phase A already fixed
    the neighbors' top/bottom rows). Blocks whose ring lies outside
    the grid keep their zeros. XLA applies the updates in place on the
    dead intermediate (no full-buffer copies).

    NOTE: a Pallas in-place DMA variant was tried first and rejected
    by Mosaic — ring slices (5 sublanes) violate the (8, 128) tiling
    alignment for VMEM memrefs ("Slice shape along dimension 2 must be
    aligned to tiling (8)").
    """
    x = blocks.reshape(b, nh, nw, NF, S, S)
    H = HALO
    if nh > 1:
        x = x.at[:, 1:, :, :, 0:H, H:S - H].set(
            x[:, :-1, :, :, BH:BH + H, H:S - H])
        x = x.at[:, :-1, :, :, S - H:S, H:S - H].set(
            x[:, 1:, :, :, H:2 * H, H:S - H])
    if nw > 1:
        x = x.at[:, :, 1:, :, :, 0:H].set(x[:, :, :-1, :, :, BH:BH + H])
        x = x.at[:, :, :-1, :, :, S - H:S].set(x[:, :, 1:, :, :, H:2 * H])
    return x.reshape(b * nh * nw, NF, S, S)


def _refresh_copies(b: int, nh: int, nw: int, vertical: bool):
    """(src_idx, src_lo, dst_idx, dst_lo) ring copy lists. Vertical
    phase: rows over interior columns; horizontal: full-height cols."""
    out = []
    for bi in range(b):
        for i in range(nh):
            for j in range(nw):
                me = (bi * nh + i) * nw + j
                if vertical:
                    if i > 0:
                        out.append((me - nw, BH, me, 0))
                    if i < nh - 1:
                        out.append((me + nw, HALO, me, S - HALO))
                else:
                    if j > 0:
                        out.append((me - 1, BH, me, 0))
                    if j < nw - 1:
                        out.append((me + 1, HALO, me, S - HALO))
    return out


_REFRESH_WAVE = 8


def _make_refresh_kernel_hbm(copies, vertical: bool):
    def kern(in_ref, io_ref, sems):
        del in_ref  # aliases io_ref
        for base in range(0, len(copies), _REFRESH_WAVE):
            grp = copies[base:base + _REFRESH_WAVE]
            dmas = []
            for k, (si, sl, di, dl) in enumerate(grp):
                if vertical:
                    src = io_ref.at[si, :, sl:sl + HALO, HALO:S - HALO]
                    dst = io_ref.at[di, :, dl:dl + HALO, HALO:S - HALO]
                else:
                    src = io_ref.at[si, :, :, sl:sl + HALO]
                    dst = io_ref.at[di, :, :, dl:dl + HALO]
                dmas.append(pltpu.make_async_copy(src, dst, sems.at[k]))
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

    return kern


def halo_refresh_hbm(blocks: jnp.ndarray, b: int, nh: int, nw: int) -> jnp.ndarray:
    """Halo ring exchange via in-place HBM->HBM DMAs (two phases, same
    geometry as halo_refresh). Refs stay in HBM (untiled), so the ring
    slices avoid the VMEM (8, 128) tiling restriction."""
    for vertical in (True, False):
        copies = _refresh_copies(b, nh, nw, vertical)
        if not copies:
            continue
        blocks = pl.pallas_call(
            _make_refresh_kernel_hbm(copies, vertical),
            out_shape=jax.ShapeDtypeStruct(blocks.shape, blocks.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_REFRESH_WAVE,))],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(blocks)
    return blocks


def rrdb_body_resident(feat: jnp.ndarray, fast_params: Dict,
                       interpret: bool = False) -> jnp.ndarray:
    """The RRDB trunk with BLOCK-RESIDENT activations.

    Extraction and assembly happen ONCE per frame; between the 69 RDB
    kernel passes only the halo rings move (halo_refresh_pallas),
    replacing the per-RDB pad/slice/stack/crop/transpose image round
    trip (~50-60 ms/frame at 1080p, PERF.md).  Numerics identical to
    rrdb_body_fast: the kernels already mask frame borders via the
    extents, and out-of-grid rings stay zero through the whole chain
    (kernel outputs preserve the (zero) input outside the valid rect).
    """
    b, h, w, c = feat.shape
    int8 = "sx" in fast_params["body_wide"]
    nh, nw = _grid_dims(h, w)
    nb = b * nh * nw
    fcm = feat.transpose(0, 3, 1, 2).astype(jnp.bfloat16)
    blocks = extract_blocks(fcm, h, w)
    ext = jnp.asarray(np.tile(_block_extents(h, w, nh, nw), (b, 1)))
    run = fused_rdb_blocks_int8 if int8 else fused_rdb_blocks
    kind = _os.environ.get("FW_RDB_REFRESH", "hbm")
    if interpret or kind == "concat":
        refresh = halo_refresh_xla
    elif kind == "dus":
        refresh = halo_refresh
    else:
        refresh = halo_refresh_hbm

    def rdb(blk, wide):
        out = run(blk.reshape(nb, NF, PX), ext, wide, interpret=interpret)
        return out.reshape(nb, NF, S, S)

    def rrdb_step(carry, wide3):
        w1 = jax.tree_util.tree_map(lambda v: v[0], wide3)
        w2 = jax.tree_util.tree_map(lambda v: v[1], wide3)
        w3 = jax.tree_util.tree_map(lambda v: v[2], wide3)
        o = refresh(rdb(carry, w1), b, nh, nw)
        o = refresh(rdb(o, w2), b, nh, nw)
        o = rdb(o, w3)
        out = (0.2 * o).astype(jnp.bfloat16) + carry
        return refresh(out, b, nh, nw), None

    out, _ = jax.lax.scan(rrdb_step, blocks, fast_params["body_wide"])
    return assemble_blocks(out, b, h, w).transpose(0, 2, 3, 1)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "interpret", "int8"))
def _fused_rdb_image(feat_cm: jnp.ndarray, wide: Dict, h: int, w: int,
                     interpret: bool = False, int8: bool = False) -> jnp.ndarray:
    """One RDB over a channel-major image. feat_cm: (B, 64, h, w) bf16."""
    b = feat_cm.shape[0]
    nh, nw = _grid_dims(h, w)
    hp, wp = nh * BH, nw * BH
    # zero padding: halo ring + grid alignment (both regions are
    # outside the frame, where SAME convs see zeros)
    x = jnp.pad(feat_cm, ((0, 0), (0, 0), (HALO, hp - h + HALO),
                          (HALO, wp - w + HALO)))
    windows = []
    extents = []
    for i in range(nh):
        for j in range(nw):
            windows.append(jax.lax.slice(
                x, (0, 0, i * BH, j * BH), (b, NF, i * BH + S, j * BH + S)))
            # valid rect in block coords: frame rows [0,h) map to block
            # rows [HALO - i*BH + ... ] -> clip
            r0 = max(0, HALO - 0) if i == 0 else 0
            r1 = min(S, HALO + h - i * BH)
            c0 = HALO if j == 0 else 0
            c1 = min(S, HALO + w - j * BH)
            extents.append((r0, r1, c0, c1))
    nt = nh * nw
    blocks = jnp.stack(windows, axis=1).reshape(b * nt, NF, S, S)
    blocks = blocks.reshape(b * nt, NF, PX)
    ext = jnp.asarray(np.tile(np.asarray(extents, np.int32), (b, 1)))
    run = fused_rdb_blocks_int8 if int8 else fused_rdb_blocks
    out = run(blocks, ext, wide, interpret=interpret)
    out = out.reshape(b, nt, NF, S, S)[:, :, :, HALO:S - HALO, HALO:S - HALO]
    out = out.reshape(b, nh, nw, NF, BH, BH)
    out = out.transpose(0, 3, 1, 4, 2, 5).reshape(b, NF, hp, wp)
    return out[:, :, :h, :w]


def rrdb_body_fast(feat: jnp.ndarray, fast_params: Dict,
                   interpret: bool = False) -> jnp.ndarray:
    """The 23-block RRDB trunk via fused kernels.

    feat: (B, H, W, 64) (NHWC, output of conv_first). Returns same shape.
    Runs the int8 kernel when fast_params were built with
    compute_dtype="int8" (rrdb_fast_params).

    FW_RDB_BODY selects the body variant: "merge" (in-kernel ring
    refresh, resident blocks — the measured v5e winner), "roundtrip"
    (per-RDB image extract/assemble), "resident" (round-3 DMA-refresh
    experiment). Default is the measured winner on v5e.
    FW_RDB_RESIDENT=1 is kept as an alias for "resident".
    """
    kind = _os.environ.get("FW_RDB_BODY", _BODY_DEFAULT)
    if _os.environ.get("FW_RDB_RESIDENT", "0") == "1":
        kind = "resident"
    if "oscale" in fast_params["body_wide"]:
        kind = "merge"  # i32-scheme weights exist only as a merge kernel
    if kind == "resident":
        return rrdb_body_resident(feat, fast_params, interpret=interpret)
    if kind == "merge":
        return rrdb_body_merge(feat, fast_params, interpret=interpret)
    return rrdb_body_fast_roundtrip(feat, fast_params, interpret=interpret)


def rrdb_body_fast_roundtrip(feat: jnp.ndarray, fast_params: Dict,
                             interpret: bool = False) -> jnp.ndarray:
    """Round-trip body: per-RDB image extract/kernel/assemble."""
    b, h, w, c = feat.shape
    int8 = "sx" in fast_params["body_wide"]
    fcm = feat.transpose(0, 3, 1, 2).astype(jnp.bfloat16)  # (B, 64, H, W)

    def rrdb_step(carry, wide3):
        wide1 = jax.tree_util.tree_map(lambda v: v[0], wide3)
        wide2 = jax.tree_util.tree_map(lambda v: v[1], wide3)
        wide3_ = jax.tree_util.tree_map(lambda v: v[2], wide3)
        out = _fused_rdb_image(carry, wide1, h, w, interpret, int8)
        out = _fused_rdb_image(out, wide2, h, w, interpret, int8)
        out = _fused_rdb_image(out, wide3_, h, w, interpret, int8)
        return (0.2 * out).astype(jnp.bfloat16) + carry, None

    body_out, _ = jax.lax.scan(rrdb_step, fcm, fast_params["body_wide"])
    return body_out.transpose(0, 2, 3, 1)
