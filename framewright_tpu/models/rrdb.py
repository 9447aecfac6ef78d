"""RRDBNet (Real-ESRGAN generator) in functional JAX.

TPU-native re-implementation of the architecture the reference invokes
through basicsr/realesrgan (reference processors/pytorch_realesrgan.py:
103-128: num_feat=64, num_block=23 (or 6 for anime), num_grow_ch=32,
scale in {1,2,4}; scale<4 routes the input through pixel_unshuffle so
the 23-block body always runs at 1/4 output resolution — the property
that makes the TPU throughput target reachable).

Structure (param names mirror the official state_dict for weight port):
  conv_first -> body.{i}.rdb{1,2,3}.conv{1..5} -> conv_body (+skip)
  -> conv_up1 -> conv_up2 -> conv_hr -> conv_last
Residual dense blocks concatenate features (channel growth 32) and use
LeakyReLU(0.2); residual scaling 0.2 at both RDB and RRDB level.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import (
    conv2d,
    conv_init,
    lrelu,
    pixel_unshuffle,
    upsample_nearest,
)


# Tail variant default: "1" = phase tail from 2x res (conv_up1 in XLA),
# "2" = extended tail from body res (conv_up1 folded into the kernel).
# Set by the measured winner on v5e (scripts/bench_tail2.py).
_TAIL_DEFAULT = "auto"   # resident tail3 when the merge body runs;
#                          else bf16 -> tail2, int8 -> tail1 (measured;
#                          see apply_fast)


@dataclass(frozen=True)
class RRDBConfig:
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4  # output = input * scale; body runs at input/ (4/scale)


def init(key, cfg: RRDBConfig = RRDBConfig(), dtype=jnp.float32) -> Dict:
    nf, gc = cfg.num_feat, cfg.num_grow_ch
    in_ch = cfg.num_in_ch
    if cfg.scale == 2:
        in_ch *= 4
    elif cfg.scale == 1:
        in_ch *= 16

    keys = iter(jax.random.split(key, 16 + cfg.num_block * 16))

    def c(ci, co):
        return conv_init(next(keys), 3, ci, co, dtype)

    def rdb():
        return {
            "conv1": c(nf, gc),
            "conv2": c(nf + gc, gc),
            "conv3": c(nf + 2 * gc, gc),
            "conv4": c(nf + 3 * gc, gc),
            "conv5": c(nf + 4 * gc, nf),
        }

    params = {
        "conv_first": c(in_ch, nf),
        "body": [{"rdb1": rdb(), "rdb2": rdb(), "rdb3": rdb()} for _ in range(cfg.num_block)],
        "conv_body": c(nf, nf),
        "conv_up1": c(nf, nf),
        "conv_up2": c(nf, nf),
        "conv_hr": c(nf, nf),
        "conv_last": c(nf, cfg.num_out_ch),
    }
    return params


def _rdb_forward(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    x1 = lrelu(conv2d(p["conv1"], x))
    x2 = lrelu(conv2d(p["conv2"], jnp.concatenate([x, x1], axis=-1)))
    x3 = lrelu(conv2d(p["conv3"], jnp.concatenate([x, x1, x2], axis=-1)))
    x4 = lrelu(conv2d(p["conv4"], jnp.concatenate([x, x1, x2, x3], axis=-1)))
    x5 = conv2d(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], axis=-1))
    return x5 * 0.2 + x


def _rrdb_forward(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    out = _rdb_forward(p["rdb1"], x)
    out = _rdb_forward(p["rdb2"], out)
    out = _rdb_forward(p["rdb3"], out)
    return out * 0.2 + x


def apply(params: Dict, x: jnp.ndarray, cfg: RRDBConfig = RRDBConfig()) -> jnp.ndarray:
    """Forward pass. x: (N, H, W, C) float in [0, 1]. Returns upscaled
    (N, H*scale, W*scale, C) in the same dtype.

    H and W must be even for scale=2 and multiples of 4 for scale=1
    (pixel_unshuffle constraint; the tiler guarantees this).
    """
    if cfg.scale == 2:
        feat = pixel_unshuffle(x, 2)
    elif cfg.scale == 1:
        feat = pixel_unshuffle(x, 4)
    else:
        feat = x

    feat = conv2d(params["conv_first"], feat)

    # The body is a stack of identical blocks -> lax.scan over stacked
    # params compiles one block once instead of unrolling num_block
    # copies (compile time and HLO size win); numerics identical.
    body = params["body"]
    if isinstance(body, list):
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *body)
    else:  # already stacked (preferred storage)
        stacked = body

    def block(h, bp):
        return _rrdb_forward(bp, h), None

    body_out, _ = jax.lax.scan(block, feat, stacked)
    return _tail(params, feat, body_out)


def _tail(params: Dict, feat: jnp.ndarray, body_out: jnp.ndarray) -> jnp.ndarray:
    feat = feat + conv2d(params["conv_body"], body_out.astype(feat.dtype))
    feat = lrelu(conv2d(params["conv_up1"], upsample_nearest(feat, 2)))
    feat = lrelu(conv2d(params["conv_up2"], upsample_nearest(feat, 2)))
    return conv2d(params["conv_last"], lrelu(conv2d(params["conv_hr"], feat)))


def _tail_folded(params: Dict, fast_params: Dict, feat: jnp.ndarray,
                 body_out: jnp.ndarray) -> jnp.ndarray:
    """Tail with the upsample convs folded to low-res phase convs
    (ops.fused_rrdb.fold_upconv_nearest2): numerically the same math as
    ``_tail`` with 2.25x fewer upsample-conv FLOPs at MXU-friendly
    widths. lrelu commutes with pixel_shuffle (elementwise)."""
    from framewright_tpu.models.layers import pixel_shuffle

    feat = feat + conv2d(params["conv_body"], body_out.astype(feat.dtype))
    feat = pixel_shuffle(lrelu(conv2d(fast_params["conv_up1_folded"], feat)), 2)
    feat = pixel_shuffle(lrelu(conv2d(fast_params["conv_up2_folded"], feat)), 2)
    return conv2d(params["conv_last"], lrelu(conv2d(params["conv_hr"], feat)))


def _tail_pallas(params: Dict, fast_params: Dict, feat: jnp.ndarray,
                 body_out: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Tail with conv_up2/conv_hr/conv_last fused into one low-res
    phase-decomposed Pallas kernel (ops/fused_tail.py): no 4K
    intermediates, MXU-wide matmuls. conv_body + residual + conv_up1
    stay in XLA (cheap at base resolution)."""
    from framewright_tpu.ops.fused_tail import fused_tail_image
    from framewright_tpu.models.layers import upsample_nearest as _up

    feat = feat + conv2d(params["conv_body"], body_out.astype(feat.dtype))
    feat = lrelu(conv2d(params["conv_up1"], _up(feat, 2)))
    fcm = feat.transpose(0, 3, 1, 2).astype(jnp.bfloat16)
    h, w = int(fcm.shape[2]), int(fcm.shape[3])
    return fused_tail_image(fcm, fast_params["tail_phase"], h, w,
                            interpret=interpret)


def _tail_pallas2(params: Dict, fast_params: Dict, feat: jnp.ndarray,
                  body_out: jnp.ndarray, interpret: bool = False
                  ) -> jnp.ndarray:
    """Tail with ALL FOUR tail convs (conv_up1/up2/hr/last) fused into
    one phase-decomposed Pallas kernel at BODY resolution
    (ops/fused_tail.py tail2): removes the XLA conv_up1 at 2x res
    (~10 ms/frame on v5e) and the mid-resolution block extraction."""
    from framewright_tpu.ops.fused_tail import fused_tail2_image

    feat = feat + conv2d(params["conv_body"], body_out.astype(feat.dtype))
    fcm = feat.transpose(0, 3, 1, 2).astype(jnp.bfloat16)
    h, w = int(fcm.shape[2]), int(fcm.shape[3])
    return fused_tail2_image(fcm, fast_params["tail2_phase"], h, w,
                             interpret=interpret)


def _head(params: Dict, x: jnp.ndarray, cfg: RRDBConfig) -> jnp.ndarray:
    if cfg.scale == 2:
        feat = pixel_unshuffle(x, 2)
    elif cfg.scale == 1:
        feat = pixel_unshuffle(x, 4)
    else:
        feat = x
    return conv2d(params["conv_first"], feat)


def make_fast_params(params: Dict, dtype=jnp.bfloat16,
                     compute_dtype: str = "bf16",
                     act_amax=None, int8_scheme: str = None) -> Dict:
    """Precompute the wide-form weights for the fused Pallas body.

    compute_dtype="int8" selects the int8 fast mode (TensorRT-INT8
    analog). ``act_amax`` (num_block, 3, 5) — per-stage activation
    ranges from ``calibrate_act_scales`` — switches the int8 kernel to
    STATIC quantization scales (the Int8Calibrator analog, reference
    tensorrt.py:110-455): measured 23% faster than per-block dynamic
    scales on v5e (the in-kernel amax reduction serializes the VPU)."""
    from framewright_tpu.ops.fused_rrdb import rrdb_fast_params

    return rrdb_fast_params(params, dtype, compute_dtype=compute_dtype,
                            act_amax=act_amax, int8_scheme=int8_scheme)


def calibrate_act_scales(params: Dict, cfg: RRDBConfig,
                         sample: jnp.ndarray,
                         margin: float = 1.25) -> jnp.ndarray:
    """Record per-RDB per-stage activation ranges on a sample batch.

    Runs the bf16 body once with amax instrumentation and returns
    (num_block, 3, 5) float32: for each RDB, the max |activation| of
    [block input x, x1, x2, x3, x4] — the five tensors the int8 kernel
    quantizes — scaled by ``margin`` headroom.  Use a small sample
    (e.g. a 256px center crop of the first frame): activation ranges
    are nearly resolution-invariant, calibration is then < 100 ms.
    """
    body = params["body"]
    if isinstance(body, list):
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *body)
    else:
        stacked = body

    def rdb_stats(p, x):
        a0 = jnp.max(jnp.abs(x))
        x1 = lrelu(conv2d(p["conv1"], x))
        x2 = lrelu(conv2d(p["conv2"], jnp.concatenate([x, x1], axis=-1)))
        x3 = lrelu(conv2d(p["conv3"],
                          jnp.concatenate([x, x1, x2], axis=-1)))
        x4 = lrelu(conv2d(p["conv4"],
                          jnp.concatenate([x, x1, x2, x3], axis=-1)))
        x5 = conv2d(p["conv5"],
                    jnp.concatenate([x, x1, x2, x3, x4], axis=-1))
        amax = jnp.stack([a0] + [jnp.max(jnp.abs(v))
                                 for v in (x1, x2, x3, x4)])
        return x5 * 0.2 + x, amax

    def block(h, bp):
        stats = []
        out = h
        for j in ("rdb1", "rdb2", "rdb3"):
            out, s = rdb_stats(bp[j], out)
            stats.append(s)
        return out * 0.2 + h, jnp.stack(stats)

    @jax.jit
    def run(stacked_body, x):
        feat = _head(params, x.astype(jnp.bfloat16), cfg)
        _, amaxes = jax.lax.scan(block, feat, stacked_body)
        return amaxes.astype(jnp.float32) * margin

    return run(stacked, sample)


def _out_epilogue(out: jnp.ndarray, out_mode: str, full_range: bool):
    """XLA fallback for the fused output modes: EXACTLY the SR jit's
    production epilogue (processors/super_resolution.py run()) applied
    to a float RGB image in [0,1]-ish range — used when the resident
    tail3 path (which fuses this into the kernel) can't run, so every
    caller sees a uniform contract."""
    y = jnp.clip(out.astype(jnp.float32), 0.0, 1.0) * 255.0
    if out_mode == "rgb_u8":
        return jnp.floor(y + 0.5).astype(jnp.uint8)
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
    return (jnp.clip(jnp.floor(yy + 0.5), 0, 255).astype(jnp.uint8),
            jnp.clip(jnp.floor(uu + 128.5), 0, 255).astype(jnp.uint8),
            jnp.clip(jnp.floor(vv + 128.5), 0, 255).astype(jnp.uint8))


def apply_fast(params: Dict, fast_params: Dict, x: jnp.ndarray,
               cfg: RRDBConfig = RRDBConfig(), interpret: bool = False,
               fast_tail=None, out_mode: str = "bf16",
               full_range: bool = False):
    """Forward pass with the fused Pallas RDB body (TPU hot path).

    Numerics match ``apply`` at bf16 rounding level (tests assert).
    ``fast_tail`` (a prepared ops.pallas_conv.FastTail) routes the
    upsample/tail convs through the band-conv kernel as well (2.2x over
    XLA on v5e); ``interpret=True`` runs kernels in the Pallas
    interpreter (CPU CI).

    ``out_mode`` fuses the production output epilogue into the tail3
    kernel when the merge body runs (exact XLA fallback otherwise):
      "bf16"      float RGB (B, H*4/ps, W*4/ps, 3) — the default;
      "rgb_u8"    uint8 RGB, floor(clip(y,0,1)*255+0.5) in-kernel;
      "yuv420_u8" uint8 (Y, U, V) 4:2:0 planes, BT.601 CSC + subsample
                  in-kernel (the straight-to-Y4M writer path).
    """
    from framewright_tpu.ops.fused_rrdb import rrdb_body_fast

    import os as _os

    feat = _head(params, x, cfg)
    kind = _os.environ.get("FW_TAIL", _TAIL_DEFAULT)
    if (kind in ("3", "auto") and "tail3_phase" in fast_params
            and fast_tail is None):
        # tail3 (the default whenever the merge body can run): the
        # body's resident blocks feed the whole tail — K1 ring-merge +
        # conv_body + skip, then the phase tail at the body geometry —
        # no assembly, no image-level conv_body, no tail re-extraction
        # (ops/fused_tail3.py). Measured on v5e at 1080p x2
        # (scripts/bench_tail3.py, same process, full apply_fast):
        # bf16 B=1 204.3 (tail2) -> 200.5 ms; bf16 B=4 194.3 -> 192.7;
        # int8-i32 B=1 190.9 (tail1) -> 149.3 ms (6.70 fps); int8 B=3
        # 180.9 -> 145.6 ms (6.87 fps) — the int8 path's image-level
        # glue (assembly + XLA conv_body + conv_up1 + re-extraction)
        # was ~22% of its frame time.
        from framewright_tpu.ops.fused_rrdb import rrdb_body_merge_blocks
        from framewright_tpu.ops.fused_tail3 import tail3_image

        res = rrdb_body_merge_blocks(feat, fast_params,
                                     interpret=interpret)
        if res is not None:
            out_blocks, feat_blocks, ext, (b, nh, nw) = res
            return tail3_image(
                out_blocks, feat_blocks, ext, b, nh, nw,
                int(feat.shape[1]), int(feat.shape[2]),
                fast_params["tail3_phase"], interpret=interpret,
                out_mode=out_mode, full_range=full_range)
    body_out = rrdb_body_fast(feat, fast_params, interpret=interpret)
    if fast_tail is not None:
        out = fast_tail(feat, body_out)
        return (out if out_mode == "bf16"
                else _out_epilogue(out, out_mode, full_range))
    if kind == "auto":
        # Fallback when the merge body can't run (dynamic-scale int8):
        # measured on v5e at 1080p x2 (scripts/bench_tail2.py, same
        # process): bf16 full frame 242.2 (tail1) -> 211.7 ms (tail2);
        # int8 dynamic 191.5 (tail1) -> 199.1 ms (tail2) — tail2 wins
        # only when the body runs bf16.
        body_int8 = fast_params["body_wide"]["Wx"].dtype == jnp.int8
        kind = "1" if body_int8 else "2"

    def _done(out):
        return (out if out_mode == "bf16"
                else _out_epilogue(out, out_mode, full_range))

    if kind == "2" and "tail2_phase" in fast_params:
        return _done(_tail_pallas2(params, fast_params, feat, body_out,
                                   interpret=interpret))
    if "tail_phase" in fast_params:
        return _done(_tail_pallas(params, fast_params, feat, body_out,
                                  interpret=interpret))
    # NOTE: _tail_folded (exact 4/9-FLOP upsample-conv rewrite) measured
    # SLOWER on v5e than XLA's fused nearest+conv (66.7 -> 78.1 ms tail;
    # scripts/bench_tail.py) — the pixel_shuffle transposes cost more
    # than the saved MACs in XLA; the Pallas phase-tail kernel
    # (fast_params["tail_phase"]) exploits the phase sparsity without
    # any shuffles and is the default when present.
    return _done(_tail(params, feat, body_out))


def stack_body(params: Dict) -> Dict:
    """Convert list-of-blocks storage to scan-ready stacked storage."""
    if isinstance(params["body"], list):
        params = dict(params)
        params["body"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params["body"])
    return params
