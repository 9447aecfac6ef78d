"""Overlap-tiled inference over static-shape jit functions.

TPU-native replacement for RealESRGANer's per-tile Python loop (the
reference's in-process tiling path) and the ncnn `-t tile` flag: frames
are decomposed into a grid of fixed-size overlapping windows, the model
runs over window batches sized by the HBM planner inside one traced XLA
program (window extraction = static slices, the chunk loop = lax.map,
assembly = static slices + concat), and each window's interior is
stitched back.

Window semantics follow the official tiler: halos are CLAMPED at frame
bounds — near a border the fixed-size window slides inward and the
interior offset shifts correspondingly (all offsets static per grid
position). This matters because deep nets are not zero-preserving
(biases), so synthetic halo padding would differ from the model's own
SAME-conv boundary behavior; with clamped windows, border pixels are
bit-identical to whole-frame inference, and interior pixels are
bit-identical wherever the halo covers the receptive field (tested).

Frames whose grid-aligned extent cannot contain one full window fall
back to whole-frame processing (the planner only tiles large frames).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from framewright_tpu.planner import TilePlan


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_mod(x: jnp.ndarray, bottom: int, right: int) -> jnp.ndarray:
    """Grid/divisor alignment padding on bottom/right, reflect mode
    (matching the official mod_pad; falls back to edge when the pad
    exceeds the reflectable extent)."""
    if bottom == 0 and right == 0:
        return x
    h, w = x.shape[1], x.shape[2]
    mode = "reflect" if bottom < h and right < w else "edge"
    return jnp.pad(x, ((0, 0), (0, bottom), (0, right), (0, 0)), mode=mode)


def _chunked_map(fn: Callable, x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Apply fn over the leading axis in fixed-size chunks.

    Pads the axis to a multiple of ``chunk`` (repeating the last item)
    so every chunk has the same static shape, maps fn over chunks with
    lax.map (one compile), then trims.
    """
    n = x.shape[0]
    n_pad = _ceil_to(max(n, 1), chunk)
    if n_pad != n:
        pad_block = jnp.broadcast_to(x[-1:], (n_pad - n,) + x.shape[1:])
        x = jnp.concatenate([x, pad_block], axis=0)
    xs = x.reshape((n_pad // chunk, chunk) + x.shape[1:])
    ys = jax.lax.map(fn, xs)
    ys = ys.reshape((n_pad,) + ys.shape[2:])
    return ys[:n]


def whole_frame_apply(fn: Callable, x: jnp.ndarray, plan: TilePlan) -> jnp.ndarray:
    """Run fn over full frames, batched per plan, padding dims to the
    model's body divisor (reflect, official mod_pad semantics)."""
    b, h, w, c = x.shape
    s, u = plan.scale, plan.body_divisor
    hp, wp = _ceil_to(h, u), _ceil_to(w, u)
    xp = pad_mod(x, hp - h, wp - w)
    y = _chunked_map(fn, xp, plan.batch)
    return y[:, : h * s, : w * s, :]


def _window_starts(extent: int, tile: int, overlap: int, n: int) -> list:
    """Clamped start offsets of fixed-size windows along one axis."""
    full = tile + 2 * overlap
    return [max(0, min(i * tile - overlap, extent - full)) for i in range(n)]


def tiled_apply(fn: Callable, x: jnp.ndarray, plan: TilePlan) -> jnp.ndarray:
    """Apply an SR-like fn ((N,h,w,C)->(N,h*s,w*s,C)) to frames (B,H,W,C)
    according to the plan. Fully traceable; shapes static given plan."""
    if not plan.tiled:
        return whole_frame_apply(fn, x, plan)
    b, h, w, c = x.shape
    s, ts, o = plan.scale, plan.tile_size, plan.overlap
    u = plan.body_divisor
    full = _ceil_to(ts + 2 * o, u)
    o2 = (full - ts) // 2  # halo after divisor alignment (full-ts even)
    # Canvas = the same divisor-aligned extent whole_frame_apply uses;
    # NO padding to the tile grid — windows clamp inside the canvas and
    # the last band's interior is simply narrower. This keeps the two
    # paths operating on identical content everywhere.
    hp, wp = _ceil_to(h, u), _ceil_to(w, u)
    if hp < full or wp < full:
        return whole_frame_apply(fn, x, plan)
    xp = pad_mod(x, hp - h, wp - w)
    nh, nw = -(-hp // ts), -(-wp // ts)

    row_starts = _window_starts(hp, ts, o2, nh)
    col_starts = _window_starts(wp, ts, o2, nw)
    windows = []
    for i in range(nh):
        for j in range(nw):
            windows.append(
                jax.lax.slice(
                    xp,
                    (0, row_starts[i], col_starts[j], 0),
                    (b, row_starts[i] + full, col_starts[j] + full, c),
                )
            )
    tiles = jnp.stack(windows, axis=1).reshape(b * nh * nw, full, full, c)
    out = _chunked_map(fn, tiles, plan.batch)
    out = out.reshape(b, nh * nw, full * s, full * s, c)

    # Per-window interior crop: band i covers canvas rows
    # [i*ts, min((i+1)*ts, hp)) at offset (i*ts - start) in the window —
    # all static per (i, j).
    rows = []
    for i in range(nh):
        bh = min((i + 1) * ts, hp) - i * ts
        cols = []
        for j in range(nw):
            bw = min((j + 1) * ts, wp) - j * ts
            oi = (i * ts - row_starts[i]) * s
            oj = (j * ts - col_starts[j]) * s
            k = i * nw + j
            cols.append(
                jax.lax.slice(
                    out,
                    (0, k, oi, oj, 0),
                    (b, k + 1, oi + bh * s, oj + bw * s, c),
                )[:, 0]
            )
        rows.append(jnp.concatenate(cols, axis=2))
    y = jnp.concatenate(rows, axis=1)
    return y[:, : h * s, : w * s, :]


def receptive_overlap(family: str) -> int:
    """Default halo: large enough that trained-weight contributions from
    beyond it are sub-visual (Real-ESRGAN's official tile_pad is 10)."""
    return {"rrdb": 10, "srvgg": 10, "nafnet": 16, "restormer": 16}.get(family, 16)
