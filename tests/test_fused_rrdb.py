"""Fused RDB Pallas kernel tests (interpreter mode on CPU).

The real-hardware throughput is exercised by bench.py; here we verify
NUMERICS: the fused wide-matmul body must match the plain conv body at
bf16 rounding level, including frame borders (SAME zero-pad masking)
and grid seams.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb
from framewright_tpu.ops import fused_rrdb


def _plain_body(params, feat):
    """Reference: the plain conv RRDB trunk (bf16 like the kernel)."""
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params["body"])

    def block(h, bp):
        return rrdb._rrdb_forward(bp, h), None

    out, _ = jax.lax.scan(block, feat, stacked)
    return out


@pytest.fixture(scope="module")
def tiny_model():
    cfg = rrdb.RRDBConfig(num_block=1, scale=4)
    params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    fast = rrdb.make_fast_params(params)
    return cfg, params, fast


class TestWideWeights:
    def test_wide_shapes(self, tiny_model):
        _, params, fast = tiny_model
        bw = fast["body_wide"]
        assert bw["Wx"].shape == (1, 3, 192, 576)
        assert bw["W1"].shape == (1, 3, 160, 288)
        assert bw["W4"].shape == (1, 3, 64, 288)
        assert bw["b"].shape == (1, 3, 192, 1)

    def test_wide_matmul_equals_convs(self, tiny_model):
        # the wide matrices must reproduce each conv contribution
        _, params, _ = tiny_model
        rdb = params["body"][0]["rdb1"]
        wide = fused_rrdb.rdb_wide_weights(rdb, dtype=jnp.float32)
        # conv1 on random x == first 32 targets of Wx applied to patches
        rng = np.random.default_rng(0)
        x = rng.standard_normal((5, 5, 64)).astype(np.float32)
        from framewright_tpu.models.layers import conv2d

        y_conv = np.asarray(conv2d(rdb["conv1"], jnp.asarray(x)[None]))[0]
        # build patch vector at center pixel (2,2): taps rows 1..3
        pv = np.concatenate([x[1 + di, 1 + dj] for di in range(3) for dj in range(3)])
        y_wide = np.asarray(wide["Wx"])[0:32] @ pv + np.asarray(wide["b"])[0:32, 0]
        np.testing.assert_allclose(y_wide, y_conv[2, 2], rtol=1e-4, atol=1e-5)


class TestFusedBodyNumerics:
    @pytest.mark.parametrize("hw", [(40, 40), (54, 54), (60, 80)])
    @pytest.mark.slow
    def test_matches_plain_body(self, tiny_model, hw):
        cfg, params, fast = tiny_model
        h, w = hw
        rng = np.random.default_rng(1)
        feat = jnp.asarray(
            rng.standard_normal((1, h, w, 64)).astype(np.float32) * 0.5
        ).astype(jnp.bfloat16)
        want = np.asarray(_plain_body(params, feat), np.float32)
        got = np.asarray(
            fused_rrdb.rrdb_body_fast(feat, fast, interpret=True), np.float32
        )
        assert got.shape == want.shape
        # bf16 rounding differences accumulate through 15 convs; the
        # fused path reorders summation so allow small tolerance
        err = np.abs(got - want)
        scale = np.abs(want).max() + 1e-3
        assert err.max() / scale < 0.05
        assert err.mean() / scale < 0.005

    def test_border_masking_exact_on_zero_bias_free_region(self, tiny_model):
        # with all conv biases zeroed the net IS zero-preserving, so
        # fused and plain must agree tightly even at borders
        cfg, params, fast = tiny_model
        p0 = jax.tree_util.tree_map(lambda v: v, params)
        for blk in p0["body"]:
            for rdbk in blk.values():
                for conv in rdbk.values():
                    conv["b"] = jnp.zeros_like(conv["b"])
        fast0 = rrdb.make_fast_params(p0)
        rng = np.random.default_rng(2)
        feat = jnp.asarray(
            rng.standard_normal((1, 30, 30, 64)).astype(np.float32) * 0.5
        ).astype(jnp.bfloat16)
        want = np.asarray(_plain_body(p0, feat), np.float32)
        got = np.asarray(fused_rrdb.rrdb_body_fast(feat, fast0, interpret=True), np.float32)
        err = np.abs(got - want)
        assert err.max() < 0.02


class TestApplyFast:
    def test_full_model_close_to_reference(self, tiny_model):
        cfg, params, fast = tiny_model
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((1, 24, 32, 3), dtype=np.float32))
        ref = np.asarray(rrdb.apply(params, x, cfg), np.float32)
        out = np.asarray(
            rrdb.apply_fast(params, fast, x.astype(jnp.bfloat16), cfg,
                            interpret=True), np.float32)
        assert out.shape == ref.shape == (1, 96, 128, 3)
        # reference runs f32, fast path bf16: expect ~1e-2 agreement
        assert np.abs(out - ref).mean() < 0.02


class TestTailFolds:
    """Exact weight folds for the upsample tail (kept as alternatives;
    measured slower than XLA's fused tail on v5e — PERF.md round 2)."""

    def test_upconv_fold_exact(self):
        from framewright_tpu.models.layers import (
            conv2d,
            pixel_shuffle,
            upsample_nearest,
        )

        key = jax.random.PRNGKey(3)
        p = {"w": jax.random.normal(key, (3, 3, 64, 64), jnp.float32) * 0.1,
             "b": jax.random.normal(jax.random.PRNGKey(4), (64,)) * 0.1}
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 17, 23, 64))
        ref = conv2d(p, upsample_nearest(x, 2))
        f = fused_rrdb.fold_upconv_nearest2(p)
        fj = {"w": jnp.asarray(f["w"]), "b": jnp.asarray(f["b"])}
        got = pixel_shuffle(conv2d(fj, x), 2)
        assert float(jnp.max(jnp.abs(ref - got))) < 1e-4

    def test_conv_after_ps2_fold_exact(self):
        from framewright_tpu.models.layers import conv2d, pixel_shuffle

        p = {"w": jax.random.normal(jax.random.PRNGKey(0), (3, 3, 16, 24)) * 0.1,
             "b": jax.random.normal(jax.random.PRNGKey(1), (24,)) * 0.1}
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 13, 64))
        ref = conv2d(p, pixel_shuffle(x, 2))
        f = fused_rrdb.fold_conv_after_ps2(p)
        fj = {"w": jnp.asarray(f["w"]), "b": jnp.asarray(f["b"])}
        got = fused_rrdb.conv_after_ps2_apply(fj, x)
        assert got.shape == ref.shape
        assert float(jnp.max(jnp.abs(ref - got))) < 1e-4

    def test_folded_tail_full_model_parity(self, tiny_model):
        cfg, params, fast = tiny_model
        from framewright_tpu.models.rrdb import _tail_folded

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((1, 24, 32, 3), dtype=np.float32))
        feat = rrdb._head(params, x, cfg)
        body = rrdb.apply(params, x, cfg)  # reference full output
        from framewright_tpu.ops.fused_rrdb import rrdb_body_fast  # noqa: F401
        # compare _tail vs _tail_folded on identical inputs
        body_out = feat  # any feature tensor works for tail equivalence
        a = rrdb._tail(params, feat, body_out)
        b = _tail_folded(params, fast, feat, body_out)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4


class TestResidentBody:
    """Block-resident body (extract once + halo refresh) must match the
    per-RDB round-trip path exactly (same kernels, same masking)."""

    @pytest.mark.slow
    @pytest.mark.parametrize("hw", [(54, 54), (60, 80)])
    def test_resident_matches_roundtrip(self, tiny_model, hw, monkeypatch):
        cfg, params, fast = tiny_model
        h, w = hw
        rng = np.random.default_rng(7)
        feat = jnp.asarray(
            rng.standard_normal((1, h, w, 64)).astype(np.float32) * 0.5
        ).astype(jnp.bfloat16)
        monkeypatch.setenv("FW_RDB_RESIDENT", "0")
        want = np.asarray(
            fused_rrdb.rrdb_body_fast(feat, fast, interpret=True), np.float32)
        got = np.asarray(
            fused_rrdb.rrdb_body_resident(feat, fast, interpret=True),
            np.float32)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-2)
        err = np.abs(got - want)
        assert err.max() < 5e-3, err.max()

    @pytest.mark.parametrize("hw", [(54, 54), (70, 130)])
    def test_merge_matches_roundtrip_bf16(self, tiny_model, hw):
        # merge-in-kernel ring refresh must be BIT-identical to the
        # round-trip path (same kernels; rings equal neighbor interiors
        # in both designs, frame borders gated by the extents)
        cfg, params, fast = tiny_model
        h, w = hw
        rng = np.random.default_rng(11)
        feat = jnp.asarray(
            rng.standard_normal((2, h, w, 64)).astype(np.float32) * 0.5
        ).astype(jnp.bfloat16)
        want = np.asarray(fused_rrdb.rrdb_body_fast_roundtrip(
            feat, fast, interpret=True), np.float32)
        got = np.asarray(fused_rrdb.rrdb_body_merge(
            feat, fast, interpret=True), np.float32)
        np.testing.assert_array_equal(got, want)

    def test_merge_batch_equals_per_frame(self, tiny_model):
        # frame batching through the merge body (production planner
        # batches whole frames): each frame's rings must come from its
        # OWN neighbors — batch output bit-identical to per-frame runs
        cfg, params, fast = tiny_model
        rng = np.random.default_rng(13)
        feat = jnp.asarray(
            rng.standard_normal((3, 40, 56, 64)).astype(np.float32) * 0.5
        ).astype(jnp.bfloat16)
        batched = np.asarray(fused_rrdb.rrdb_body_merge(
            feat, fast, interpret=True), np.float32)
        for i in range(3):
            single = np.asarray(fused_rrdb.rrdb_body_merge(
                feat[i:i + 1], fast, interpret=True), np.float32)
            np.testing.assert_array_equal(batched[i:i + 1], single)

    def test_merge_matches_roundtrip_int8_static(self, tiny_model):
        cfg, params, fast = tiny_model
        amax = rrdb.calibrate_act_scales(
            params, cfg,
            jnp.asarray(np.random.default_rng(3).random((1, 64, 64, 3)),
                        jnp.bfloat16))
        # f32acc: the i32 scheme has no round-trip twin (merge-only);
        # its numerics are gated by test_int8_mode's PSNR check
        fast8 = rrdb.make_fast_params(params, compute_dtype="int8",
                                      act_amax=np.asarray(amax),
                                      int8_scheme="f32acc")
        rng = np.random.default_rng(12)
        feat = jnp.asarray(
            rng.standard_normal((1, 70, 90, 64)).astype(np.float32) * 0.5
        ).astype(jnp.bfloat16)
        want = np.asarray(fused_rrdb.rrdb_body_fast_roundtrip(
            feat, fast8, interpret=True), np.float32)
        got = np.asarray(fused_rrdb.rrdb_body_merge(
            feat, fast8, interpret=True), np.float32)
        np.testing.assert_array_equal(got, want)

    def test_merge_int8_dynamic_falls_back_to_roundtrip(self, tiny_model):
        # dynamic-scale int8 has no merge kernel; rrdb_body_merge must
        # route it through the round-trip path rather than fail
        cfg, params, fast = tiny_model
        fast8d = rrdb.make_fast_params(params, compute_dtype="int8")
        feat = jnp.asarray(
            np.random.default_rng(13).standard_normal((1, 54, 54, 64))
            .astype(np.float32) * 0.5).astype(jnp.bfloat16)
        want = np.asarray(fused_rrdb.rrdb_body_fast_roundtrip(
            feat, fast8d, interpret=True), np.float32)
        got = np.asarray(fused_rrdb.rrdb_body_merge(
            feat, fast8d, interpret=True), np.float32)
        np.testing.assert_array_equal(got, want)

    def test_halo_refresh_xla_matches_reextract(self):
        # refreshing stale rings must equal re-extracting windows from
        # the assembled interior image
        b, h, w = 1, 70, 90
        nh, nw = fused_rrdb._grid_dims(h, w)
        rng = np.random.default_rng(8)
        img = jnp.asarray(
            rng.standard_normal((b, fused_rrdb.NF, h, w)).astype(np.float32)
        ).astype(jnp.bfloat16)
        blocks = fused_rrdb.extract_blocks(img, h, w)
        # poison the rings, keep interiors
        S, HALO = fused_rrdb.S, fused_rrdb.HALO
        poisoned = np.asarray(blocks, np.float32)
        poisoned[:, :, :HALO, :] = 99.0
        poisoned[:, :, S - HALO:, :] = 99.0
        poisoned[:, :, :, :HALO] = 99.0
        poisoned[:, :, :, S - HALO:] = 99.0
        refreshed = fused_rrdb.halo_refresh_xla(
            jnp.asarray(poisoned).astype(jnp.bfloat16), b, nh, nw)
        np.testing.assert_array_equal(
            np.asarray(refreshed, np.float32), np.asarray(blocks, np.float32))

    def test_extract_blocks_concat_matches_default(self):
        # the concat-based extraction (round-5 negative result, kept as
        # a cross-check) must bit-match the default per-window slice
        # extraction, including frame-border zeros and grid slack
        for b, h, w in [(1, 70, 90), (2, 96, 96), (1, 54, 131)]:
            rng = np.random.default_rng(h + w)
            img = jnp.asarray(
                rng.standard_normal((b, fused_rrdb.NF, h, w))
                .astype(np.float32)).astype(jnp.bfloat16)
            got = np.asarray(fused_rrdb.extract_blocks_concat(img, h, w))
            want = np.asarray(fused_rrdb.extract_blocks(img, h, w))
            np.testing.assert_array_equal(got, want)

    def test_extract_assemble_roundtrip(self):
        b, h, w = 2, 60, 70
        rng = np.random.default_rng(9)
        img = jnp.asarray(
            rng.standard_normal((b, fused_rrdb.NF, h, w)).astype(np.float32)
        ).astype(jnp.bfloat16)
        blocks = fused_rrdb.extract_blocks(img, h, w)
        back = fused_rrdb.assemble_blocks(blocks, b, h, w)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(img))

    def test_halo_refresh_dus_matches_reextract(self):
        # the DUS refresh preserves out-of-grid border rings (which the
        # pipeline keeps at zero) and rebuilds every in-grid ring from
        # neighbor interiors: zeroing ALL rings then refreshing must
        # reproduce the original extraction exactly
        b, h, w = 1, 70, 90
        nh, nw = fused_rrdb._grid_dims(h, w)
        rng = np.random.default_rng(11)
        img = jnp.asarray(
            rng.standard_normal((b, fused_rrdb.NF, h, w)).astype(np.float32)
        ).astype(jnp.bfloat16)
        blocks = fused_rrdb.extract_blocks(img, h, w)
        S, HALO = fused_rrdb.S, fused_rrdb.HALO
        poisoned = np.asarray(blocks, np.float32)
        poisoned[:, :, :HALO, :] = 0.0
        poisoned[:, :, S - HALO:, :] = 0.0
        poisoned[:, :, :, :HALO] = 0.0
        poisoned[:, :, :, S - HALO:] = 0.0
        assert np.abs(np.asarray(blocks, np.float32) - poisoned).max() > 0.5
        refreshed = fused_rrdb.halo_refresh(
            jnp.asarray(poisoned).astype(jnp.bfloat16), b, nh, nw)
        np.testing.assert_array_equal(
            np.asarray(refreshed, np.float32), np.asarray(blocks, np.float32))
