"""Planner + tiled inference tests.

Key invariant (the reference's tiling had no such guarantee): tiled
output equals whole-frame output exactly wherever the halo covers the
effective receptive field.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.errors import HBMError
from framewright_tpu.ops import metrics
from framewright_tpu.ops.tiling import tiled_apply, whole_frame_apply
from framewright_tpu.planner import TilePlan, body_divisor, estimate_activation_bytes, plan


class TestPlanner:
    def test_whole_frame_when_hbm_large(self):
        p = plan(1080, 1920, 2, "rrdb", "bfloat16", hbm_free_bytes=14 * 2**30)
        assert not p.tiled
        assert p.batch >= 1

    def test_tiles_when_hbm_small(self):
        p = plan(2160, 3840, 4, "rrdb", "bfloat16", hbm_free_bytes=2 * 2**30)
        assert p.tiled
        assert p.tile_size in (1024, 768, 512, 384, 256, 192, 128, 96, 64)
        nh, nw = p.grid
        assert nh * p.tile_size >= 2160 and nw * p.tile_size >= 3840

    def test_override_pins_tile(self):
        p = plan(1080, 1920, 2, "rrdb", hbm_free_bytes=14 * 2**30,
                 tile_size_override=256)
        assert p.tile_size == 256

    def test_impossible_raises(self):
        with pytest.raises(HBMError):
            plan(8192, 8192, 4, "rrdb", "float32", hbm_free_bytes=1 * 2**20)

    def test_planner_picks_measured_best_batches_on_16gb(self):
        """VERDICT r4 #4: on a 16 GB chip at 1080p x2 the planner must
        pick the bench-measured best batch (B=4 bf16 / B=3 int8),
        whole-frame, no OOM-downshift needed."""
        p16 = plan(1080, 1920, 2, "rrdb", "bfloat16",
                   hbm_free_bytes=16 * 2**30)
        assert not p16.tiled and p16.batch == 4, p16
        p8 = plan(1080, 1920, 2, "rrdb", "int8",
                  hbm_free_bytes=16 * 2**30)
        assert not p8.tiled and p8.batch == 3, p8

    def test_int8_rrdb_batch_capped_by_compiler_limit(self):
        """The axon remote compiler crashes on the int8 merge body at
        B>=4 (PERF.md; scripts/probe_compiler_crashes.py): the planner
        must never pick past the documented cap, however much HBM is
        free."""
        p = plan(1080, 1920, 2, "rrdb", "int8", hbm_free_bytes=64 * 2**30)
        assert not p.tiled
        assert p.batch == 3

    def test_downshift_halves_batch_then_tiles(self):
        p = plan(512, 512, 2, "rrdb", hbm_free_bytes=14 * 2**30, max_batch=8)
        assert p.batch > 1
        d = p.downshift()
        assert d.batch == p.batch // 2
        one = TilePlan(512, 512, 2, 0, 0, 1, 2, 0)
        t = one.downshift()
        assert t.tiled

    def test_downshift_bottom_raises(self):
        p = TilePlan(512, 512, 2, 64, 8, 1, 2, 0)
        with pytest.raises(HBMError):
            p.downshift()

    def test_body_divisor(self):
        assert body_divisor("rrdb", 4) == 1
        assert body_divisor("rrdb", 2) == 2
        assert body_divisor("rrdb", 1) == 4
        assert body_divisor("srvgg", 4) == 1

    def test_estimate_monotonic_in_batch(self):
        a = estimate_activation_bytes("rrdb", 256, 256, 2, "bfloat16", 1)
        b = estimate_activation_bytes("rrdb", 256, 256, 2, "bfloat16", 4)
        assert b > a


def _mean3(x):
    """A cheap conv-like fn with receptive field 1 (3x3 box blur) + 2x
    nearest upsample, standing in for an SR model."""
    k = jnp.ones((3, 3, 1, 1), jnp.float32) / 9.0
    k = jnp.tile(k, (1, 1, 1, x.shape[-1]))
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
    return jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)


class TestCompileCrashDownshift:
    def test_materialize_downshifts_on_compiler_failure(self, rng, tmp_path):
        """A remote-compiler crash (HTTP 500 / tpu_compile_helper —
        classified CompilationError) at batch>1 must downshift the plan
        and retry, like OOM (PERF.md compiler-fragility workaround)."""
        from framewright_tpu.processors.super_resolution import (
            SRConfig,
            SuperResolution,
        )

        sr = SuperResolution(SRConfig(
            model_name="realesr-animevideov3", compute_dtype="float32",
            sharding="none", weights_dir=str(tmp_path)))
        sr.setup(16, 16)
        frames = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
        b0 = sr._plan.batch
        assert b0 > 1
        handle = {
            "y": None,
            "exc": RuntimeError(
                "HTTP 500 from remote compile server; "
                "tpu_compile_helper exited with code 1"),
            "x": frames, "n": 2,
        }
        out = sr.materialize(handle)
        assert out.shape == (2, 64, 64, 3)
        assert sr._plan.batch == max(1, b0 // 2)


class TestTiling:
    def test_identity_tiling_reconstructs(self, rng):
        # scale-1 "model" = identity: any tiling must reconstruct input
        x = jnp.asarray(rng.random((2, 64, 96, 3), dtype=np.float32))
        p = TilePlan(64, 96, 1, 32, 4, 3, 1, 0)
        y = tiled_apply(lambda t: t, x, p)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-7)

    @pytest.mark.parametrize("hw", [(64, 96), (50, 70), (33, 129)])
    def test_tiled_matches_whole_frame(self, hw, rng):
        # _mean3 has receptive field 1 << overlap 4 -> exact everywhere,
        # including frame borders (clamped windows)
        h, w = hw
        x = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
        whole = TilePlan(h, w, 2, 0, 0, 1, 1, 0)
        tiled = TilePlan(h, w, 2, 32, 4, 2, 1, 0)
        a = np.asarray(tiled_apply(_mean3, x, whole))
        b = np.asarray(tiled_apply(_mean3, x, tiled))
        assert a.shape == (1, h * 2, w * 2, 3)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_whole_frame_pads_body_divisor(self, rng):
        # odd dims with body divisor 2 must still work (scale-2 unshuffle)
        from framewright_tpu.models import rrdb

        cfg = rrdb.RRDBConfig(num_block=1, scale=2)
        params = rrdb.init(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.random((1, 37, 51, 3), dtype=np.float32))
        p = TilePlan(37, 51, 2, 0, 0, 1, 2, 0)
        y = whole_frame_apply(lambda t: rrdb.apply(params, t, cfg), x, p)
        assert y.shape == (1, 74, 102, 3)

    def test_rrdb_tiled_exact_when_halo_covers_rf(self, rng):
        # Guarantee: overlap >= receptive field => tiled output is
        # bit-identical to whole-frame EVERYWHERE, even with random
        # (non-decaying) weights. 2 RRDB blocks = 2*(3 RDB * 5 convs)
        # + 3 head/tail convs ~ 33 px radius; use halo 40.
        from framewright_tpu.models import rrdb

        cfg = rrdb.RRDBConfig(num_block=2, scale=4)
        params = rrdb.init(jax.random.PRNGKey(0), cfg)
        fn = lambda t: rrdb.apply(params, t, cfg)  # noqa: E731
        x = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        whole = np.asarray(tiled_apply(fn, x, TilePlan(48, 64, 4, 0, 0, 1, 1, 0)))
        tiled = np.asarray(tiled_apply(fn, x, TilePlan(48, 64, 4, 32, 40, 4, 1, 0)))
        assert np.abs(whole - tiled).max() < 1e-5

    def test_batch_chunking_any_count(self, rng):
        # 5 frames with chunk 2 -> padding path exercised
        x = jnp.asarray(rng.random((5, 16, 16, 3), dtype=np.float32))
        p = TilePlan(16, 16, 2, 0, 0, 2, 1, 0)
        y = tiled_apply(_mean3, x, p)
        assert y.shape == (5, 32, 32, 3)
        y1 = tiled_apply(_mean3, x, TilePlan(16, 16, 2, 0, 0, 1, 1, 0))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y1), atol=1e-6)


class TestMetrics:
    def test_psnr_identity_is_huge(self, rng):
        x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        assert float(metrics.psnr(x, x)) > 100

    def test_psnr_known_value(self):
        a = jnp.zeros((8, 8, 1))
        b = jnp.full((8, 8, 1), 0.1)
        assert abs(float(metrics.psnr(a, b)) - 20.0) < 1e-3

    def test_ssim_identity(self, rng):
        x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        assert float(metrics.ssim(x, x)) > 0.999

    def test_ssim_degrades_with_noise(self, rng):
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        noisy = x + 0.2 * jnp.asarray(rng.standard_normal(x.shape, dtype=np.float32))
        assert float(metrics.ssim(x, noisy)) < 0.9

    def test_quality_gate(self, rng):
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        ok, m = metrics.quality_gate(x, x)
        assert ok and m["psnr"] > 50
        bad = jnp.zeros_like(x)
        ok2, m2 = metrics.quality_gate(bad, x)
        assert not ok2

    def test_psnr_np_matches_jax(self, rng):
        a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        b = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        p_np = metrics.psnr_np(a, b)
        p_jx = float(metrics.psnr(a / 255.0, b / 255.0, max_val=1.0))
        assert abs(p_np - p_jx) < 0.01
