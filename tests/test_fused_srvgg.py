"""Fused SRVGG conv-chain Pallas kernel tests (interpreter mode on CPU).

Numerics: the fused K-conv chain must match the plain SRVGG forward at
bf16 rounding level, including frame borders (SAME zero-pad masking via
extents) and block-grid seams. Throughput is exercised by bench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import srvgg
from framewright_tpu.ops import fused_srvgg


@pytest.fixture(scope="module")
def tiny_model():
    # num_conv = GROUP + 2 exercises an uneven trailing group
    cfg = srvgg.SRVGGConfig(num_conv=fused_srvgg.GROUP + 2, scale=2)
    params = srvgg.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    fast = fused_srvgg.make_fast_params(params, cfg)
    return cfg, params, fast


class TestFastParams:
    def test_group_shapes(self, tiny_model):
        cfg, params, fast = tiny_model
        groups = fast["groups"]
        assert len(groups) == 2
        w0, b0, a0 = groups[0]
        assert w0.shape == (fused_srvgg.GROUP, 64, 9 * 64)
        assert b0.shape == (fused_srvgg.GROUP, 64, 1)
        assert a0.shape == (fused_srvgg.GROUP, 64, 1)
        w1, _, _ = groups[1]
        assert w1.shape == (2, 64, 9 * 64)

    def test_wide_row_matches_conv(self, tiny_model):
        # one wide row applied to an im2col patch == the conv output
        cfg, params, _ = tiny_model
        conv_p = params["body"][1]
        wt, b = fused_srvgg._wide_conv(conv_p)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((5, 5, 64)).astype(np.float32)
        from framewright_tpu.models.layers import conv2d

        y_conv = np.asarray(conv2d(conv_p, jnp.asarray(x)[None]))[0]
        pv = np.concatenate(
            [x[1 + di, 1 + dj] for di in range(3) for dj in range(3)])
        y_wide = wt @ pv + b[:, 0]
        np.testing.assert_allclose(y_wide, y_conv[2, 2], rtol=1e-4,
                                   atol=1e-5)


class TestFusedChainNumerics:
    @pytest.mark.parametrize("hw", [
        (30, 30),                              # single block w/ border
        (fused_srvgg.BH_V + 7, fused_srvgg.BH_V * 2 + 3),  # seams + ragged
    ])
    @pytest.mark.slow
    def test_matches_plain_forward(self, tiny_model, hw):
        cfg, params, fast = tiny_model
        h, w = hw
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
        want = np.asarray(srvgg.apply(params, x, cfg), np.float32)
        got = np.asarray(
            fused_srvgg.apply_fast(params, fast, x, cfg, interpret=True),
            np.float32)
        assert got.shape == want.shape == (1, h * 2, w * 2, 3)
        err = np.abs(got - want)
        scale = np.abs(want).max() + 1e-3
        # bf16 body rounding through num_conv convs
        assert err.max() / scale < 0.05
        assert err.mean() / scale < 0.005

    @pytest.mark.slow
    def test_int8_chain_close_to_bf16(self, tiny_model):
        """int8 static-scale chain: bounded quantization error vs the
        plain forward (the RDB int8 contract, tests/test_int8_mode.py)."""
        cfg, params, _ = tiny_model
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((1, 28, 30, 3), dtype=np.float32))
        amax = np.asarray(
            fused_srvgg.calibrate_act_scales(params, cfg, x))
        assert amax.shape == (cfg.num_conv + 1,)
        fast8 = fused_srvgg.make_fast_params_int8(params, cfg, amax)
        want = np.asarray(srvgg.apply(params, x, cfg), np.float32)
        got = np.asarray(
            fused_srvgg.apply_fast(params, fast8, x, cfg, interpret=True),
            np.float32)
        assert got.shape == want.shape
        mse = float(np.mean((got - want) ** 2))
        psnr = 10 * np.log10(
            max(float(want.max()) - float(want.min()), 1e-6) ** 2
            / max(mse, 1e-12))
        assert psnr > 35.0, psnr

    @pytest.mark.slow
    def test_batch_of_frames(self, tiny_model):
        cfg, params, fast = tiny_model
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.random((2, 24, 26, 3), dtype=np.float32))
        want = np.asarray(srvgg.apply(params, x, cfg), np.float32)
        got = np.asarray(
            fused_srvgg.apply_fast(params, fast, x, cfg, interpret=True),
            np.float32)
        err = np.abs(got - want)
        assert err.max() / (np.abs(want).max() + 1e-3) < 0.05
