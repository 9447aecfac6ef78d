"""int8 fast-mode numerics (interpreter mode on CPU).

The int8 body (compute_dtype="int8") is the reference's TensorRT-INT8
engine analog (reference infrastructure/gpu/backends/tensorrt.py:
110-455, Int8Calibrator): quantized inference offered as an explicit
fast mode with a measured quality cost, never silently. Here we bound
the numeric deviation vs the exact bf16 fused body on CPU; the real
PSNR cost on hardware is measured by scripts/bench_int8_quality.py and
recorded in PERF.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb
from framewright_tpu.ops import fused_rrdb


@pytest.fixture(scope="module")
def tiny_model():
    cfg = rrdb.RRDBConfig(num_block=1, scale=4)
    params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    fast16 = rrdb.make_fast_params(params)
    fast8 = rrdb.make_fast_params(params, compute_dtype="int8")
    return cfg, params, fast16, fast8


class TestInt8Weights:
    def test_shapes_and_scales(self, tiny_model):
        _, params, _, fast8 = tiny_model
        bw = fast8["body_wide"]
        assert bw["Wx"].dtype == jnp.int8
        assert bw["Wx"].shape == (1, 3, 192, 576)
        assert bw["sx"].shape == (1, 3, 192, 1)
        assert bw["s4"].shape == (1, 3, 64, 1)
        # int8 rows must span the full [-127, 127] range per row
        w = np.asarray(bw["Wx"][0, 0], np.int32)
        assert np.abs(w).max(axis=1).min() == 127

    def test_weight_roundtrip_error_small(self, tiny_model):
        _, params, _, fast8 = tiny_model
        wide = fused_rrdb.rdb_wide_weights(
            params["body"][0]["rdb1"], dtype=jnp.float32)
        w8 = np.asarray(fast8["body_wide"]["Wx"][0, 0], np.float32)
        s = np.asarray(fast8["body_wide"]["sx"][0, 0], np.float32)
        back = w8 * s
        ref = np.asarray(wide["Wx"], np.float32)
        denom = np.abs(ref).max(axis=1, keepdims=True) + 1e-12
        assert (np.abs(back - ref) / denom).max() < (0.5 / 127 + 1e-6)


class TestInt8BodyNumerics:
    @pytest.mark.slow
    def test_close_to_bf16_body(self, tiny_model):
        cfg, params, fast16, fast8 = tiny_model
        rng = np.random.default_rng(0)
        feat = jnp.asarray(
            rng.standard_normal((1, 40, 48, 64)).astype(np.float32) * 0.5
        ).astype(jnp.bfloat16)
        ref = np.asarray(
            fused_rrdb.rrdb_body_fast(feat, fast16, interpret=True),
            np.float32)
        got = np.asarray(
            fused_rrdb.rrdb_body_fast(feat, fast8, interpret=True),
            np.float32)
        assert got.shape == ref.shape
        err = np.abs(got - ref)
        scale = np.abs(ref).max() + 1e-3
        # int8 (dynamic act scales + per-row weight scales) through one
        # RRDB: expect ~1% relative error, not bit-exactness
        assert err.max() / scale < 0.06
        assert err.mean() / scale < 0.008

    @pytest.mark.slow
    def test_full_model_int8_psnr_vs_bf16(self, tiny_model):
        cfg, params, fast16, fast8 = tiny_model
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((1, 24, 32, 3), dtype=np.float32))
        y16 = np.asarray(rrdb.apply_fast(
            params, fast16, x.astype(jnp.bfloat16), cfg, interpret=True),
            np.float32)
        y8 = np.asarray(rrdb.apply_fast(
            params, fast8, x.astype(jnp.bfloat16), cfg, interpret=True),
            np.float32)
        mse = float(np.mean((y16 - y8) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 40.0, f"int8-vs-bf16 PSNR too low: {psnr:.1f} dB"
