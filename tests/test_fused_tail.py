"""Fused phase-tail kernel numerics (interpreter mode on CPU).

The kernel computes conv_up2 -> conv_hr -> conv_last entirely at low
resolution via phase decomposition (ops/fused_tail.py); it must match
the plain XLA tail at bf16 rounding level, including frame borders.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb
from framewright_tpu.models.layers import conv2d, lrelu, upsample_nearest
from framewright_tpu.ops import fused_tail


@pytest.fixture(scope="module")
def tail_params():
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 6)
    from framewright_tpu.models.layers import conv_init
    return {
        "conv_up2": conv_init(ks[0], 3, 64, 64, jnp.float32),
        "conv_hr": conv_init(ks[1], 3, 64, 64, jnp.float32),
        "conv_last": conv_init(ks[2], 3, 64, 3, jnp.float32),
    }


def _xla_tail(p, feat_nhwc):
    f = lrelu(conv2d(p["conv_up2"], upsample_nearest(feat_nhwc, 2)))
    return conv2d(p["conv_last"], lrelu(conv2d(p["conv_hr"], f)))


class TestPhaseWeights:
    def test_up2_phase_decomposition_exact(self, tail_params):
        # per-phase 2x2 conv must equal conv-after-nearest-2x
        p = tail_params["conv_up2"]
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 7, 9, 64)).astype(np.float32)
        ref = np.asarray(conv2d(p, upsample_nearest(jnp.asarray(x), 2)))
        w = np.asarray(p["w"], np.float32)
        b = np.asarray(p["b"], np.float32)
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for a in (0, 1):
            for bb in (0, 1):
                W, taps = fused_tail._up2_phase_weights(w, a, bb)
                # check a few positions
                for i, j in [(0, 0), (3, 4), (6, 8)]:
                    pv = np.concatenate([
                        xp[0, 1 + i + dr, 1 + j + dc] for dr, dc in taps])
                    got = W @ pv + b
                    np.testing.assert_allclose(
                        got, ref[0, 2 * i + a, 2 * j + bb], rtol=1e-4,
                        atol=1e-4)


class TestFusedTailNumerics:
    @pytest.mark.parametrize("hw", [(40, 40), (58, 58), (30, 70)])
    @pytest.mark.slow
    def test_matches_xla_tail(self, tail_params, hw):
        h, w = hw
        rng = np.random.default_rng(1)
        feat = rng.standard_normal((1, h, w, 64)).astype(np.float32) * 0.3
        feat16 = jnp.asarray(feat).astype(jnp.bfloat16)
        want = np.asarray(_xla_tail(tail_params, feat16), np.float32)
        wts = fused_tail.tail_phase_weights(
            tail_params["conv_up2"], tail_params["conv_hr"],
            tail_params["conv_last"])
        fcm = feat16.transpose(0, 3, 1, 2)
        got = np.asarray(fused_tail.fused_tail_image(
            fcm, wts, h, w, interpret=True), np.float32)
        assert got.shape == want.shape == (1, 2 * h, 2 * w, 3)
        err = np.abs(got - want)
        scale = np.abs(want).max() + 1e-3
        assert err.max() / scale < 0.03
        assert err.mean() / scale < 0.003

    def test_full_apply_fast_uses_phase_tail(self, tail_params):
        cfg = rrdb.RRDBConfig(num_block=1, scale=4)
        params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        fast = rrdb.make_fast_params(params)
        assert "tail_phase" in fast
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((1, 24, 32, 3), dtype=np.float32))
        ref = np.asarray(rrdb.apply(params, x, cfg), np.float32)
        out = np.asarray(rrdb.apply_fast(
            params, fast, x.astype(jnp.bfloat16), cfg, interpret=True),
            np.float32)
        assert out.shape == ref.shape == (1, 96, 128, 3)
        assert np.abs(out - ref).mean() < 0.02


class TestFusedTail2:
    """Extended tail (conv_up1 folded in; input at body resolution)."""

    @pytest.fixture(scope="class")
    def tail2_params(self):
        from framewright_tpu.models.layers import conv_init

        ks = jax.random.split(jax.random.PRNGKey(11), 4)
        return {
            "conv_up1": conv_init(ks[0], 3, 64, 64, jnp.float32),
            "conv_up2": conv_init(ks[1], 3, 64, 64, jnp.float32),
            "conv_hr": conv_init(ks[2], 3, 64, 64, jnp.float32),
            "conv_last": conv_init(ks[3], 3, 64, 3, jnp.float32),
        }

    @pytest.mark.parametrize("hw", [(24, 24), (37, 53)])
    def test_matches_xla_four_conv_tail(self, tail2_params, hw):
        p = tail2_params
        h, w = hw
        feat1 = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, h, w, 64)) * 0.3,
            jnp.bfloat16)

        def ref(x):
            x = lrelu(conv2d(p["conv_up1"], upsample_nearest(x, 2)))
            x = lrelu(conv2d(p["conv_up2"], upsample_nearest(x, 2)))
            return conv2d(p["conv_last"], lrelu(conv2d(p["conv_hr"], x)))

        want = np.asarray(ref(feat1), np.float32)
        wts = fused_tail.tail2_phase_weights(
            p["conv_up1"], p["conv_up2"], p["conv_hr"], p["conv_last"])
        got = np.asarray(fused_tail.fused_tail2_image(
            feat1.transpose(0, 3, 1, 2), wts, h, w, interpret=True),
            np.float32)
        assert got.shape == (1, 4 * h, 4 * w, 3)
        err = np.abs(want - got)
        scale = np.abs(want).max() + 1e-3
        assert err.max() / scale < 0.02, err.max()

    def test_apply_fast_tail2_matches_apply(self, monkeypatch):
        monkeypatch.setenv("FW_TAIL", "2")
        cfg = rrdb.RRDBConfig(num_block=1, scale=4)
        params = rrdb.init(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
        fast = rrdb.make_fast_params(params)
        assert "tail2_phase" in fast
        x = jnp.asarray(np.random.default_rng(2).random((1, 28, 36, 3)),
                        jnp.bfloat16)
        want = np.asarray(rrdb.apply(params, x, cfg), np.float32)
        got = np.asarray(rrdb.apply_fast(params, fast, x, cfg,
                                         interpret=True), np.float32)
        err = np.abs(want - got)
        assert err.max() < 0.05, err.max()
        assert err.mean() < 0.005, err.mean()
