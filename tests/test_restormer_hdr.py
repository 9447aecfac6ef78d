"""Restormer model + HDR conversion tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import restormer
from framewright_tpu.processors.hdr import (
    HDRConfig,
    HDRConverter,
    hable_tonemap,
    linear_to_srgb,
    pq_decode,
    pq_encode,
    srgb_to_linear,
)


class TestRestormer:
    def _tiny(self):
        return restormer.RestormerConfig(dim=8, num_blocks=(1, 1, 1, 1),
                                         num_refinement=1, heads=(1, 2, 4, 8))

    def test_shapes(self, rng):
        cfg = self._tiny()
        params = restormer.init(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        y = restormer.apply(params, x, cfg)
        assert y.shape == x.shape

    def test_padded(self, rng):
        cfg = self._tiny()
        params = restormer.init(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.random((1, 11, 19, 3)).astype(np.float32))
        y = restormer.apply_padded(params, x, cfg)
        assert y.shape == (1, 11, 19, 3)

    def test_residual_wiring(self, rng):
        cfg = self._tiny()
        params = restormer.init(jax.random.PRNGKey(0), cfg)
        params["output"]["w"] = jnp.zeros_like(params["output"]["w"])
        params["output"]["b"] = jnp.zeros_like(params["output"]["b"])
        x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        y = restormer.apply(params, x, cfg)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_channel_attention_is_pixel_linear(self, rng):
        # MDTA's cost signature: doubling pixels must not change the
        # attention matrix size — check it handles non-square inputs
        cfg = self._tiny()
        params = restormer.init(jax.random.PRNGKey(0), cfg)
        for hw in [(8, 16), (16, 8)]:
            x = jnp.asarray(rng.random((1, *hw, 3)).astype(np.float32))
            assert restormer.apply(params, x, cfg).shape == (1, *hw, 3)


class TestHDR:
    def test_pq_roundtrip(self):
        nits = np.array([0.0, 1.0, 100.0, 1000.0, 10000.0])
        sig = pq_encode(nits)
        back = pq_decode(sig)
        np.testing.assert_allclose(back, nits, rtol=1e-3, atol=1e-2)
        assert np.all(np.diff(sig) > 0)  # monotone

    def test_srgb_roundtrip(self):
        x = np.linspace(0, 1, 64)
        np.testing.assert_allclose(linear_to_srgb(srgb_to_linear(x)), x, atol=1e-5)

    def test_hable_maps_to_unit(self):
        x = np.array([0.0, 0.5, 1.0, 4.0, 11.2])
        y = hable_tonemap(x)
        assert y[0] >= 0 and abs(y[-1] - 1.0) < 1e-6
        assert np.all(np.diff(y) > 0)

    def test_expand_preserves_black_and_boosts_highlights(self, rng):
        conv = HDRConverter(HDRConfig(mode="expand", peak_nits=1000))
        frame = np.zeros((8, 8, 3), np.uint8)
        frame[:4] = 240  # bright region
        out = conv.expand_frame(frame)
        assert out[4:].max() <= 5          # black stays black in PQ
        assert out[:4].mean() > 100        # highlights land mid-PQ

    def test_tonemap_runs_and_bounds(self, rng):
        conv = HDRConverter(HDRConfig(mode="tonemap"))
        frame = rng.integers(0, 256, (8, 8, 3), np.uint8)
        out = conv.tonemap_frame(frame)
        assert out.dtype == np.uint8

    def test_stream(self, rng):
        conv = HDRConverter(HDRConfig(mode="expand"))
        frames = [rng.integers(0, 256, (8, 8, 3), np.uint8) for _ in range(3)]
        assert len(list(conv.process_stream(iter(frames)))) == 3
