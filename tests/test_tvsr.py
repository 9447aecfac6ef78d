"""TVSR (VRT-class temporal window attention VSR) tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import tvsr


@pytest.fixture(scope="module")
def tiny():
    cfg = tvsr.TVSRConfig(dim=16, heads=2, window=4, depth=2, scale=4)
    params = tvsr.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestTVSR:
    def test_shapes(self, tiny):
        cfg, params = tiny
        x = jnp.asarray(np.random.default_rng(0).random((1, 3, 16, 24, 3),
                                                        dtype=np.float32))
        y = tvsr.apply(params, x, cfg)
        assert y.shape == (1, 3, 64, 96, 3)

    @pytest.mark.slow
    def test_scale2(self):
        cfg = tvsr.TVSRConfig(dim=16, heads=2, window=4, depth=2, scale=2)
        params = tvsr.init(jax.random.PRNGKey(1), cfg)
        x = jnp.zeros((1, 2, 8, 8, 3))
        assert tvsr.apply(params, x, cfg).shape == (1, 2, 16, 16, 3)

    @pytest.mark.slow
    def test_temporal_attention_mixes_frames(self, tiny):
        # zeroing a neighbor frame must change the center frame's output
        cfg, params = tiny
        rng = np.random.default_rng(1)
        x = rng.random((1, 3, 16, 16, 3)).astype(np.float32)
        y1 = np.asarray(tvsr.apply(params, jnp.asarray(x), cfg))
        x2 = x.copy()
        x2[:, 0] = 0.0
        y2 = np.asarray(tvsr.apply(params, jnp.asarray(x2), cfg))
        assert np.abs(y1[:, 1] - y2[:, 1]).max() > 1e-6

    def test_shifted_mask_blocks_cross_region(self):
        m = tvsr._spatial_shift_mask(8, 8, 4, 2, t=2)
        assert m.shape == (4, 32, 32)
        assert float(m.min()) < -1e8 and float(m.max()) == 0.0

    def test_registry_and_processor_route(self):
        from framewright_tpu.models.registry import get_model

        spec = get_model("TVSR_x4")
        assert spec.family == "vsr" and spec.scale == 4

    def test_determinism(self, tiny):
        cfg, params = tiny
        x = jnp.asarray(np.random.default_rng(2).random((1, 2, 8, 8, 3),
                                                        dtype=np.float32))
        a = np.asarray(tvsr.apply(params, x, cfg))
        b = np.asarray(tvsr.apply(params, x, cfg))
        np.testing.assert_array_equal(a, b)
