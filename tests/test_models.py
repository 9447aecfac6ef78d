"""Model zoo tests: architecture shapes, scan-vs-unrolled equivalence,
and bit-level parity against a torch implementation of the official
architectures (the weight-port correctness proof: if random weights
match to ~1e-5, released .pth weights will produce PSNR-parity output).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb, srvgg
from framewright_tpu.models.layers import (
    count_params,
    pixel_shuffle,
    pixel_unshuffle,
    resize_bilinear,
    upsample_nearest,
)
from framewright_tpu.models.registry import get_model, init_model
from framewright_tpu.models import torch_port

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# Torch reference architectures live in models/torch_ref.py (also
# used by `framewright models verify` for real-checkpoint parity)
from framewright_tpu.models.torch_ref import (  # noqa: E402
    build_rrdbnet,
    build_srvgg,
)


def TorchRRDBNet(scale=4, nb=23):
    return build_rrdbnet(scale=scale, nb=nb)


def TorchSRVGG(num_conv=4, upscale=4):
    return build_srvgg(num_conv=num_conv, upscale=upscale)


def _torch_pixel_unshuffle(x, scale):
    b, c, hh, hw = x.size()
    h, w = hh // scale, hw // scale
    x_view = x.view(b, c, h, scale, w, scale)
    return x_view.permute(0, 1, 3, 5, 2, 4).reshape(b, c * scale * scale, h, w)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _nhwc(t_nchw):
    return np.transpose(t_nchw.detach().numpy(), (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Layer tests
# ---------------------------------------------------------------------------

class TestLayers:
    def test_pixel_shuffle_matches_torch(self, rng):
        x = rng.standard_normal((2, 4, 6, 12), dtype=np.float32)
        ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
        theirs = _nhwc(F.pixel_shuffle(_nchw(x), 2))
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_pixel_unshuffle_matches_torch(self, rng):
        x = rng.standard_normal((2, 8, 12, 3), dtype=np.float32)
        ours = np.asarray(pixel_unshuffle(jnp.asarray(x), 2))
        theirs = _nhwc(_torch_pixel_unshuffle(_nchw(x), 2))
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_shuffle_unshuffle_inverse(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
        np.testing.assert_allclose(
            np.asarray(pixel_shuffle(pixel_unshuffle(x, 2), 2)), np.asarray(x)
        )

    def test_upsample_nearest_matches_torch(self, rng):
        x = rng.standard_normal((1, 5, 7, 3), dtype=np.float32)
        ours = np.asarray(upsample_nearest(jnp.asarray(x), 2))
        theirs = _nhwc(F.interpolate(_nchw(x), scale_factor=2, mode="nearest"))
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_bilinear_matches_torch_half_pixel(self, rng):
        x = rng.standard_normal((1, 8, 8, 3), dtype=np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), (16, 16)))
        theirs = _nhwc(F.interpolate(_nchw(x), size=(16, 16), mode="bilinear",
                                     align_corners=False))
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


# ---------------------------------------------------------------------------
# RRDB parity
# ---------------------------------------------------------------------------

class TestRRDBParity:
    @pytest.mark.parametrize("scale,hw", [(4, (12, 16)), (2, (16, 12)), (1, (16, 16))])
    def test_forward_matches_torch(self, scale, hw, rng):
        nb = 2
        tmodel = TorchRRDBNet(scale=scale, nb=nb).eval()
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        params = torch_port.port_rrdb(sd, num_block=nb)

        cfg = rrdb.RRDBConfig(num_block=nb, scale=scale)
        x = rng.random((1, *hw, 3), dtype=np.float32)
        with torch.no_grad():
            want = _nhwc(tmodel(_nchw(x)))
        got = np.asarray(rrdb.apply(
            jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x), cfg))
        assert got.shape == (1, hw[0] * scale, hw[1] * scale, 3)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_param_count_x4plus(self):
        spec = get_model("RealESRGAN_x4plus")
        params = spec.init(jax.random.PRNGKey(0))
        # published RRDBNet x4 (23 blocks) parameter count
        assert count_params(params) == 16_697_987

    def test_stacked_body_matches_list_body(self, rng):
        cfg = rrdb.RRDBConfig(num_block=3, scale=4)
        params = rrdb.init(jax.random.PRNGKey(1), cfg)
        x = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
        out_list = rrdb.apply(params, x, cfg)
        out_stacked = rrdb.apply(rrdb.stack_body(params), x, cfg)
        np.testing.assert_allclose(np.asarray(out_list), np.asarray(out_stacked),
                                   atol=1e-6)


class TestSRVGGParity:
    def test_forward_matches_torch(self, rng):
        nc = 3
        tmodel = TorchSRVGG(num_conv=nc, upscale=4).eval()
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        params = torch_port.port_srvgg(sd, num_conv=nc)
        cfg = srvgg.SRVGGConfig(num_conv=nc, scale=4)
        x = rng.random((2, 10, 14, 3), dtype=np.float32)
        with torch.no_grad():
            want = _nhwc(tmodel(_nchw(x)))
        got = np.asarray(srvgg.apply(
            jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x), cfg))
        assert got.shape == (2, 40, 56, 3)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_infer_num_conv(self):
        tmodel = TorchSRVGG(num_conv=5)
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        assert torch_port.infer_srvgg_convs(sd) == 5


class TestRegistry:
    def test_all_specs_have_arch(self):
        from framewright_tpu.models.registry import MODEL_SPECS

        for spec in MODEL_SPECS.values():
            assert spec.apply_fn is not None and spec.init_fn is not None

    def test_random_init_fallback(self, tmp_path):
        spec, params = init_model("realesr-animevideov3", weights_dir=tmp_path)
        assert spec.scale == 4
        x = jnp.zeros((1, 8, 8, 3), jnp.float32)
        out = spec.apply_fn(params, x, spec.arch_config)
        assert out.shape == (1, 32, 32, 3)

    def test_missing_weights_strict(self, tmp_path):
        from framewright_tpu.errors import ModelError

        with pytest.raises(ModelError):
            init_model("RealESRGAN_x2plus", weights_dir=tmp_path, allow_random=False)

    def test_npz_roundtrip(self, tmp_path, rng):
        cfg = rrdb.RRDBConfig(num_block=1, scale=4)
        params = rrdb.init(jax.random.PRNGKey(0), cfg)
        torch_port.export_npz(params, tmp_path / "m.npz")
        back = torch_port.import_npz(tmp_path / "m.npz")
        x = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
        a = rrdb.apply(params, x, cfg)
        b = rrdb.apply(jax.tree_util.tree_map(jnp.asarray, back), x, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_pth_port_path(self, tmp_path):
        # save a tiny torch checkpoint and load through init_model
        tmodel = TorchSRVGG(num_conv=16, upscale=4)
        torch.save({"params": tmodel.state_dict()}, tmp_path / "realesr-animevideov3.pth")
        spec, params = init_model("realesr-animevideov3", weights_dir=tmp_path,
                                  allow_random=False)
        assert (tmp_path / "realesr-animevideov3.npz").exists()  # cached port
        assert len(params["body"]) == 17


class TestNpzNoneLeaves:
    def test_none_leaves_roundtrip(self, tmp_path):
        """Optional pytree leaves (skip=None) must survive the npz
        cache: np.savez would silently pickle them as object arrays
        that np.load(allow_pickle=False) then refuses — poisoning the
        seeded-init cache on the SECOND run (regression)."""
        import numpy as np

        tree = {"a": {"skip": None, "w": np.ones((2, 2), np.float32)},
                "b": [None, np.zeros(3, np.float32)]}
        p = tmp_path / "t.npz"
        torch_port.export_npz(tree, p)
        back = torch_port.import_npz(p)
        assert back["a"]["skip"] is None
        assert back["b"][0] is None
        np.testing.assert_array_equal(back["a"]["w"], tree["a"]["w"])

    def test_stale_object_cache_regenerates(self, tmp_path, monkeypatch):
        """A pre-fix cache file with object arrays is deleted and the
        init regenerated instead of crashing."""
        import numpy as np

        from framewright_tpu.models.registry import init_model

        monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path))
        bad = tmp_path / "DiffusionSR_x4.rand0.npz"
        np.savez(bad, **{"mid.skip": np.asarray(None, dtype=object)})
        spec, params = init_model("DiffusionSR_x4",
                                  weights_dir=str(tmp_path))
        assert params is not None
