"""Warp, transposed conv, IFNet, and interpolation processor tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import ifnet
from framewright_tpu.models.layers import conv2d_transpose
from framewright_tpu.ops.warp import flow_warp, grid_sample
from framewright_tpu.processors.interpolation import (
    FrameInterpolator,
    InterpolationConfig,
    interpolation_factor,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


class TestWarp:
    def test_grid_sample_matches_torch(self, rng):
        img = rng.standard_normal((2, 9, 13, 3)).astype(np.float32)
        grid = (rng.random((2, 7, 11, 2)).astype(np.float32) * 2.2 - 1.1)
        ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
        theirs = _nhwc(F.grid_sample(
            _nchw(img), torch.from_numpy(grid), mode="bilinear",
            padding_mode="border", align_corners=True))
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_zero_flow_identity(self, rng):
        img = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
        flow = jnp.zeros((1, 8, 8, 2))
        np.testing.assert_allclose(np.asarray(flow_warp(img, flow)),
                                   np.asarray(img), atol=1e-6)

    def test_integer_shift(self, rng):
        img = jnp.asarray(rng.random((1, 8, 12, 3)).astype(np.float32))
        flow = jnp.full((1, 8, 12, 2), 0.0).at[..., 0].set(2.0)  # sample x+2
        out = np.asarray(flow_warp(img, flow))
        np.testing.assert_allclose(out[0, :, :-2], np.asarray(img)[0, :, 2:], atol=1e-6)


class TestConvTranspose:
    def test_matches_torch_k4s2p1(self, rng):
        cin, cout = 6, 8
        x = rng.standard_normal((2, 5, 7, cin)).astype(np.float32)
        tconv = torch.nn.ConvTranspose2d(cin, cout, 4, 2, 1)
        w = tconv.weight.detach().numpy()      # (in, out, kH, kW)
        b = tconv.bias.detach().numpy()
        p = {"w": jnp.asarray(np.transpose(w, (2, 3, 0, 1))), "b": jnp.asarray(b)}
        ours = np.asarray(conv2d_transpose(p, jnp.asarray(x), stride=2, kernel=4, pad=1))
        with torch.no_grad():
            theirs = _nhwc(tconv(_nchw(x)))
        assert ours.shape == theirs.shape == (2, 10, 14, cout)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestIFNet:
    def test_shapes_and_range(self, rng):
        cfg = ifnet.IFNetConfig(channels=(32, 24), scales=(4, 2), num_res_convs=2)
        params = ifnet.init(jax.random.PRNGKey(0), cfg)
        a = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        b = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        out = ifnet.apply(params, a, b, 0.5, cfg)
        assert out.shape == (1, 32, 32, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    @pytest.mark.slow
    def test_padded_arbitrary_dims(self, rng):
        cfg = ifnet.IFNetConfig(channels=(32, 24), scales=(4, 2), num_res_convs=2)
        params = ifnet.init(jax.random.PRNGKey(0), cfg)
        a = jnp.asarray(rng.random((1, 37, 53, 3)).astype(np.float32))
        b = jnp.asarray(rng.random((1, 37, 53, 3)).astype(np.float32))
        out = ifnet.interpolate_padded(params, a, b, 0.5, cfg)
        assert out.shape == (1, 37, 53, 3)

    def test_identical_inputs_reproduced(self, rng):
        # with img0 == img1, output = warp of the same frame blended:
        # any flow still samples the same static content, so midpoint
        # stays close to the input away from borders
        cfg = ifnet.IFNetConfig(channels=(32, 24), scales=(4, 2), num_res_convs=2)
        params = ifnet.init(jax.random.PRNGKey(0), cfg)
        img = jnp.asarray(np.full((1, 32, 32, 3), 0.5, np.float32))
        out = ifnet.apply(params, img, img, 0.5, cfg)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-2)


class TestFactor:
    def test_factor_logic(self):
        assert interpolation_factor(24, 0) == 2
        assert interpolation_factor(24, 48) == 2
        assert interpolation_factor(18, 25) == 2
        assert interpolation_factor(15, 60) == 4
        assert interpolation_factor(24, 50) == 4
        assert interpolation_factor(30, 25) == 1


class TestInterpolator:
    def _small(self):
        it = FrameInterpolator(InterpolationConfig(
            scene_change_skip=True, batch_pairs=2, target_fps=0.0))
        it.setup(32, 32)
        # shrink the model for test speed
        cfg = ifnet.IFNetConfig(channels=(16,), scales=(2,), num_res_convs=1)
        it._cfg_arch = cfg
        it._params = ifnet.init(jax.random.PRNGKey(0), cfg)

        import jax as _jax

        it._fn = _jax.jit(lambda p, a, b, t: ifnet.interpolate_padded(p, a, b, t, cfg))
        return it

    def test_doubles_frame_count(self, gradient_frame):
        frames = [gradient_frame(32, 32, t) for t in range(6)]
        it = self._small()
        out = list(it.interpolate_to_fps(iter(frames), source_fps=12.0))
        # n frames -> 2n - 1 (no frame after the last)
        assert len(out) == 11
        assert it.result.factor == 2
        np.testing.assert_array_equal(out[0], frames[0])
        np.testing.assert_array_equal(out[2], frames[1])

    @pytest.mark.slow
    def test_scene_cut_duplicates_not_synthesizes(self):
        a = np.full((32, 32, 3), 10, np.uint8)
        b = np.full((32, 32, 3), 240, np.uint8)
        it = self._small()
        out = list(it.interpolate_to_fps(iter([a, a, b, b]), source_fps=12.0))
        assert it.result.scene_skips == 1
        # the inserted frame at the cut equals the left frame
        np.testing.assert_array_equal(out[3], a)

    def test_factor_1_passthrough(self, gradient_frame):
        frames = [gradient_frame(32, 32, t) for t in range(4)]
        it = FrameInterpolator(InterpolationConfig(target_fps=20.0))
        it.setup(32, 32)
        out = list(it.interpolate_to_fps(iter(frames), source_fps=25.0))
        assert len(out) == 4


class TestZerosPaddingWarp:
    def test_matches_torch_grid_sample_zeros(self, rng):
        """flow_warp(padding_mode='zeros') must match torch's
        grid_sample zeros padding exactly, including the partial
        bilinear fade across the boundary (mmediting's propagation
        warp convention)."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        import jax.numpy as jnp

        from framewright_tpu.ops.warp import flow_warp

        img = rng.random((2, 8, 10, 3)).astype(np.float32)
        flow = (rng.random((2, 8, 10, 2)).astype(np.float32) - 0.5) * 6.0

        out_j = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow),
                                     padding_mode="zeros"))

        t_img = torch.as_tensor(img.transpose(0, 3, 1, 2))
        h, w = 8, 10
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        fx = xs[None] + flow[..., 0]
        fy = ys[None] + flow[..., 1]
        gx = 2 * fx / (w - 1) - 1
        gy = 2 * fy / (h - 1) - 1
        grid = torch.as_tensor(np.stack([gx, gy], axis=-1))
        out_t = F.grid_sample(t_img, grid, mode="bilinear",
                              padding_mode="zeros", align_corners=True)
        out_t = out_t.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(out_j, out_t, atol=1e-5)


@pytest.mark.slow
class TestIFNetTorchParity:
    def test_full_net_matches_torch_reference(self):
        """Shared random weights into the RIFE v4.6-structure torch
        re-statement and the JAX IFNet: interpolated frames must match
        (validates the pyramid resizes, flow rescaling, warp, residual
        skip and the ConvTranspose+PixelShuffle head)."""
        torch = pytest.importorskip("torch")
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import ifnet, torch_ref

        arch = ifnet.IFNetConfig(channels=(64, 48), scales=(4, 2),
                                 num_res_convs=3)
        params = ifnet.init(jax.random.PRNGKey(0), arch)
        tm = torch_ref.build_ifnet(channels=arch.channels,
                                   scales=arch.scales,
                                   num_res_convs=arch.num_res_convs)

        sd = {}
        for b, blk in enumerate(params["blocks"]):
            for j, p in enumerate(blk["conv0"]):
                sd[f"blocks.{b}.conv0.{j}.0.weight"] = np.transpose(
                    np.asarray(p["w"]), (3, 2, 0, 1))
                sd[f"blocks.{b}.conv0.{j}.0.bias"] = np.asarray(p["b"])
                sd[f"blocks.{b}.conv0.{j}.1.weight"] = np.asarray(p["alpha"])
            for i, p in enumerate(blk["convblock"]):
                sd[f"blocks.{b}.convblock.{i}.0.weight"] = np.transpose(
                    np.asarray(p["w"]), (3, 2, 0, 1))
                sd[f"blocks.{b}.convblock.{i}.0.bias"] = np.asarray(p["b"])
                sd[f"blocks.{b}.convblock.{i}.1.weight"] = np.asarray(
                    p["alpha"])
            # ConvTranspose2d weight is (in, out, kH, kW); ours is HWIO
            sd[f"blocks.{b}.lastconv.0.weight"] = np.transpose(
                np.asarray(blk["head"]["w"]), (2, 3, 0, 1))
            sd[f"blocks.{b}.lastconv.0.bias"] = np.asarray(blk["head"]["b"])
        missing, unexpected = tm.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
        assert not missing and not unexpected, (missing[:3], unexpected[:3])
        tm.eval()

        r = np.random.default_rng(0)
        img0 = r.random((1, 32, 32, 3), dtype=np.float32)
        img1 = np.roll(img0, 2, axis=2)
        with torch.no_grad():
            yt = tm(torch.as_tensor(img0.transpose(0, 3, 1, 2)),
                    torch.as_tensor(img1.transpose(0, 3, 1, 2)), 0.5)
        y_torch = yt.numpy().transpose(0, 2, 3, 1)
        y_jax = np.asarray(ifnet.apply(params, jnp.asarray(img0),
                                       jnp.asarray(img1), 0.5, arch))
        err = np.abs(y_jax - y_torch).max()
        assert err < 1e-3, f"max abs err {err:.5f}"
