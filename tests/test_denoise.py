"""NAFNet + temporal denoise tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import nafnet
from framewright_tpu.processors.temporal_denoise import (
    FlickerReducer,
    TemporalDenoiseConfig,
    TemporalDenoiser,
)


def _tiny_cfg():
    return nafnet.NAFNetConfig(width=8, enc_blocks=(1, 1), middle_blocks=1,
                               dec_blocks=(1, 1))


class TestNAFNet:
    def test_shapes(self, rng):
        cfg = _tiny_cfg()
        params = nafnet.init(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        y = nafnet.apply(params, x, cfg)
        assert y.shape == x.shape

    def test_padded_arbitrary_dims(self, rng):
        cfg = _tiny_cfg()
        params = nafnet.init(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.random((1, 13, 21, 3)).astype(np.float32))
        y = nafnet.apply_padded(params, x, cfg)
        assert y.shape == (1, 13, 21, 3)

    def test_global_residual_wiring(self, rng):
        # zero the ending conv => the network must be an exact identity
        # (output = input + ending(...) with ending == 0)
        cfg = _tiny_cfg()
        params = nafnet.init(jax.random.PRNGKey(0), cfg)
        params["ending"]["w"] = jnp.zeros_like(params["ending"]["w"])
        params["ending"]["b"] = jnp.zeros_like(params["ending"]["b"])
        x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        y = nafnet.apply(params, x, cfg)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_matches_torch_block(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn as nn
        import torch.nn.functional as F

        c = 8

        class TorchNAF(nn.Module):
            """Official NAFBlock (ECCV22) for parity checking."""

            def __init__(self, c):
                super().__init__()
                dw = 2 * c
                ffn = 2 * c
                self.norm1 = nn.LayerNorm(c)
                self.conv1 = nn.Conv2d(c, dw, 1)
                self.conv2 = nn.Conv2d(dw, dw, 3, padding=1, groups=dw)
                self.conv3 = nn.Conv2d(dw // 2, c, 1)
                self.sca = nn.Conv2d(dw // 2, dw // 2, 1)
                self.norm2 = nn.LayerNorm(c)
                self.conv4 = nn.Conv2d(c, ffn, 1)
                self.conv5 = nn.Conv2d(ffn // 2, c, 1)
                self.beta = nn.Parameter(torch.randn(1, c, 1, 1) * 0.1)
                self.gamma = nn.Parameter(torch.randn(1, c, 1, 1) * 0.1)

            def forward(self, x):
                def ln(norm, t):
                    return norm(t.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

                def sg(t):
                    a, b = t.chunk(2, dim=1)
                    return a * b

                y = ln(self.norm1, x)
                y = self.conv2(self.conv1(y))
                y = sg(y)
                y = y * self.sca(F.adaptive_avg_pool2d(y, 1))
                y = self.conv3(y)
                x = x + y * self.beta
                y = ln(self.norm2, x)
                y = sg(self.conv4(y))
                y = self.conv5(y)
                return x + y * self.gamma

        tblk = TorchNAF(c).eval()
        sd = {k: v.detach().numpy() for k, v in tblk.state_dict().items()}

        def cv(name):
            return {"w": jnp.asarray(np.transpose(sd[name + ".weight"], (2, 3, 1, 0))),
                    "b": jnp.asarray(sd[name + ".bias"])}

        p = {
            "norm1": {"gamma": jnp.asarray(sd["norm1.weight"]),
                      "beta": jnp.asarray(sd["norm1.bias"])},
            "conv1": cv("conv1"), "conv2": cv("conv2"), "conv3": cv("conv3"),
            "sca": cv("sca"),
            "norm2": {"gamma": jnp.asarray(sd["norm2.weight"]),
                      "beta": jnp.asarray(sd["norm2.bias"])},
            "conv4": cv("conv4"), "conv5": cv("conv5"),
            "beta": jnp.asarray(np.transpose(sd["beta"], (0, 2, 3, 1))),
            "gamma": jnp.asarray(np.transpose(sd["gamma"], (0, 2, 3, 1))),
        }
        x = rng.standard_normal((1, 6, 7, c)).astype(np.float32)
        with torch.no_grad():
            want = tblk(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(nafnet._naf_block(p, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    @pytest.mark.slow
    def test_full_model_matches_torch(self, rng):
        """Full-model twin (PARITY.md): random-init official NAFNet vs
        our forward through port_nafnet — covers intro/downs/ups/skip
        wiring and the global residual, not just one block. Uses the
        FW_nafnet_dn arch dims (the family we ship trained weights
        for)."""
        torch = pytest.importorskip("torch")

        from framewright_tpu.models import torch_port, torch_ref

        enc, mid, dec = (1, 1, 2), 2, (1, 1, 1)
        tm = torch_ref.build_nafnet(width=16, enc_blocks=enc,
                                    middle_blocks=mid, dec_blocks=dec)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = torch_port.port_nafnet(sd, enc_blocks=enc,
                                        middle_blocks=mid, dec_blocks=dec)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        cfg = nafnet.NAFNetConfig(width=16, enc_blocks=enc,
                                  middle_blocks=mid, dec_blocks=dec)
        x = rng.random((2, 16, 24, 3)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))
                      ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(nafnet.apply(params, jnp.asarray(x), cfg))
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


class TestTemporalDenoiser:
    def _noisy_static_clip(self, rng, n=9):
        base = (rng.random((32, 32, 3)) * 200 + 20).astype(np.float32)
        return base, [
            np.clip(base + rng.normal(0, 20, base.shape), 0, 255).astype(np.uint8)
            for _ in range(n)
        ]

    def test_temporal_averaging_reduces_noise(self, rng):
        base, frames = self._noisy_static_clip(rng)
        # flow_align off: random flow weights would misalign the static
        # scene; trained weights make aligned mode strictly better
        dn = TemporalDenoiser(TemporalDenoiseConfig(
            radius=3, strength=1.0, method="temporal", flow_align=False,
            scene_change_threshold=9.9,  # disable scene reset for static noise
        ))
        dn.setup(32, 32)
        out = list(dn.denoise_stream(iter(frames)))
        assert len(out) == len(frames)
        mid = len(frames) // 2
        err_before = np.abs(frames[mid].astype(np.float32) - base).mean()
        err_after = np.abs(out[mid].astype(np.float32) - base).mean()
        assert err_after < err_before * 0.6  # substantial noise reduction

    def test_frame_count_preserved_with_scene_cut(self, rng):
        a = [np.full((32, 32, 3), 30, np.uint8)] * 5
        b = [np.full((32, 32, 3), 220, np.uint8)] * 5
        dn = TemporalDenoiser(TemporalDenoiseConfig(radius=2, method="temporal"))
        dn.setup(32, 32)
        out = list(dn.denoise_stream(iter(a + b)))
        assert len(out) == 10
        assert dn.result.scene_resets == 1
        # frames near the cut must not bleed across it
        assert abs(int(out[4].mean()) - 30) < 5
        assert abs(int(out[5].mean()) - 220) < 5

    def test_strength_zero_is_identity(self, rng):
        frames = [(rng.random((16, 16, 3)) * 255).astype(np.uint8) for _ in range(5)]
        dn = TemporalDenoiser(TemporalDenoiseConfig(radius=1, strength=0.0,
                                                    method="temporal",
                                                    scene_change_threshold=9.9))
        dn.setup(16, 16)
        out = list(dn.denoise_stream(iter(frames)))
        for a, b in zip(out, frames):
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    def test_nafnet_method_runs(self, rng):
        frames = [(rng.random((16, 16, 3)) * 255).astype(np.uint8) for _ in range(4)]
        dn = TemporalDenoiser(TemporalDenoiseConfig(radius=1, method="nafnet",
                                                    scene_change_threshold=9.9))
        dn.setup(16, 16)
        out = list(dn.denoise_stream(iter(frames)))
        assert len(out) == 4
        assert out[0].shape == (16, 16, 3)


class TestFlickerReducer:
    def test_flattens_luma_oscillation(self):
        base = np.full((16, 16, 3), 100, np.float32)
        frames = [
            np.clip(base * (1.0 + 0.3 * (-1) ** t), 0, 255).astype(np.uint8)
            for t in range(12)
        ]
        fr = FlickerReducer(window=9, strength=1.0)
        out = list(fr.reduce_stream(iter(frames)))
        assert len(out) == 12
        means = [f.mean() for f in out[2:-2]]
        in_means = [f.mean() for f in frames[2:-2]]
        assert np.std(means) < np.std(in_means) * 0.4

    def test_static_unchanged(self, gradient_frame):
        frames = [gradient_frame(16, 16, 0)] * 8
        fr = FlickerReducer()
        out = list(fr.reduce_stream(iter(frames)))
        assert len(out) == 8
        np.testing.assert_allclose(out[3].astype(int), frames[3].astype(int), atol=2)

    def test_restormer_method_runs(self, rng):
        frames = [(rng.random((16, 16, 3)) * 255).astype(np.uint8) for _ in range(3)]
        dn = TemporalDenoiser(TemporalDenoiseConfig(radius=1, method="restormer",
                                                    scene_change_threshold=9.9))
        dn.setup(16, 16)
        out = list(dn.denoise_stream(iter(frames)))
        assert len(out) == 3
