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
        # output conv is bias-free (official); zero weight => identity
        params["output"]["w"] = jnp.zeros_like(params["output"]["w"])
        x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        y = restormer.apply(params, x, cfg)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    @pytest.mark.slow
    def test_full_model_matches_torch(self, rng):
        """Full-model twin (PARITY.md): random-init official Restormer
        (swz30 CVPR22 restatement, torch_ref.build_restormer) vs our
        forward through port_restormer. This twin caught three real
        divergences on first run: BiasFree_LayerNorm passes the mean
        through (x, not x-mu), F.normalize eps semantics, and exact
        (erf) vs tanh-approximate GELU."""
        torch = pytest.importorskip("torch")

        from framewright_tpu.models import torch_port, torch_ref

        nb, nref, heads = (1, 1, 1, 1), 1, (1, 2, 4, 8)
        tm = torch_ref.build_restormer(dim=8, num_blocks=nb, heads=heads,
                                       num_refinement=nref)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = torch_port.port_restormer(sd, num_blocks=nb,
                                           num_refinement=nref)
        params = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v) if v is not None else None, params,
            is_leaf=lambda v: v is None)
        cfg = restormer.RestormerConfig(dim=8, num_blocks=nb, heads=heads,
                                        num_refinement=nref)
        x = rng.random((1, 16, 24, 3)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))
                      ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(restormer.apply(params, jnp.asarray(x), cfg))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)

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


class TestHdr10Plus:
    def test_collector_scenes_and_json(self):
        import json

        from framewright_tpu.processors.hdr import Hdr10PlusCollector

        col = Hdr10PlusCollector(scene_jump_nits=50.0)
        dim = np.full((8, 8, 3), 10.0, np.float32)
        bright = np.full((8, 8, 3), 400.0, np.float32)
        for _ in range(3):
            col.record(dim)
        for _ in range(2):
            col.record(bright)
        assert col.scenes() == [(0, 3), (3, 5)]
        doc = json.loads(col.to_json())
        assert doc["JSONInfo"]["HDR10plusProfile"] == "B"
        assert len(doc["SceneInfo"]) == 5
        first, last = doc["SceneInfo"][0], doc["SceneInfo"][-1]
        assert first["SceneId"] == 0 and last["SceneId"] == 1
        # 400 nits in 0.00001-nit units
        assert last["LuminanceParameters"]["MaxScl"][0] == 40_000_000
        assert doc["SceneInfoSummary"]["SceneFrameNumbers"] == [3, 2]

    def test_converter_collects_when_hdr10plus(self):
        from framewright_tpu.processors.hdr import HDRConfig, HDRConverter

        conv = HDRConverter(HDRConfig(mode="expand", target="hdr10plus"))
        frame = np.full((8, 8, 3), 200, np.uint8)
        out = conv.expand_frame(frame)
        assert out.shape == frame.shape
        assert conv.collector is not None
        assert len(conv.collector.frames) == 1
        # plain hdr10 does not collect
        conv2 = HDRConverter(HDRConfig(mode="expand", target="hdr10"))
        conv2.expand_frame(frame)
        assert conv2.collector is None

    def test_e2e_sidecar_written(self, tmp_path, monkeypatch):
        import json

        monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
        from framewright_tpu.config import Config
        from framewright_tpu.io.y4m import Y4MWriter
        from framewright_tpu.restorer import VideoRestorer

        rng = np.random.default_rng(0)
        clip = tmp_path / "in.y4m"
        with Y4MWriter(clip, 32, 32, fps=12) as w:
            for _ in range(4):
                w.write_frame(rng.integers(0, 256, (32, 32, 3),
                                           dtype=np.uint8))
        cfg = Config(project_dir=tmp_path / "p", scale_factor=4,
                     sr_model="realesr-animevideov3",
                     compute_dtype="float32", device_platform="cpu",
                     hdr_output="hdr10plus", validate_output=False)
        out = tmp_path / "out.y4m"
        VideoRestorer(cfg).restore_video(clip, out)
        sidecar = tmp_path / "out.y4m.hdr10plus.json"
        assert sidecar.exists()
        doc = json.loads(sidecar.read_text())
        assert len(doc["SceneInfo"]) == 4
