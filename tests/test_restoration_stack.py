"""LaMa inpainting, faces, colorization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import lama
from framewright_tpu.processors.colorize import Colorizer, ColorizeConfig, rgb_to_ycbcr
from framewright_tpu.processors.faces import FaceDetector, FaceRestoreConfig, FaceRestorer
from framewright_tpu.processors.inpaint import (
    InpaintConfig,
    SubtitleRemover,
    WatermarkRemover,
)


class TestLamaModel:
    def _tiny(self):
        return lama.LamaConfig(ngf=8, n_down=2, n_blocks=2)

    def test_shapes(self, rng):
        cfg = self._tiny()
        params = lama.init(jax.random.PRNGKey(0), cfg)
        img = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        mask = jnp.zeros((1, 16, 16, 1))
        out = lama.apply(params, img, mask, cfg)
        assert out.shape == (1, 16, 16, 3)

    @pytest.mark.slow
    def test_full_model_matches_torch(self, rng):
        """Full-model twin (PARITY.md): random-init official LaMa
        FFCResNetGenerator (torch_ref.build_lama) vs our forward
        through port_lama — covers the FourierUnit channel-interleave
        permutation, the last-downsample FFC transition concat, the
        ConvTranspose upsamples, and the reflect-padded head/tail."""
        torch = pytest.importorskip("torch")

        from framewright_tpu.models import torch_port, torch_ref

        ngf, nd, nb = 8, 2, 2
        tm = torch_ref.build_lama(ngf=ngf, n_down=nd, n_blocks=nb,
                                  ratio=0.5)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = torch_port.port_lama(sd, ngf=ngf, n_down=nd, n_blocks=nb,
                                      ratio=0.5)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        cfg = lama.LamaConfig(ngf=ngf, n_down=nd, n_blocks=nb)
        img = rng.random((1, 16, 24, 3)).astype(np.float32)
        mask = np.zeros((1, 16, 24, 1), np.float32)
        mask[0, 4:10, 6:16] = 1.0
        x = np.concatenate([img * (1 - mask), mask], axis=-1)
        with torch.no_grad():
            raw = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))
                     ).numpy().transpose(0, 2, 3, 1)
        want = img * (1 - mask) + raw * mask      # our apply composites
        got = np.asarray(lama.apply(params, jnp.asarray(img),
                                    jnp.asarray(mask), cfg))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)

    def test_unmasked_pixels_passthrough(self, rng):
        cfg = self._tiny()
        params = lama.init(jax.random.PRNGKey(0), cfg)
        img = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        mask = np.zeros((1, 16, 16, 1), np.float32)
        mask[0, 4:8, 4:8] = 1.0
        out = np.asarray(lama.apply(params, img, jnp.asarray(mask), cfg))
        outside = np.abs(out - np.asarray(img)) * (1 - mask)
        assert outside.max() < 1e-6  # composited through the mask

    def test_padded_arbitrary_dims(self, rng):
        cfg = self._tiny()
        params = lama.init(jax.random.PRNGKey(0), cfg)
        img = jnp.asarray(rng.random((1, 13, 19, 3)).astype(np.float32))
        mask = jnp.zeros((1, 13, 19, 1))
        out = lama.apply_padded(params, img, mask, cfg)
        assert out.shape == (1, 13, 19, 3)

    def test_fourier_unit_roundtrip_identity(self, rng):
        # with an identity-initialized spectral conv the FourierUnit
        # must reproduce relu(BN(x)) pathways consistently; here we just
        # check FFT/iFFT wiring: zero conv -> zero output
        c = 4
        p = lama._fourier_unit_init(jax.random.PRNGKey(0), c)
        p["conv"]["w"] = jnp.zeros_like(p["conv"]["w"])
        p["conv"]["b"] = jnp.zeros_like(p["conv"]["b"])
        x = jnp.asarray(rng.random((1, 8, 8, c)).astype(np.float32))
        out = lama._fourier_unit(p, x)
        assert float(jnp.abs(out).max()) < 1e-5


class TestWatermarkRemoval:
    def _clip_with_logo(self, rng, n=12):
        frames = []
        for t in range(n):
            base = rng.random((48, 64)) * 180 + 40
            f = np.stack([np.roll(base, t * 3, axis=1)] * 3, -1)
            # static high-contrast logo block
            f[4:12, 50:62] = 255
            f[5:11, 51:61] = 20
            frames.append(f.astype(np.uint8))
        return frames

    def test_auto_detect_finds_static_logo(self, rng):
        frames = self._clip_with_logo(rng)
        wr = WatermarkRemover(InpaintConfig(method="diffusion", detect_frames=10))
        mask = wr.detect_mask(frames)
        assert mask[5:10, 52:60].mean() > 0.5   # logo covered
        assert mask[30:].mean() < 0.1  # content not covered

    def test_stream_removes_logo(self, rng):
        frames = self._clip_with_logo(rng)
        wr = WatermarkRemover(InpaintConfig(method="diffusion", detect_frames=10))
        out = list(wr.process_stream(iter(frames)))
        assert len(out) == len(frames)
        # the hard logo edges should be gone (filled from surroundings)
        logo_region = out[5][5:11, 51:61].astype(np.float32)
        assert logo_region.std() < 45
        assert abs(logo_region.mean() - 20) > 25  # no longer the dark box

    def test_custom_mask(self, rng):
        frames = [(rng.random((32, 32, 3)) * 255).astype(np.uint8) for _ in range(4)]
        wr = WatermarkRemover(InpaintConfig(
            method="diffusion", auto_detect=False,
            custom_masks=[(8, 8, 16, 16)], detect_frames=2))
        out = list(wr.process_stream(iter(frames)))
        assert len(out) == 4

    def test_lama_method_runs(self, rng):
        frames = [(rng.random((24, 24, 3)) * 255).astype(np.uint8) for _ in range(4)]
        wr = WatermarkRemover(InpaintConfig(
            method="lama", auto_detect=False,
            custom_masks=[(4, 4, 12, 12)], detect_frames=2))
        out = list(wr.process_stream(iter(frames)))
        assert len(out) == 4

    def test_subtitle_band_restriction(self, rng):
        sr = SubtitleRemover(InpaintConfig(method="diffusion"))
        assert sr.config.subtitle_band


class TestFaces:
    def _frame_with_face(self, rng):
        f = np.zeros((96, 96, 3), np.uint8)
        f[...] = (40, 90, 40)  # green background (non-skin)
        # skin-colored ellipse-ish block
        f[20:60, 30:60] = (205, 140, 115)
        return f

    def test_detector_finds_skin_region(self, rng):
        boxes = FaceDetector().detect(self._frame_with_face(rng))
        assert len(boxes) == 1
        b = boxes[0]
        assert 25 <= b.x0 <= 32 and 15 <= b.y0 <= 22

    def test_no_faces_in_gray(self, rng):
        g = np.stack([(rng.random((64, 64)) * 255)] * 3, -1).astype(np.uint8)
        assert FaceDetector().detect(g) == []

    def test_restore_frame_changes_face_only(self, rng, tmp_path):
        frame = self._frame_with_face(rng)
        fr = FaceRestorer(FaceRestoreConfig(
            sr_model="realesr-animevideov3", crop_size=32,
            weights_dir=str(tmp_path)))
        fr.setup(96, 96)
        out = fr.restore_frame(frame)
        assert fr.result.faces_restored == 1
        # background untouched
        np.testing.assert_array_equal(out[80:, 80:], frame[80:, 80:])


class TestColorize:
    def test_palette_colorizes_bw(self, rng):
        gray = np.stack([(rng.random((32, 48)) * 255)] * 3, -1).astype(np.uint8)
        col = Colorizer(ColorizeConfig(saturation=0.7))
        col.setup(32, 48)
        out = col._colorize_keyframe(gray)
        _, cb, cr = rgb_to_ycbcr(out.astype(np.float32))
        sat = np.abs(cb - 128).mean() + np.abs(cr - 128).mean()
        assert sat > 3.0  # chroma actually added
        # luma preserved
        y_in, _, _ = rgb_to_ycbcr(gray.astype(np.float32))
        y_out, _, _ = rgb_to_ycbcr(out.astype(np.float32))
        assert np.abs(y_in - y_out).mean() < 3.0

    def test_stream_propagates_and_keyframes(self, rng):
        base = rng.random((32, 48)) * 255
        frames = [np.stack([np.roll(base, t, axis=1)] * 3, -1).astype(np.uint8)
                  for t in range(8)]
        col = Colorizer(ColorizeConfig(keyframe_interval=4))
        out = list(col.colorize_stream(iter(frames)))
        assert len(out) == 8
        for f in out:
            _, cb, cr = rgb_to_ycbcr(f.astype(np.float32))
            assert np.abs(cb - 128).mean() + np.abs(cr - 128).mean() > 1.0

    def test_exemplar_transfer(self, rng):
        ref = np.zeros((32, 32, 3), np.uint8)
        ref[:16] = (200, 60, 40)    # bright red region
        ref[16:] = (10, 30, 90)     # dark blue region
        gray_vals = np.zeros((32, 32), np.float32)
        gray_vals[:16] = 180
        gray_vals[16:] = 30
        gray = np.stack([gray_vals] * 3, -1).astype(np.uint8)
        col = Colorizer(ColorizeConfig(method="exemplar", reference_image=ref,
                                       saturation=0.5))
        col.setup(32, 32)
        out = col._colorize_keyframe(gray).astype(np.float32)
        # bright area should lean red, dark area lean blue
        assert out[:16, :, 0].mean() > out[:16, :, 2].mean()
        assert out[16:, :, 2].mean() > out[16:, :, 0].mean()


class TestGFPGAN:
    def test_tiny_model_shapes(self, rng):
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import gfpgan

        cfg = gfpgan.GFPGANConfig(out_size=64, num_style_feat=64,
                                  channel_multiplier=1, num_mlp=2, narrow=0.25)
        params = gfpgan.init(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32) * 2 - 1)
        y = gfpgan.apply(params, x, cfg)
        assert y.shape == (2, 64, 64, 3)
        assert bool(jnp.isfinite(y).all())

    def test_gfpgan_backend_in_face_restorer(self, rng, tmp_path):
        frame = np.zeros((96, 96, 3), np.uint8)
        frame[...] = (40, 90, 40)
        frame[20:60, 30:60] = (205, 140, 115)
        fr = FaceRestorer(FaceRestoreConfig(
            backend="gfpgan", weights_dir=str(tmp_path), strength=0.5))
        fr.setup(96, 96)
        out = fr.restore_frame(frame)
        assert fr.result.faces_restored == 1
        assert out.shape == frame.shape
        np.testing.assert_array_equal(out[80:, 80:], frame[80:, 80:])

    def test_port_roundtrip_structure(self, rng):
        # init -> export -> import keeps the tree consumable by apply
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import gfpgan, torch_port

        cfg = gfpgan.GFPGANConfig(out_size=32, num_style_feat=32,
                                  channel_multiplier=1, num_mlp=2, narrow=0.25)
        params = gfpgan.init(jax.random.PRNGKey(0), cfg)
        import tempfile
        from pathlib import Path

        with tempfile.TemporaryDirectory() as d:
            torch_port.export_npz(params, Path(d) / "g.npz")
            back = torch_port.import_npz(Path(d) / "g.npz")
        x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        a = gfpgan.apply(params, x, cfg)
        b = gfpgan.apply(jax.tree_util.tree_map(jnp.asarray, back), x, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestECCV16:
    def test_net_shapes_and_range(self, rng):
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import colorizer_net as cn

        cfg = cn.ECCV16Config(width_mult=0.125)
        params = cn.init(jax.random.PRNGKey(0), cfg)
        l = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32) * 100)
        ab = cn.apply(params, l, cfg)
        assert ab.shape == (1, 64, 64, 2)
        assert float(jnp.abs(ab).max()) <= 110.0 + 1e-3

    def test_lab_roundtrip(self, rng):
        import jax.numpy as jnp

        from framewright_tpu.models import colorizer_net as cn

        rgb = jnp.asarray(rng.random((4, 4, 3)).astype(np.float32))
        back = cn.lab_to_rgb(cn.rgb_to_lab(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=2e-3)

    def test_ddcolor_net_shapes_and_range(self, rng):
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import ddcolor as dd

        cfg = dd.DDColorConfig(dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                               num_queries=16, embed_dim=32, pixel_dim=8,
                               num_heads=2)
        p = dd.init(jax.random.PRNGKey(0), cfg)
        l = jnp.asarray(rng.random((1, 64, 32, 1)).astype(np.float32)) * 100
        ab = dd.apply(p, l, cfg)
        assert ab.shape == (1, 64, 32, 2)
        assert float(jnp.abs(ab).max()) <= 110.0 + 1e-3
        # deterministic
        np.testing.assert_array_equal(np.asarray(ab),
                                      np.asarray(dd.apply(p, l, cfg)))

    def test_ddcolor_large_config_dims(self):
        from framewright_tpu.models import ddcolor as dd

        big = dd.large_config()
        assert big.num_queries == 100 and big.embed_dim == 256
        assert big.dims == (96, 192, 384, 768)

    def test_colorizer_ddcolor_method(self, rng):
        gray = np.stack([(rng.random((32, 48)) * 255)] * 3, -1).astype(np.uint8)
        col = Colorizer(ColorizeConfig(method="ddcolor", saturation=0.6))
        col.setup(32, 48)
        out = col._colorize_keyframe(gray)
        assert out.shape == gray.shape
        y_in, _, _ = rgb_to_ycbcr(gray.astype(np.float32))
        y_out, _, _ = rgb_to_ycbcr(out.astype(np.float32))
        assert np.abs(y_in - y_out).mean() < 8.0

    def test_colorizer_eccv16_method(self, rng):
        gray = np.stack([(rng.random((32, 48)) * 255)] * 3, -1).astype(np.uint8)
        col = Colorizer(ColorizeConfig(method="eccv16", saturation=0.6))
        col.setup(32, 48)
        out = col._colorize_keyframe(gray)
        assert out.shape == gray.shape
        # luma approximately preserved (Lab L fixed)
        y_in, _, _ = rgb_to_ycbcr(gray.astype(np.float32))
        y_out, _, _ = rgb_to_ycbcr(out.astype(np.float32))
        assert np.abs(y_in - y_out).mean() < 8.0


@pytest.mark.slow
class TestGFPGANTorchParity:
    def test_full_model_matches_clean_reference(self):
        """Shared weights into the basicsr GFPGANv1Clean re-statement
        and the JAX model: outputs must match (validates the clean
        ResBlock interpolate semantics, modulated-conv demodulation,
        the StyleConv sqrt-2 gain placement, and raw-scale CS-SFT)."""
        torch = pytest.importorskip("torch")
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import gfpgan, torch_ref

        cfg = gfpgan.GFPGANConfig(out_size=64, num_style_feat=64,
                                  channel_multiplier=1, num_mlp=2,
                                  narrow=0.25)
        params = gfpgan.init(jax.random.PRNGKey(0), cfg)
        # released skip convs are bias-free; zero ours for comparison
        for grp in ("conv_body_down", "conv_body_up"):
            for blk in params[grp]:
                blk["skip"]["b"] = blk["skip"]["b"] * 0.0

        def conv_w(p):
            return np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))

        sd = {}

        def put_conv(name, p, bias=True):
            sd[name + ".weight"] = conv_w(p)
            if bias:
                sd[name + ".bias"] = np.asarray(p["b"])

        put_conv("conv_body_first", params["conv_body_first"])
        put_conv("final_conv", params["final_conv"])
        sd["final_linear.weight"] = np.asarray(params["final_linear"]["w"]).T
        sd["final_linear.bias"] = np.asarray(params["final_linear"]["b"])
        for grp, tname in (("conv_body_down", "conv_body_down"),
                           ("conv_body_up", "conv_body_up")):
            for i, blk in enumerate(params[grp]):
                put_conv(f"{tname}.{i}.conv1", blk["conv1"])
                put_conv(f"{tname}.{i}.conv2", blk["conv2"])
                put_conv(f"{tname}.{i}.skip", blk["skip"], bias=False)
        for i, (sc, sh) in enumerate(zip(params["condition_scale"],
                                         params["condition_shift"])):
            put_conv(f"condition_scale.{i}.0", sc["c1"])
            put_conv(f"condition_scale.{i}.2", sc["c2"])
            put_conv(f"condition_shift.{i}.0", sh["c1"])
            put_conv(f"condition_shift.{i}.2", sh["c2"])
        for i, rgb in enumerate(params["toRGB"]):
            put_conv(f"toRGB.{i}", rgb)
        for i, mlp in enumerate(params["style_mlp"]):
            sd[f"stylegan_decoder.style_mlp.{2 * i + 1}.weight"] = \
                np.asarray(mlp["w"]).T
            sd[f"stylegan_decoder.style_mlp.{2 * i + 1}.bias"] = \
                np.asarray(mlp["b"])
        sg = params["stylegan_decoder"]
        sd["stylegan_decoder.constant_input.weight"] = np.transpose(
            np.asarray(sg["constant_input"]), (0, 3, 1, 2))

        def put_style(prefix, p):
            mc = p["modulated_conv"]
            sd[prefix + ".modulated_conv.weight"] = np.transpose(
                np.asarray(mc["weight"]), (3, 2, 0, 1))[None]
            sd[prefix + ".modulated_conv.modulation.weight"] = \
                np.asarray(mc["modulation"]["w"]).T
            sd[prefix + ".modulated_conv.modulation.bias"] = \
                np.asarray(mc["modulation"]["b"])
            if "noise_weight" in p:
                sd[prefix + ".weight"] = np.asarray(
                    p["noise_weight"]).reshape(1)
            sd[prefix + ".bias"] = np.asarray(p["bias"]).reshape(1, -1, 1, 1)

        put_style("stylegan_decoder.style_conv1", sg["style_conv1"])
        put_style("stylegan_decoder.to_rgb1", sg["to_rgb1"])
        for i, p in enumerate(sg["style_convs"]):
            put_style(f"stylegan_decoder.style_convs.{i}", p)
        for i, p in enumerate(sg["to_rgbs"]):
            put_style(f"stylegan_decoder.to_rgbs.{i}", p)

        tm = torch_ref.build_gfpgan()
        missing, unexpected = tm.load_state_dict(
            {k: torch.as_tensor(np.ascontiguousarray(v))
             for k, v in sd.items()}, strict=False)
        assert not missing, missing[:5]
        assert not unexpected, unexpected[:5]
        tm.eval()

        rng = np.random.default_rng(0)
        x = (rng.random((1, 64, 64, 3), dtype=np.float32) * 2 - 1)
        with torch.no_grad():
            yt = tm(torch.as_tensor(x.transpose(0, 3, 1, 2)))
        y_torch = yt.numpy().transpose(0, 2, 3, 1)
        y_jax = np.asarray(gfpgan.apply(params, jnp.asarray(x), cfg))
        err = np.abs(y_jax - y_torch).max()
        assert err < 1e-2, f"max abs err {err:.5f}"


@pytest.mark.slow
class TestDDColorTorchParity:
    def test_full_model_matches_twin_large_config(self):
        """Numeric twin at large_config() dims (VERDICT round-2 weak
        item 6: DDColor was shape-tested only): ConvNeXt encoder, FPN
        pixel decoder, query cross-attention, correlation volume."""
        torch = pytest.importorskip("torch")
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import ddcolor, torch_ref

        cfg = ddcolor.large_config()
        params = ddcolor.init(jax.random.PRNGKey(7), cfg)
        tm = torch_ref.build_ddcolor(
            dims=cfg.dims, depths=cfg.depths, num_queries=cfg.num_queries,
            embed_dim=cfg.embed_dim, pixel_dim=cfg.pixel_dim,
            heads=cfg.num_heads,
            dec_layers_per_scale=cfg.dec_layers_per_scale)

        def conv_t(p):
            return {"weight": np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)),
                    "bias": np.asarray(p["b"])}

        def lin_t(p):
            return {"weight": np.asarray(p["w"]).T, "bias": np.asarray(p["b"])}

        def ln_t(p):
            return {"weight": np.asarray(p["g"]), "bias": np.asarray(p["b"])}

        sd = {}

        def put(prefix, d):
            for k, v in d.items():
                sd[f"{prefix}.{k}"] = v

        put("stem", conv_t(params["stem"]))
        for si, stage in enumerate(params["stages"]):
            for bi, blk in enumerate(stage):
                pre = f"stages.{si}.{bi}"
                put(f"{pre}.dw", conv_t(blk["dw"]))
                put(f"{pre}.ln", ln_t(blk["ln"]))
                put(f"{pre}.fc1", lin_t(blk["fc1"]))
                put(f"{pre}.fc2", lin_t(blk["fc2"]))
                sd[f"{pre}.gamma"] = np.asarray(blk["gamma"])
        for si, down in enumerate(params["downs"]):
            put(f"downs.{si}.ln", ln_t(down["ln"]))
            put(f"downs.{si}.conv", conv_t(down["conv"]))
        for si in range(len(cfg.dims)):
            put(f"lateral.{si}", conv_t(params["lateral"][si]))
            put(f"fpn_out.{si}", conv_t(params["fpn_out"][si]))
        put("pix_up", conv_t(params["pix_up"]))
        sd["queries"] = np.asarray(params["queries"])
        for si, proj in enumerate(params["feat_proj"]):
            put(f"feat_proj.{si}", lin_t(proj))
        for li, layer in enumerate(params["dec"]):
            pre = f"dec.{li}"
            for lk in ("q", "k", "v", "o", "ffn1", "ffn2"):
                put(f"{pre}.{lk}", lin_t(layer[lk]))
            put(f"{pre}.ln1", ln_t(layer["ln1"]))
            put(f"{pre}.ln2", ln_t(layer["ln2"]))
        put("q_final", lin_t(params["q_final"]))
        put("out", conv_t(params["out"]))

        missing, unexpected = tm.load_state_dict(
            {k: torch.as_tensor(np.ascontiguousarray(v))
             for k, v in sd.items()}, strict=True)
        assert not missing and not unexpected
        tm.eval()

        rng = np.random.default_rng(11)
        l_chan = (rng.random((1, 64, 64, 1)) * 100.0).astype(np.float32)
        with torch.no_grad():
            yt = tm(torch.as_tensor(l_chan)).numpy()
        yj = np.asarray(ddcolor.apply(params, jnp.asarray(l_chan), cfg))
        assert yj.shape == yt.shape == (1, 64, 64, 2)
        scale = np.abs(yt).max() + 1e-6
        err = np.abs(yj - yt).max()
        assert err / scale < 2e-3, f"max abs err {err:.6f} (scale {scale:.4f})"
