"""Guided (prompt-conditioned) enhancement tests
(reference enhancement/guided_sr.py surface)."""

import numpy as np
import pytest

from framewright_tpu.processors.guided import (
    STYLE_PRESETS,
    ClassicalGuidedBackend,
    GuidedConfig,
    make_backend,
    parse_style,
)


@pytest.fixture()
def frame():
    rng = np.random.default_rng(0)
    base = rng.integers(40, 215, (48, 64, 3), dtype=np.uint8)
    return base


class TestParseStyle:
    def test_poles(self):
        v = parse_style("sharp grainy warm vivid bright contrasty")
        assert (v[:6] > 0).all()
        v2 = parse_style("soft clean cool muted dark flat")
        assert (v2[:6] < 0).all()

    def test_unknown_words_ignored(self):
        assert np.allclose(parse_style("fluorescent zebra"), 0)

    def test_presets_all_parse(self):
        for name, text in STYLE_PRESETS.items():
            assert np.abs(parse_style(text)).sum() > 0, name


class TestClassicalBackend:
    def test_sharp_increases_edge_energy(self, frame):
        b = ClassicalGuidedBackend(GuidedConfig(prompt="sharp detailed"))
        out = b.enhance(frame)
        def edge(x):
            g = x.astype(np.float32).mean(-1)
            return np.abs(np.diff(g, axis=1)).mean()
        assert edge(out) > edge(frame) * 1.05

    def test_warm_shifts_channels(self, frame):
        b = ClassicalGuidedBackend(GuidedConfig(prompt="warm"))
        out = b.enhance(frame).astype(np.float32)
        f = frame.astype(np.float32)
        assert out[..., 0].mean() > f[..., 0].mean()
        assert out[..., 2].mean() < f[..., 2].mean()

    def test_grain_raises_highfreq_variance(self, frame):
        flat = np.full((48, 64, 3), 128, np.uint8)
        b = ClassicalGuidedBackend(GuidedConfig(prompt="grainy film"))
        out = b.enhance(flat).astype(np.float32)
        assert out.std() > 1.0

    def test_empty_prompt_identity(self, frame):
        b = ClassicalGuidedBackend(GuidedConfig(prompt=""))
        out = b.enhance(frame)
        assert np.abs(out.astype(int) - frame.astype(int)).max() <= 1

    def test_stream(self, frame):
        b = ClassicalGuidedBackend(GuidedConfig(preset="cinematic"))
        outs = list(b.process_stream(iter([frame, frame])))
        assert len(outs) == 2 and outs[0].shape == frame.shape


class TestDiffusionBackend:
    @pytest.mark.slow
    def test_guided_sampling_runs(self, frame):
        cfg = GuidedConfig(prompt="sharp", backend="diffusion",
                           steps=2, guidance_scale=3.0)
        b = make_backend(cfg)
        small = frame[:16, :16]
        out = b.enhance(small)
        assert out.shape == (64, 64, 3)  # x4 model

    @pytest.mark.slow
    def test_style_conditioning_plumbed(self):
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import diffusion_sr

        cfg = diffusion_sr.DiffusionSRConfig(base_ch=8, ch_mults=(1, 2),
                                             steps=2)
        params = diffusion_sr.init(jax.random.PRNGKey(0), cfg)
        assert "style_proj" in params
        x = jnp.zeros((1, 8, 8, 3))
        # nonzero proj => style changes the output; zero-init => no-op
        out0 = diffusion_sr.ddim_sample(params, x, cfg,
                                        style=jnp.ones((1, 16)))
        out1 = diffusion_sr.ddim_sample(params, x, cfg, style=None)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1))
        params["style_proj"]["w"] = (
            jax.random.normal(jax.random.PRNGKey(1), (16, cfg.time_dim)))
        out2 = diffusion_sr.ddim_sample(params, x, cfg,
                                        style=jnp.ones((1, 16)) * 5.0,
                                        guidance_scale=4.0)
        assert float(jnp.abs(out2 - out1).max()) >= 0.0  # runs; shape ok
        assert out2.shape == out1.shape


class TestReferenceGuided:
    def test_color_statistics_move_toward_reference(self, tmp_path, frame):
        from framewright_tpu.io.png_seq import save_frame
        from framewright_tpu.processors.guided import (
            GuidedConfig,
            ReferenceGuidedBackend,
            make_backend,
        )

        # warm, bright reference stills
        rng = np.random.default_rng(3)
        for i in range(2):
            ref = rng.integers(120, 250, (32, 32, 3)).astype(np.uint8)
            ref[..., 2] //= 2  # warm: low blue
            save_frame(tmp_path / f"ref_{i}.png", ref)
        b = ReferenceGuidedBackend(tmp_path, strength=0.8)
        out = b.enhance(frame).astype(np.float32)
        f = frame.astype(np.float32)
        # output luma moves toward the brighter reference
        assert out.mean() > f.mean()
        # chain through make_backend works too
        chain = make_backend(GuidedConfig(prompt="sharp"),
                             reference_dir=str(tmp_path))
        out2 = chain.enhance(frame)
        assert out2.shape == frame.shape

    def test_missing_reference_dir_raises(self, tmp_path):
        from framewright_tpu.processors.guided import ReferenceGuidedBackend

        with pytest.raises(FileNotFoundError):
            ReferenceGuidedBackend(tmp_path / "empty")
