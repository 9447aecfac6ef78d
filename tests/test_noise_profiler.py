"""NoiseProfiler: sigma recovery, classification, auto-denoise wiring.

Reference analog: processors/noise_profiler.py:137-592 (luma/chroma/
temporal/grain decomposition -> denoiser recommendation)."""

import numpy as np
import pytest

from framewright_tpu.processors.noise_profiler import (
    NoiseProfiler,
    NoiseType,
    profile_frames,
)


def _base_frame(h=256, w=320, seed=0):
    """Smooth-content frame: gradients + a few soft shapes."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    g = 60 + 80 * (xx / w) + 40 * (yy / h)
    cx, cy = w * 0.6, h * 0.4
    g += 50 * np.exp(-(((xx - cx) / 40) ** 2 + ((yy - cy) / 30) ** 2))
    frame = np.stack([g, g * 0.9 + 10, g * 1.05], -1)
    return np.clip(frame, 0, 255)


def _clip(noise_fn, n=8, seed=1):
    rng = np.random.default_rng(seed)
    base = _base_frame()
    return [np.clip(noise_fn(base.copy(), rng), 0, 255).astype(np.uint8)
            for _ in range(n)]


class TestSigmaRecovery:
    @pytest.mark.parametrize("sigma", [3.0, 8.0, 20.0])
    def test_gaussian_sigma_recovered(self, sigma):
        # common-mode (luma-direction) noise: sigma_Y == sigma exactly;
        # iid-RGB noise would give sigma_Y = 0.669*sigma (BT.601)
        clip = _clip(lambda f, rng:
                     f + rng.normal(0, sigma, f.shape[:2])[..., None])
        prof = profile_frames(clip)
        got = prof.characteristics.luma_sigma
        assert abs(got - sigma) / sigma < 0.25, (got, sigma)

    def test_clean_is_minimal(self):
        clip = _clip(lambda f, rng: f)
        prof = profile_frames(clip)
        assert prof.characteristics.luma_sigma < 1.5
        assert prof.dominant_type == NoiseType.MINIMAL
        assert prof.recommended_denoiser == "none"
        assert prof.config_overrides() == {}

    def test_temporal_sigma_static_scene(self):
        # iid per-frame noise on static content: temporal sigma ~ sigma
        clip = _clip(lambda f, rng:
                     f + rng.normal(0, 6.0, f.shape[:2])[..., None])
        prof = profile_frames(clip)
        t = prof.characteristics.temporal_sigma
        assert abs(t - 6.0) / 6.0 < 0.3, t


class TestClassification:
    def test_iid_gaussian_recommends_temporal(self):
        # frame-independent noise on static content is best removed
        # temporally (reference rule: temporal_noise > luminance_noise)
        clip = _clip(lambda f, rng:
                     f + rng.normal(0, 10.0, f.shape[:2])[..., None])
        prof = profile_frames(clip)
        assert prof.dominant_type == NoiseType.TEMPORAL
        assert prof.recommended_denoiser == "temporal"
        assert prof.recommended_strength > 0.2
        ov = prof.config_overrides()
        assert ov["denoise"] and ov["denoise_model"] == "temporal"

    def test_salt_pepper(self):
        def sp(f, rng):
            mask = rng.random(f.shape[:2]) < 0.01
            f[mask] = rng.choice([0.0, 255.0], size=int(mask.sum()))[:, None]
            return f
        prof = profile_frames(_clip(sp))
        assert prof.dominant_type == NoiseType.SALT_PEPPER
        assert prof.recommended_denoiser == "nafnet"

    def test_chroma_noise(self):
        def chroma(f, rng):
            n = rng.normal(0, 12.0, f.shape[:2])
            # B-Y axis noise: moves U strongly, Y barely
            f[..., 2] += n * 2.0
            f[..., 0] -= n * 0.2
            return f
        prof = profile_frames(_clip(chroma))
        c = prof.characteristics
        assert c.chroma_sigma > c.luma_sigma * 1.4
        assert prof.dominant_type == NoiseType.CHROMA
        assert prof.chroma_only

    def test_film_grain(self):
        # correlated speckle (multi-pixel grain), fresh each frame
        def grain(f, rng):
            n = rng.normal(0, 28.0, (f.shape[0] + 2, f.shape[1] + 2))
            # 3x3 smooth -> spatially correlated grain
            sm = (n[:-2, :-2] + n[1:-1, :-2] + n[2:, :-2]
                  + n[:-2, 1:-1] + n[1:-1, 1:-1] + n[2:, 1:-1]
                  + n[:-2, 2:] + n[1:-1, 2:] + n[2:, 2:]) / 9.0
            return f + sm[..., None] * 3.0
        prof = profile_frames(_clip(grain))
        assert prof.characteristics.grain_correlation > 0.3
        assert prof.dominant_type == NoiseType.FILM_GRAIN
        assert prof.preserve_grain
        assert prof.config_overrides().get("grain_preserve") is True

    def test_compression_blockiness(self):
        def blocky(f, rng):
            # 8x8 block-mean quantization = strong codec blockiness
            h, w = f.shape[:2]
            g = f[:h // 8 * 8, :w // 8 * 8]
            blocks = g.reshape(h // 8, 8, w // 8, 8, 3).mean((1, 3))
            out = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
            f[:h // 8 * 8, :w // 8 * 8] = out
            return f
        prof = profile_frames(_clip(blocky))
        assert prof.characteristics.blockiness > 0.25
        assert prof.dominant_type == NoiseType.COMPRESSION
        assert prof.qp_removal
        assert prof.config_overrides().get("qp_removal") is True

    def test_fixed_pattern_not_temporal(self):
        # the SAME noise field on every frame: temporal sigma ~ 0
        rng0 = np.random.default_rng(5)
        pattern = rng0.normal(0, 10.0, (256, 320, 1))
        clip = _clip(lambda f, rng: f + pattern)
        prof = profile_frames(clip)
        assert prof.characteristics.temporal_sigma < 2.0
        assert prof.dominant_type != NoiseType.TEMPORAL


class TestAutoDenoise:
    def test_auto_configures_and_denoises(self):
        from framewright_tpu.processors.temporal_denoise import (
            TemporalDenoiseConfig,
            TemporalDenoiser,
        )

        rng = np.random.default_rng(2)
        base = _base_frame(96, 112)
        clip = [np.clip(base + rng.normal(0, 18.0, base.shape[:2])[..., None],
                        0, 255).astype(np.uint8) for _ in range(9)]
        dn = TemporalDenoiser(TemporalDenoiseConfig(
            radius=2, method="auto", flow_align=False))
        dn.setup(96, 112)
        out = list(dn.denoise_stream(iter(clip)))
        assert len(out) == len(clip)
        assert dn.result.profile is not None
        assert dn.result.profile["recommended_denoiser"] == "temporal"
        # center frames must be visibly denoised
        mid = len(clip) // 2
        err_in = np.abs(clip[mid].astype(np.float32) - base).mean()
        err_out = np.abs(out[mid].astype(np.float32) - base).mean()
        assert err_out < err_in * 0.75, (err_in, err_out)

    def test_auto_clean_passthrough(self):
        from framewright_tpu.processors.temporal_denoise import (
            TemporalDenoiseConfig,
            TemporalDenoiser,
        )

        base = _base_frame(96, 112).astype(np.uint8)
        clip = [base.copy() for _ in range(6)]
        dn = TemporalDenoiser(TemporalDenoiseConfig(radius=2, method="auto"))
        dn.setup(96, 112)
        out = list(dn.denoise_stream(iter(clip)))
        assert len(out) == 6
        np.testing.assert_array_equal(out[0], base)
        assert dn.result.profile["recommended_denoiser"] == "none"

    def test_chroma_only_preserves_luma(self):
        from framewright_tpu.processors.temporal_denoise import (
            TemporalDenoiseConfig,
            TemporalDenoiser,
        )

        rng = np.random.default_rng(3)
        base = _base_frame(96, 112)
        clip = [np.clip(base + rng.normal(0, 10.0, base.shape), 0, 255)
                .astype(np.uint8) for _ in range(5)]
        dn = TemporalDenoiser(TemporalDenoiseConfig(
            radius=2, method="temporal", flow_align=False,
            chroma_only=True, strength=1.0))
        dn.setup(96, 112)
        out = list(dn.denoise_stream(iter(clip)))
        w = np.asarray([0.299, 0.587, 0.114], np.float32)
        y_in = (clip[2].astype(np.float32) * w).sum(-1)
        y_out = (out[2].astype(np.float32) * w).sum(-1)
        assert np.abs(y_in - y_out).mean() < 1.0


class TestAnalysisIntegration:
    def test_report_carries_profile_and_recommendations(self):
        from framewright_tpu.processors.analysis import (
            ContentAnalyzer,
            recommend_settings,
        )

        rng = np.random.default_rng(4)
        base = _base_frame(128, 160)
        frames = [np.clip(base + rng.normal(0, 14.0, base.shape), 0, 255)
                  .astype(np.uint8) for _ in range(12)]
        rep = ContentAnalyzer(sample_every=2).analyze(iter(frames))
        assert rep.noise_profile is not None
        assert rep.noise_profile.characteristics.luma_sigma > 7.0
        rec = recommend_settings(rep)
        assert rec.get("denoise") is True
        assert "denoise_strength" in rec
        assert rep.to_dict()["noise_profile"]["dominant_type"]
