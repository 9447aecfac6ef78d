"""Audio chain tests: WAV I/O, filters, enhancer, sync."""

import numpy as np
import pytest

from framewright_tpu.audio import (
    AudioEnhanceConfig,
    AudioEnhancer,
    AudioSyncAnalyzer,
    AudioSyncCorrector,
    ClickRemover,
    HumRemover,
    Normalizer,
    SpectralDenoiser,
    read_wav,
    write_wav,
)

SR = 16000


def _tone(freq, seconds=1.0, sr=SR, amp=0.3):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestWavIO:
    def test_roundtrip(self, tmp_path):
        x = np.stack([_tone(440), _tone(880)], axis=1)
        write_wav(tmp_path / "t.wav", x, SR)
        y, sr = read_wav(tmp_path / "t.wav")
        assert sr == SR and y.shape == x.shape
        assert np.abs(y - x).max() < 1e-3  # 16-bit quantization

    def test_mono(self, tmp_path):
        write_wav(tmp_path / "m.wav", _tone(440), SR)
        y, sr = read_wav(tmp_path / "m.wav")
        assert y.shape[1] == 1


class TestFilters:
    def test_hum_removal_kills_50hz(self):
        signal = _tone(1000)
        hum = _tone(50, amp=0.2)
        x = (signal + hum)[:, None]
        out = HumRemover(50.0).process(x, SR)

        def band_power(s, f):
            spec = np.abs(np.fft.rfft(s[:, 0]))
            k = int(f * len(s) / SR)
            return spec[max(0, k - 2):k + 3].max()

        assert band_power(out, 50) < band_power(x, 50) * 0.2
        assert band_power(out, 1000) > band_power(x, 1000) * 0.7

    def test_click_removal(self):
        x = _tone(300)[:, None].copy()
        x[5000] = 0.99
        x[9000] = -0.99
        out = ClickRemover().process(x, SR)
        assert abs(out[5000, 0]) < 0.5
        assert abs(out[9000, 0]) < 0.5
        # signal preserved elsewhere
        assert np.abs(out[:4000] - x[:4000]).max() < 0.05

    def test_spectral_denoise_improves_snr(self, rng):
        # intermittent speech-like signal: spectral subtraction needs
        # quiet frames to estimate the noise floor
        clean = _tone(500, 2.0)
        gate = np.zeros_like(clean)
        gate[SR // 2:SR] = 1.0
        gate[SR + SR // 2:] = 1.0
        clean = clean * gate
        noise = rng.normal(0, 0.05, clean.shape).astype(np.float32)
        x = (clean + noise)[:, None]
        out = SpectralDenoiser(strength=1.8).process(x, SR)
        silent = slice(2048, SR // 2 - 2048)
        assert np.mean(out[silent, 0] ** 2) < np.mean(x[silent, 0] ** 2) * 0.4
        on = slice(SR // 2 + 2048, SR - 2048)
        tone_power = np.mean(clean[on] ** 2)
        assert np.mean(out[on, 0] ** 2) > tone_power * 0.4

    def test_normalizer_hits_target(self):
        x = (_tone(440, amp=0.01))[:, None]
        out = Normalizer(target_dbfs=-18).process(x, SR)
        rms_db = 20 * np.log10(np.sqrt(np.mean(out ** 2)))
        assert abs(rms_db - (-18)) < 1.5


class TestEnhancer:
    def test_chain_runs(self, tmp_path, rng):
        x = (_tone(800) + _tone(50, amp=0.15)
             + rng.normal(0, 0.02, SR).astype(np.float32))[:, None]
        write_wav(tmp_path / "in.wav", x, SR)
        out_path = AudioEnhancer(AudioEnhanceConfig()).process_file(
            tmp_path / "in.wav", tmp_path / "out.wav")
        y, sr = read_wav(out_path)
        assert y.shape[0] == x.shape[0]


class TestSync:
    def test_constant_offset_detected_and_corrected(self, rng):
        base = rng.normal(0, 0.1, SR * 4).astype(np.float32)
        ref = base[:, None]
        shift = int(0.25 * SR)
        test = np.concatenate([np.zeros(shift, np.float32), base])[: len(base)][:, None]
        res = AudioSyncAnalyzer(window_s=1.0, step_s=1.0).analyze(ref, test, SR)
        assert abs(abs(res["offset_s"]) - 0.25) < 0.02
        # analyzer returns the alignment-ready correction directly
        fixed = AudioSyncCorrector.correct(test, SR, offset_s=res["offset_s"])
        # after correction, alignment error shrinks
        n = min(len(fixed), len(ref))
        before = np.mean((test[:n, 0] - ref[:n, 0]) ** 2)
        after = np.mean((fixed[:n, 0] - ref[:n, 0]) ** 2)
        assert after < before * 0.1

    def test_drift_estimation(self, rng):
        base = rng.normal(0, 0.1, SR * 30).astype(np.float32)
        ref = base[:, None]
        # 0.5% drift: test track resampled slightly long
        n = len(base)
        idx = np.linspace(0, n - 1, int(n * 1.005))
        test = np.interp(idx, np.arange(n), base).astype(np.float32)[:, None]
        res = AudioSyncAnalyzer(window_s=2.0, step_s=5.0).analyze(ref, test, SR)
        assert res["points"] >= 3
        # alignment-ready convention: a 1.005x-stretched track needs a
        # negative drift correction (~-0.005); windowed xcorr biases
        # the magnitude, so accept the right sign and order of magnitude
        assert -0.012 < res["drift_s_per_s"] < -0.002


class TestWienerMaskDenoiser:
    def test_snr_gain_on_stationary_noise(self):
        from framewright_tpu.audio import WienerMaskDenoiser

        sr = 16000
        t = np.arange(sr * 2) / sr
        clean = (0.4 * np.sin(2 * np.pi * 220 * t)
                 * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
                 + 0.2 * np.sin(2 * np.pi * 880 * t)
                 * (0.5 + 0.5 * np.cos(2 * np.pi * 2 * t))).astype(np.float32)
        rng = np.random.default_rng(0)
        noisy = (clean + rng.normal(0, 0.08, clean.shape)
                 .astype(np.float32))[:, None]

        def snr(sig, ref):
            err = sig[: len(ref)] - ref
            return 10 * np.log10(np.sum(ref ** 2) / np.sum(err ** 2))

        out = WienerMaskDenoiser().process(noisy, sr)[:, 0]
        assert snr(out, clean) > snr(noisy[:, 0], clean) + 3.0

    def test_mask_fn_injectable(self):
        """A learned mask head can drive the same machinery."""
        from framewright_tpu.audio import WienerMaskDenoiser

        calls = {}

        def unity_mask(band_pow):
            calls["shape"] = band_pow.shape
            return np.ones(band_pow.shape, np.float32)

        sr = 16000
        x = np.random.default_rng(1).normal(
            0, 0.1, (sr, 1)).astype(np.float32)
        out = WienerMaskDenoiser(mask_fn=unity_mask).process(x, sr)
        # unity mask = near-passthrough (window OLA reconstruction)
        assert np.abs(out - x).mean() < 5e-3
        assert calls["shape"][1] == 32        # ERB bands

    def test_enhancer_defaults_to_wiener(self):
        from framewright_tpu.audio import AudioEnhanceConfig

        assert AudioEnhanceConfig().denoise_model == "wiener"


class TestLearnedMaskNet:
    """models/audio_net — the DeepFilterNet-class learned path
    (VERDICT round-2 item 8; reference audio_deepfilter/deepfilter.py
    225-787)."""

    def test_apply_shapes_and_range(self):
        import jax.numpy as jnp

        from framewright_tpu.models import audio_net

        p = audio_net.init_params(0)
        x, y = audio_net.make_batch(np.random.default_rng(3))
        g = np.asarray(audio_net.apply(p, jnp.asarray(x)))
        assert g.shape == x.shape
        assert 0.0 < g.min() and g.max() < 1.0

    def test_irm_target_properties(self):
        from framewright_tpu.models import audio_net

        x, y = audio_net.make_batch(np.random.default_rng(4))
        assert 0.0 <= y.min() and y.max() <= 1.0

    def test_short_training_reduces_loss(self):
        import jax.numpy as jnp

        from framewright_tpu.models import audio_net

        rng = np.random.default_rng(5)
        x, y = audio_net.make_batch(rng)

        def loss(p):
            g = audio_net.apply(p, jnp.asarray(x))
            return float(jnp.mean((g - jnp.asarray(y)) ** 2))

        p0 = audio_net.init_params(0)
        trained = audio_net.train_mask_net(steps=40, seed=0)
        assert loss(trained) < loss(p0)

    @pytest.mark.slow
    def test_shipped_checkpoint_beats_wiener(self):
        """The committed audio_mask_v1 checkpoint must give a real SNR
        gain over the decision-directed Wiener estimator on held-out
        synthetic mixtures — the learned path's reason to exist."""
        from framewright_tpu.audio import WienerMaskDenoiser
        from framewright_tpu.models import audio_net

        params = audio_net.load_params()
        rng = np.random.default_rng(99)
        sr = 48000
        n = sr * 2
        clean = audio_net.synth_clean(rng, n, sr)
        noise = audio_net.synth_noise(rng, n, sr)
        cp = np.sqrt(np.mean(clean ** 2))
        npow = np.sqrt(np.mean(noise ** 2)) + 1e-9
        noise = noise * (cp / npow) * 10 ** (-5 / 20)   # 5 dB SNR
        mix = (clean + noise)[:, None]

        def snr(x):
            s = x[: len(clean), 0]
            return 10 * np.log10(
                np.mean(clean ** 2) / (np.mean((s - clean) ** 2) + 1e-12))

        ai = WienerMaskDenoiser(
            mask_fn=audio_net.make_mask_fn(params)).process(mix, sr)
        wiener = WienerMaskDenoiser().process(mix, sr)
        assert snr(ai) > snr(mix) + 3.0       # real denoising
        assert snr(ai) > snr(wiener) + 1.0    # beats the DSP estimator

    def test_ai_backend_wired_with_fallback(self, tmp_path):
        """AudioEnhancer(denoise_model='ai') uses the packaged net and
        falls back to wiener when the checkpoint is missing."""
        from framewright_tpu.audio import AudioEnhanceConfig, AudioEnhancer

        rng = np.random.default_rng(7)
        x = (rng.standard_normal((9600, 1)) * 0.1).astype(np.float32)
        cfg = AudioEnhanceConfig(denoise_model="ai", hum_removal=False,
                                 click_removal=False, normalize=False)
        out = AudioEnhancer(cfg).process(x, 48000)
        assert out.shape == x.shape
        # missing checkpoint -> fallback, no crash
        cfg2 = AudioEnhanceConfig(denoise_model="ai", hum_removal=False,
                                  click_removal=False, normalize=False,
                                  ai_checkpoint=tmp_path / "nope.npz")
        out2 = AudioEnhancer(cfg2).process(x, 48000)
        assert out2.shape == x.shape
