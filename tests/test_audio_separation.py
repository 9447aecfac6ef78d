"""Audio separation + dialog enhancement (reference
audio_restoration.py:683 DialogEnhancer, :731 AudioSeparator)."""

from pathlib import Path

import numpy as np
import pytest

from framewright_tpu.audio_separation import (
    AudioSeparator,
    DialogConfig,
    DialogEnhancer,
    SeparationConfig,
)
from framewright_tpu.models.audio_net import synth_clean, synth_music

SR = 48000


def _si_snr(est, ref):
    ref = ref - ref.mean()
    est = est - est.mean()
    a = float((est * ref).sum() / ((ref * ref).sum() + 1e-12))
    e = est - a * ref
    return 10 * np.log10(((a * ref) ** 2).sum() / ((e * e).sum() + 1e-12))


def _mixture(seed=0, seconds=4, smr_db=0.0):
    rng = np.random.default_rng(seed)
    n = SR * seconds
    voc = synth_clean(rng, n, SR)
    mus = synth_music(rng, n, SR)
    mus = mus * (np.sqrt((voc ** 2).mean())
                 / np.sqrt((mus ** 2).mean())) * 10 ** (-smr_db / 20)
    return voc, mus, (voc + mus).astype(np.float32)


class TestSeparator:
    def test_dsp_snr_gain(self):
        voc, mus, mix = _mixture(0)
        stems = AudioSeparator(SeparationConfig(backend="dsp")).separate(
            mix, SR)
        base = _si_snr(mix, voc)
        assert _si_snr(stems["vocals"], voc) > base + 3.0
        assert _si_snr(stems["background"], mus) > _si_snr(mix, mus) + 1.5

    def test_learned_snr_gain(self):
        # packaged checkpoint (audio_sep_v1, trained in-repo on the
        # synthetic speech+music generator); gate: >= +5 dB SI-SNR
        voc, mus, mix = _mixture(1)
        sep = AudioSeparator(SeparationConfig(backend="learned"))
        stems = sep.separate(mix, SR)
        gain = _si_snr(stems["vocals"], voc) - _si_snr(mix, voc)
        assert gain > 5.0, gain

    def test_stems_are_complementary(self):
        _, _, mix = _mixture(2, seconds=2)
        stems = AudioSeparator().separate(mix, SR)
        np.testing.assert_allclose(
            stems["vocals"] + stems["background"], mix, atol=1e-4)

    def test_stereo_shape(self):
        _, _, mix = _mixture(3, seconds=1)
        st = np.stack([mix, mix * 0.8], axis=-1)
        stems = AudioSeparator(SeparationConfig(backend="dsp")).separate(
            st, SR)
        assert stems["vocals"].shape == st.shape

    def test_separate_file(self, tmp_path):
        from framewright_tpu.audio import read_wav, write_wav

        _, _, mix = _mixture(4, seconds=1)
        src = tmp_path / "in.wav"
        write_wav(src, mix[:, None], SR)
        paths = AudioSeparator(SeparationConfig(backend="dsp")
                               ).separate_file(src, tmp_path / "stems")
        assert set(paths) == {"vocals", "background"}
        for p in paths.values():
            x, sr2 = read_wav(p)
            assert sr2 == SR and len(x) > 0


class TestDialogEnhancer:
    def test_presence_boost_and_highpass(self):
        rng = np.random.default_rng(0)
        n = SR * 2
        t = np.arange(n) / SR
        low = np.sin(2 * np.pi * 60 * t).astype(np.float32)
        mid = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
        x = 0.2 * low + 0.2 * mid
        y = DialogEnhancer(DialogConfig(comp_threshold_db=0.0)).process(
            x.astype(np.float32), SR)

        def band_power(sig, f0):
            spec = np.abs(np.fft.rfft(sig))
            freqs = np.fft.rfftfreq(len(sig), 1 / SR)
            sel = np.abs(freqs - f0) < 30
            return float((spec[sel] ** 2).sum())

        # 60 Hz crushed, 3 kHz boosted (relative change)
        assert band_power(y, 60) < band_power(x, 60) * 0.25
        assert (band_power(y, 3000) / band_power(x, 3000)
                > band_power(y, 60) / band_power(x, 60) * 4)

    def test_compressor_reduces_dynamic_range(self):
        n = SR
        t = np.arange(n) / SR
        tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
        x = np.concatenate([0.05 * tone, 0.8 * tone])
        y = DialogEnhancer(DialogConfig(boost_db=0.0, deess_db=0.0,
                                        highpass_hz=20.0)).process(x, SR)
        def rms(v):
            return float(np.sqrt((v ** 2).mean()))
        in_range = rms(x[n:]) / rms(x[:n])
        out_range = rms(y[n + SR // 10:]) / rms(y[SR // 10:n])
        assert out_range < in_range * 0.7, (in_range, out_range)

    def test_limiter(self):
        x = np.sin(np.linspace(0, 300, SR)).astype(np.float32) * 2.0
        y = DialogEnhancer().process(x, SR)
        assert float(np.abs(y).max()) <= 0.951
