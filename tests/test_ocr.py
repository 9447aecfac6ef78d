"""OCR backend gating + subtitle text recognition wiring
(reference subtitle_extraction.py:51,254)."""

import os
import stat
from pathlib import Path

import numpy as np
import pytest

from framewright_tpu.processors.ocr import (
    TesseractOCR,
    _to_ppm,
    default_ocr_fn,
    find_tesseract,
    preprocess_subtitle_band,
)


class TestPlumbing:
    def test_ppm_encoding(self):
        f = np.zeros((4, 6, 3), np.uint8)
        data = _to_ppm(f)
        assert data.startswith(b"P6\n6 4\n255\n")
        assert len(data) == len(b"P6\n6 4\n255\n") + 4 * 6 * 3
        g = np.zeros((4, 6), np.uint8)
        assert _to_ppm(g).startswith(b"P5\n6 4\n255\n")

    def test_preprocess_crops_and_upscales(self):
        f = np.zeros((100, 60, 3), np.uint8)
        f[80:, :] = 200
        band = preprocess_subtitle_band(f, band_frac=0.3)
        assert band.shape == (60, 120)          # 30% of H, 2x upscale
        assert band.dtype == np.uint8

    def test_default_ocr_none_without_backend(self, monkeypatch):
        monkeypatch.setenv("PATH", "/nonexistent")
        assert find_tesseract() is None
        assert default_ocr_fn() is None


class TestFakeTesseract:
    """Exercise the subprocess protocol with a stand-in binary (the
    real tesseract is absent on CI hosts; the wrapper's stdin/stdout
    contract is what we own)."""

    @pytest.fixture
    def fake_tess(self, tmp_path, monkeypatch):
        exe = tmp_path / "tesseract"
        exe.write_text(
            "#!/bin/sh\n"
            "# consume the PPM on stdin, print fixed text on stdout\n"
            "cat > /dev/null\n"
            "echo 'HELLO WORLD'\n"
        )
        exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
        return exe

    def test_recognizes_via_subprocess(self, fake_tess):
        ocr = TesseractOCR()
        assert Path(ocr.binary) == fake_tess
        frame = np.random.default_rng(0).integers(
            0, 255, (64, 96, 3), dtype=np.uint8)
        assert ocr(frame) == "HELLO WORLD"

    def test_subtitle_extractor_gets_text(self, fake_tess):
        from framewright_tpu.processors.subtitles import (
            SubtitleTimingExtractor,
        )

        ext = SubtitleTimingExtractor(ocr_fn=default_ocr_fn())
        frames = []
        base = np.full((48, 64, 3), 30, np.uint8)
        for t in range(20):
            f = base.copy()
            if 5 <= t < 15:
                f[40:46, 10:50] = 240        # subtitle band text block
            frames.append(f)
        events = ext.analyze(iter(frames))
        assert events, "no subtitle events detected"
        assert any(e.text == "HELLO WORLD" for e in events)

    def test_failing_binary_returns_empty(self, tmp_path, monkeypatch):
        exe = tmp_path / "tesseract"
        exe.write_text("#!/bin/sh\nexit 3\n")
        exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", str(tmp_path))
        ocr = TesseractOCR()
        assert ocr(np.zeros((32, 32, 3), np.uint8)) == ""


@pytest.mark.skipif(find_tesseract() is None,
                    reason="tesseract not installed")
class TestRealTesseract:
    def test_recognizes_rendered_text(self):
        # crude 5x7 bitmap "HI" rendered large — any real OCR reads it
        frame = np.full((120, 240, 3), 255, np.uint8)
        # H
        frame[30:90, 40:52] = 0
        frame[30:90, 88:100] = 0
        frame[54:66, 52:88] = 0
        # I
        frame[30:90, 140:152] = 0
        txt = TesseractOCR(preprocess=False)(frame)
        assert "H" in txt.upper()
