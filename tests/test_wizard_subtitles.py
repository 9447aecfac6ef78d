"""Wizard, subtitle timing/SRT, MS-SSIM tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from framewright_tpu.ops.metrics import ms_ssim
from framewright_tpu.processors.subtitles import (
    SubtitleTimingExtractor,
    export_srt,
    shift_events,
)
from framewright_tpu.wizard import Wizard


class TestWizard:
    def test_scripted_answers_build_config(self):
        answers = iter(["1", "3", "2", "2", "3"])
        out = []
        w = Wizard(input_fn=lambda prompt: next(answers), print_fn=out.append)
        cfg = w.run(project_dir="/tmp/wz")
        assert cfg.deduplicate          # old film
        assert cfg.scale_factor == 4    # 4x
        assert cfg.interpolation        # double framerate
        assert cfg.face_restore
        assert cfg.crf == 12            # archival

    def test_defaults_on_enter(self):
        answers = iter(["", "", "", "", ""])
        w = Wizard(input_fn=lambda p: next(answers), print_fn=lambda s: None)
        cfg = w.run()
        assert cfg.scale_factor == 2    # default choice

    def test_invalid_then_valid(self):
        answers = iter(["zz", "9", "2"] + [""] * 4)
        w = Wizard(input_fn=lambda p: next(answers), print_fn=lambda s: None)
        cfg = w.run()
        assert cfg.deinterlace == "yadif"  # option 2 = VHS


class TestSubtitles:
    def _clip(self, rng, n=40):
        frames = []
        for t in range(n):
            f = (rng.random((48, 64, 3)) * 90).astype(np.uint8)
            if 10 <= t < 22 or 28 <= t < 36:
                f[40:46, 14:50] = 245  # bright subtitle block
                f[41:45, 15:49:3] = 30  # stroke contrast
            frames.append(f)
        return frames

    def test_timing_extraction(self, rng):
        events = SubtitleTimingExtractor(min_frames=4).analyze(
            iter(self._clip(rng)))
        assert len(events) == 2
        assert abs(events[0].start_frame - 10) <= 2
        assert abs(events[0].end_frame - 22) <= 2
        assert abs(events[1].start_frame - 28) <= 2

    def test_srt_export(self, rng):
        events = SubtitleTimingExtractor(min_frames=4).analyze(
            iter(self._clip(rng)))
        srt = export_srt(events, fps=10.0)
        assert "1\n00:00:0" in srt
        assert "-->" in srt
        assert "[subtitle]" in srt

    def test_ocr_hook(self, rng):
        ex = SubtitleTimingExtractor(min_frames=4,
                                     ocr_fn=lambda f: "HELLO")
        events = ex.analyze(iter(self._clip(rng)))
        assert all(e.text == "HELLO" for e in events)

    def test_shift(self, rng):
        events = SubtitleTimingExtractor(min_frames=4).analyze(
            iter(self._clip(rng)))
        shifted = shift_events(events, 5)
        assert shifted[0].start_frame == events[0].start_frame + 5

    def test_no_subtitles_no_events(self, rng):
        frames = [(rng.random((48, 64, 3)) * 90).astype(np.uint8)
                  for _ in range(20)]
        assert SubtitleTimingExtractor().analyze(iter(frames)) == []


class TestMSSSIM:
    def test_identity(self, rng):
        x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        assert float(ms_ssim(x, x)) > 0.999

    def test_orders_degradation(self, rng):
        x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        mild = x + 0.02 * jnp.asarray(rng.standard_normal(x.shape, dtype=np.float32))
        bad = x + 0.3 * jnp.asarray(rng.standard_normal(x.shape, dtype=np.float32))
        assert float(ms_ssim(x, mild)) > float(ms_ssim(x, bad))
