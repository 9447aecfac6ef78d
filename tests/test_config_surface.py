"""Round-2 config surface: new flag groups exist, validate, and
round-trip through dict/env/preset layering (reference config.py
256-614 flag groups: auto-enhance, VHS, HDR, grain, subtitles,
diffusion, authenticity guard)."""

import dataclasses

import pytest

from framewright_tpu.config import Config, build_config
from framewright_tpu.errors import ConfigError


class TestNewFlagGroups:
    def test_flag_count_parity(self):
        # the reference exposes ~150 flags; we target >= 110
        n = len([f for f in dataclasses.fields(Config)
                 if f.name not in Config._DERIVED])
        assert n >= 110, f"config surface shrank: {n} flags"

    def test_vhs_group_roundtrip(self):
        c = Config(vhs_restore=True, vhs_fix_dot_crawl=False,
                   vhs_tracking_threshold=22.5)
        d = c.to_dict()
        c2 = Config.from_dict(d)
        assert c2.vhs_restore and not c2.vhs_fix_dot_crawl
        assert c2.vhs_tracking_threshold == 22.5

    def test_hdr_validation(self):
        Config(hdr_output="hlg", hdr_peak_nits=4000.0)
        with pytest.raises(ConfigError):
            Config(hdr_output="dolby")

    def test_grain_mode_validation(self):
        for m in ("auto", "off", "preserve", "remove", "match"):
            Config(grain_mode=m)
        with pytest.raises(ConfigError):
            Config(grain_mode="plenty")

    def test_subtitle_group(self):
        c = Config(subtitle_region="top", subtitle_languages=["eng", "deu"])
        assert c.subtitle_languages == ("eng", "deu")
        with pytest.raises(ConfigError):
            Config(subtitle_region="left")

    def test_authenticity_guard_range(self):
        Config(max_enhancement_strength=0.5)
        with pytest.raises(ConfigError):
            Config(max_enhancement_strength=1.5)

    def test_diffusion_flags(self):
        c = Config(diffusion_steps=16, diffusion_strength=0.5)
        assert c.diffusion_steps == 16
        with pytest.raises(ConfigError):
            Config(diffusion_steps=0)

    def test_env_override_string_tuple(self):
        env = {"FRAMEWRIGHT_SUBTITLE_LANGUAGES": "eng,jpn",
               "FRAMEWRIGHT_VHS_RESTORE": "true",
               "FRAMEWRIGHT_HDR_PEAK_NITS": "600"}
        cfg = build_config(environ=env)
        assert cfg.subtitle_languages == ("eng", "jpn")
        assert cfg.vhs_restore is True
        assert cfg.hdr_peak_nits == 600.0

    def test_hash_changes_with_new_flags(self):
        a = Config().get_hash()
        b = Config(vhs_restore=True).get_hash()
        c = Config(hdr_output="hdr10").get_hash()
        assert len({a, b, c}) == 3


class TestAutoEnhanceMapping:
    def test_recommend_settings_qp(self):
        from framewright_tpu.processors.analysis import (
            AnalysisReport,
            DegradationType,
            recommend_settings,
        )

        rep = AnalysisReport()
        rep.degradations = [DegradationType.COMPRESSION]
        rec = recommend_settings(rep)
        assert rec.get("qp_removal") is True


class TestRound2LateFlags:
    def test_new_flags_exist_and_roundtrip(self):
        from framewright_tpu.config import Config

        cfg = Config(colorize_saturation=0.8, colorize_keyframe_interval=12,
                     watermark_regions=((4, 4, 16, 8),),
                     max_runtime_minutes=90.0, stage_max_retries=3)
        d = cfg.to_dict()
        back = Config.from_dict(d)
        assert back.colorize_saturation == 0.8
        assert back.max_runtime_minutes == 90.0
        assert tuple(tuple(r) for r in back.watermark_regions) == ((4, 4, 16, 8),)

    def test_runtime_budget_stops_and_resumes(self, tmp_path, monkeypatch):
        import numpy as np

        monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
        from framewright_tpu.config import Config
        from framewright_tpu.errors import FramewrightError
        from framewright_tpu.io.y4m import Y4MReader, Y4MWriter
        from framewright_tpu.restorer import VideoRestorer

        rng = np.random.default_rng(0)
        clip = tmp_path / "in.y4m"
        with Y4MWriter(clip, 32, 32, fps=12) as w:
            for _ in range(24):
                w.write_frame(rng.integers(0, 256, (32, 32, 3),
                                           dtype=np.uint8))
        cfg = Config(project_dir=tmp_path / "p", scale_factor=4,
                     sr_model="realesr-animevideov3",
                     compute_dtype="float32", device_platform="cpu",
                     validate_output=False,
                     max_runtime_minutes=1e-9)   # budget expires instantly
        out = tmp_path / "out.y4m"
        with pytest.raises(FramewrightError, match="runtime budget"):
            VideoRestorer(cfg).restore_video(clip, out)
        # rerun WITHOUT the budget: resumes and completes
        cfg2 = cfg.with_overrides(max_runtime_minutes=0.0)
        VideoRestorer(cfg2).restore_video(clip, out)
        with Y4MReader(out) as r:
            assert r.count_frames() == 24
