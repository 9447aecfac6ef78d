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
