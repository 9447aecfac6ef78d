"""Preset registry, smart selector, NLP command parsing."""

import numpy as np
import pytest

from framewright_tpu.config import Config
from framewright_tpu.hw import DeviceInfo, HardwareInfo, HardwareTier
from framewright_tpu.nlp import build_config_from_text, parse_command
from framewright_tpu.presets import PresetInfo, PresetRegistry, SmartPresetSelector


def _hw(platform="tpu", hbm_gb=16, n=1):
    devs = [DeviceInfo(i, platform, "v5e", int(hbm_gb * 2**30), int(hbm_gb * 2**30))
            for i in range(n)]
    tier = (HardwareTier.CPU_ONLY if platform == "cpu"
            else HardwareTier.TPU_SINGLE if n == 1 else HardwareTier.TPU_POD_SLICE)
    return HardwareInfo(platform=platform, devices=devs, tier=tier)


class TestRegistry:
    def test_filters_by_hbm(self):
        small = PresetRegistry(_hw(hbm_gb=6))
        names = {p.name for p in small.available()}
        assert "fast" in names and "ultimate" not in names
        big = PresetRegistry(_hw(hbm_gb=32))
        assert "ultimate" in {p.name for p in big.available()}

    def test_cpu_adjustment(self):
        reg = PresetRegistry(_hw(platform="cpu"))
        cfg = reg.build_config("quality")
        assert cfg.compute_dtype == "float32"
        assert cfg.sr_model == "realesr-general-x4v3"

    def test_low_hbm_forces_tiling(self):
        reg = PresetRegistry(_hw(hbm_gb=6))
        cfg = reg.build_config("fast")
        assert cfg.tile_size == 256

    def test_custom_registration(self):
        reg = PresetRegistry(_hw())
        reg.register(PresetInfo("mine", "custom", overrides={"crf": 12}))
        assert reg.build_config("mine").crf == 12


class TestSmartSelector:
    def test_low_quality_gets_archive(self):
        from framewright_tpu.processors.analysis import AnalysisReport

        rep = AnalysisReport(quality_score=30.0)
        sel = SmartPresetSelector(PresetRegistry(_hw(hbm_gb=32)))
        cfg = sel.select(rep)
        assert cfg.preset == "archive"

    def test_noise_triggers_denoise(self):
        from framewright_tpu.processors.analysis import (
            AnalysisReport,
            DegradationType,
            FrameStats,
        )

        rep = AnalysisReport(quality_score=85.0,
                             degradations=[DegradationType.NOISE],
                             stats=FrameStats(noise=0.4))
        cfg = SmartPresetSelector(PresetRegistry(_hw())).select(rep)
        assert cfg.denoise


class TestNLP:
    def test_vhs_phrase_routes_to_recipe(self):
        cmd = parse_command("please restore my old VHS tape recording.mp4")
        assert cmd.recipe == "vhs_family_video"
        assert cmd.source == "recording.mp4"

    def test_scale_and_fps(self):
        cmd = parse_command("upscale 4x and interpolate to 60fps")
        assert cmd.overrides["scale_factor"] == 4
        assert cmd.overrides["target_fps"] == 60.0
        assert cmd.overrides["interpolation"] is True

    def test_colorize_and_faces(self):
        cmd = parse_command("colorize this black and white film and fix faces")
        assert cmd.overrides["colorize"] is True
        assert cmd.overrides["face_restore"] is True

    def test_grain_preserve_beats_denoise(self):
        cmd = parse_command("clean it up but preserve the film grain")
        assert cmd.overrides.get("grain_preserve") is True

    def test_build_config(self):
        cfg, cmd = build_config_from_text(
            "quick 2x upscale of video.y4m with denoising")
        assert isinstance(cfg, Config)
        assert cfg.scale_factor == 2
        assert cfg.sr_model == "RealESRGAN_x2plus"
        assert cfg.denoise
        assert cmd.describe().startswith("plan:")

    def test_anime(self):
        cfg, _ = build_config_from_text("remaster this anime series")
        assert cfg.sr_model == "RealESRGAN_x4plus_anime_6B"


class TestRound2NLPRules:
    def test_hdr10plus(self):
        from framewright_tpu.nlp import parse_command

        cmd = parse_command("restore movie.y4m with hdr10+ output")
        assert cmd.overrides["hdr_output"] == "hdr10plus"

    def test_deblock(self):
        from framewright_tpu.nlp import parse_command

        cmd = parse_command("remove the compression artifacts from dvd.y4m")
        assert cmd.overrides["qp_removal"] is True

    def test_codeformer(self):
        from framewright_tpu.nlp import parse_command

        cmd = parse_command("fix faces with codeformer in old.y4m")
        assert cmd.overrides["face_model"] == "codeformer"
        assert cmd.overrides["face_restore"] is True

    def test_scene_adaptive_and_raft(self):
        from framewright_tpu.nlp import parse_command

        cmd = parse_command("scene-aware restore with accurate flow")
        assert cmd.overrides["scene_adaptive"] is True
        assert cmd.overrides["flow_model"] == "raft"
