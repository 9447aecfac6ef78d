"""Config system tests (parity with reference tests/test_config.py scope)."""

import pytest

from framewright_tpu.config import PRESETS, Config, build_config, get_preset
from framewright_tpu.errors import ConfigError


class TestConfigDefaults:
    def test_defaults_valid(self, tmp_path):
        cfg = Config(project_dir=tmp_path)
        assert cfg.scale_factor == 2
        assert cfg.compute_dtype == "bfloat16"
        assert cfg.frames_dir == tmp_path / "work" / "frames"
        assert cfg.checkpoint_dir == tmp_path / "checkpoints"

    def test_quality_gates_match_reference(self):
        cfg = Config()
        assert cfg.min_ssim == 0.85
        assert cfg.min_psnr == 25.0


class TestValidation:
    @pytest.mark.parametrize(
        "kw",
        [
            {"scale_factor": 5},
            {"scale_factor": 0},
            {"compute_dtype": "fp64"},
            {"hbm_utilization": 0.0},
            {"hbm_utilization": 1.5},
            {"dedup_similarity": 1.5},
            {"tile_size": 100},
            {"tile_size": -8},
            {"temporal_window": 4},
            {"crf": 99},
            {"checkpoint_interval": 0},
            {"interpolation_passes": 4},
            {"sr_model": "nonexistent"},
            {"denoise_model": "magic"},
            {"sharding_strategy": "ring"},
            {"mesh_shape": (0, 2)},
            {"target_fps": -1},
        ],
    )
    def test_rejects_bad_values(self, kw):
        with pytest.raises(ConfigError):
            Config(**kw)

    def test_tile_size_multiple_of_8_ok(self):
        assert Config(tile_size=256).tile_size == 256
        assert Config(tile_size=0).tile_size == 0


class TestPresets:
    def test_all_presets_construct(self):
        for name in PRESETS:
            cfg = Config.from_preset(name)
            assert cfg.preset == name

    def test_unknown_preset(self):
        with pytest.raises(ConfigError):
            get_preset("warp9")

    def test_preset_override(self):
        cfg = Config.from_preset("fast", crf=30)
        assert cfg.crf == 30
        assert cfg.sr_model == "FW_fastvgg_x2"


class TestSerialization:
    def test_roundtrip(self, tmp_path):
        cfg = Config(project_dir=tmp_path, scale_factor=4,
                     sr_model="RealESRGAN_x4plus", mesh_shape=(2, 4))
        d = cfg.to_dict()
        cfg2 = Config.from_dict(d)
        assert cfg2.to_dict() == d
        assert cfg2.mesh_shape == (2, 4)

    def test_json_and_yaml_files(self, tmp_path):
        cfg = Config(scale_factor=4, sr_model="RealESRGAN_x4plus")
        for name in ("c.json", "c.yaml"):
            p = tmp_path / name
            cfg.save(p)
            loaded = Config.load(p)
            assert loaded.scale_factor == 4
            assert loaded.sr_model == "RealESRGAN_x4plus"

    def test_derived_fields_not_serialized(self):
        assert "frames_dir" not in Config().to_dict()


class TestHash:
    def test_hash_stable(self):
        assert Config(scale_factor=2).get_hash() == Config(scale_factor=2).get_hash()

    def test_hash_changes_with_pixels_affecting_flags(self):
        assert Config(scale_factor=2).get_hash() != Config(scale_factor=4).get_hash()
        assert Config(denoise=True).get_hash() != Config(denoise=False).get_hash()

    def test_hash_ignores_cosmetic_flags(self):
        a = Config(verbose=True, checkpoint_interval=10)
        b = Config(verbose=False, checkpoint_interval=99)
        assert a.get_hash() == b.get_hash()


class TestEnvAndLayering:
    def test_env_overrides(self):
        env = {
            "FRAMEWRIGHT_SCALE_FACTOR": "4",
            "FRAMEWRIGHT_DENOISE": "true",
            "FRAMEWRIGHT_CRF": "10",
            "FRAMEWRIGHT_MESH_SHAPE": "2,4",
            "FRAMEWRIGHT_NOT_A_FLAG": "x",
            "UNRELATED": "y",
        }
        ov = Config.env_overrides(env)
        assert ov == {"scale_factor": 4, "denoise": True, "crf": 10,
                      "mesh_shape": (2, 4)}

    def test_bad_env_value(self):
        with pytest.raises(ConfigError):
            Config.env_overrides({"FRAMEWRIGHT_CRF": "abc"})

    def test_layering_cli_beats_env_beats_preset(self):
        cfg = build_config(
            preset="fast",
            cli_overrides={"crf": 11, "denoise": None},
            environ={"FRAMEWRIGHT_CRF": "20", "FRAMEWRIGHT_SCALE_FACTOR": "4"},
        )
        assert cfg.crf == 11            # CLI wins
        assert cfg.scale_factor == 4    # env beats preset
        assert cfg.sr_model == "FW_fastvgg_x2"  # from preset
