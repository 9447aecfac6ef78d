"""Project manager, A/B testing, ensemble SR tests."""

import numpy as np
import pytest

from framewright_tpu.config import Config
from framewright_tpu.io.y4m import Y4MWriter
from framewright_tpu.project import Project, list_projects
from framewright_tpu.testing import ABTestRunner, ABVariant, EnsembleSR


@pytest.fixture(autouse=True)
def _weights(tmp_path, monkeypatch):
    monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))


def _clip(tmp_path, gradient_frame, n=6):
    src = tmp_path / "clip.y4m"
    with Y4MWriter(src, 64, 48, fps=12) as w:
        for t in range(n):
            w.write_frame(gradient_frame(48, 64, t))
    return src


class TestProject:
    def test_versioned_restores(self, tmp_path, gradient_frame):
        src = _clip(tmp_path, gradient_frame)
        proj = Project(tmp_path / "projects", "My Film").init(src)
        cfg = Config(scale_factor=1, sr_model="none", validate_output=True,
                     min_psnr=0.0, min_ssim=0.0)
        rec1, _ = proj.restore(cfg, notes="first pass")
        rec2, _ = proj.restore(cfg.with_overrides(temporal_consistency=True),
                               notes="with flicker fix")
        assert rec1.version == 1 and rec2.version == 2
        assert (tmp_path / "projects" / "My_Film" / "v2" / "restored.y4m").exists()
        # reload from disk
        proj2 = Project(tmp_path / "projects", "My Film")
        assert len(proj2.versions) == 2
        table = proj2.compare()
        assert table[1]["notes"] == "with flicker fix"
        assert list_projects(tmp_path / "projects") == ["My_Film"]


class TestAB:
    def test_variants_scored_and_winner(self, tmp_path, gradient_frame):
        src = _clip(tmp_path, gradient_frame)
        base = Config(scale_factor=1, sr_model="none", min_psnr=0, min_ssim=0)
        runner = ABTestRunner(base, tmp_path / "ab")
        results = runner.run(src, [
            ABVariant("plain", {}),
            ABVariant("flicker", {"temporal_consistency": True}),
        ])
        assert len(results) == 2
        assert all(r.psnr > 0 for r in results)
        best = ABTestRunner.winner(results)
        assert best.variant in ("plain", "flicker")


class TestEnsemble:
    def test_median_ensemble(self, tmp_path, rng):
        ens = EnsembleSR(["realesr-animevideov3", "realesr-general-x4v3"],
                         strategy="median", weights_dir=str(tmp_path / "w"))
        ens.setup(16, 16)
        frames = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
        out = ens.process_batch(frames)
        assert out.shape == (2, 64, 64, 3)

    def test_scale_mismatch_rejected(self, tmp_path):
        from framewright_tpu.errors import ConfigError

        ens = EnsembleSR(["realesr-animevideov3", "RealESRGAN_x2plus"],
                         weights_dir=str(tmp_path / "w"))
        with pytest.raises(ConfigError):
            ens.setup(16, 16)

    def test_output_size_and_teardown(self, tmp_path):
        ens = EnsembleSR(["realesr-animevideov3"],
                         weights_dir=str(tmp_path / "w"))
        ens.setup(16, 16)
        assert ens.output_size(16, 16) == (64, 64)
        ens.teardown()

    def test_config_wiring(self):
        from framewright_tpu.config import Config
        from framewright_tpu.errors import ConfigError

        cfg = Config(sr_ensemble="realesr-general-x4v3, realesr-animevideov3")
        assert cfg.ensemble_models() == [
            "realesr-general-x4v3", "realesr-animevideov3"]
        with pytest.raises(ConfigError):
            Config(sr_ensemble="not-a-model")
        with pytest.raises(ConfigError):
            Config(ensemble_strategy="vote")
