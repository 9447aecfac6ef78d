"""CLI surface tests (analog of reference tests/integration/
test_cli_commands.py): run verbs through main() in-process."""

import json

import numpy as np
import pytest

from framewright_tpu.cli import main
from framewright_tpu.io.y4m import Y4MWriter


@pytest.fixture(autouse=True)
def _weights(tmp_path, monkeypatch):
    monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))


def _clip(tmp_path, gradient_frame, n=8):
    src = tmp_path / "clip.y4m"
    with Y4MWriter(src, 64, 48, fps=12) as w:
        for t in range(n):
            w.write_frame(gradient_frame(48, 64, t))
    return src


class TestInfoVerbs:
    def test_presets(self, capsys):
        assert main(["presets"]) == 0
        assert "fast" in capsys.readouterr().out

    def test_models(self, capsys):
        assert main(["models"]) == 0
        assert "RealESRGAN_x2plus" in capsys.readouterr().out

    def test_recipes(self, capsys):
        assert main(["recipes"]) == 0
        assert "vhs_family_video" in capsys.readouterr().out

    def test_export_presets(self, capsys):
        assert main(["export-presets"]) == 0
        assert "youtube" in capsys.readouterr().out

    def test_check(self, capsys):
        assert main(["check"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert "platform" in out

    def test_help_when_bare(self, capsys):
        assert main([]) == 0


class TestProbeAnalyze:
    def test_probe(self, tmp_path, gradient_frame, capsys):
        src = _clip(tmp_path, gradient_frame)
        assert main(["probe", str(src)]) == 0
        meta = json.loads(capsys.readouterr().out)
        assert meta["frames"] == 8

    def test_analyze(self, tmp_path, gradient_frame, capsys):
        src = _clip(tmp_path, gradient_frame)
        assert main(["analyze", str(src)]) == 0
        rep = json.loads(capsys.readouterr().out)
        assert rep["frames"] == 8


class TestRestoreVerbs:
    def test_restore_default_command_sugar(self, tmp_path, gradient_frame, capsys):
        src = _clip(tmp_path, gradient_frame)
        out = tmp_path / "o.y4m"
        rc = main([str(src), "-o", str(out), "--model", "realesr-animevideov3",
                   "--dtype", "float32", "--device", "cpu", "--no-validate",
                   "--project-dir", str(tmp_path / "proj")])
        assert rc == 0
        assert out.exists()
        summary = json.loads(capsys.readouterr().out)
        assert summary["frames"] == 8

    def test_models_guide(self, capsys):
        from framewright_tpu.models.registry import MODEL_GUIDE, MODEL_SPECS

        assert set(MODEL_GUIDE) <= set(MODEL_SPECS)
        rc = main(["models", "guide"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "realesr-animevideov3" in out and "Anime" in out

    def test_one_word_quick_verb(self, tmp_path, gradient_frame, capsys):
        """`framewright quick video.y4m` — the reference cli_simple.py
        zero-flag verbs (quick/best/archive) pin a preset on restore."""
        src = _clip(tmp_path, gradient_frame)
        out = tmp_path / "q.y4m"
        rc = main(["quick", str(src), "-o", str(out),
                   "--device", "cpu", "--no-validate",
                   "--project-dir", str(tmp_path / "proj")])
        assert rc == 0
        assert out.exists()
        summary = json.loads(capsys.readouterr().out)
        assert summary["frames"] == 8

    def test_one_word_verbs_registered(self):
        from framewright_tpu.cli import KNOWN_VERBS, build_parser

        parser = build_parser()
        for verb in ("quick", "best", "archive"):
            assert verb in KNOWN_VERBS
            args = parser.parse_args([verb, "x.y4m"])
            assert args.preset in ("fast", "ultimate", "archive")

    def test_do_dry_run(self, tmp_path, gradient_frame, capsys):
        src = _clip(tmp_path, gradient_frame)
        rc = main(["do", f"fast 2x upscale of {src}", "--dry-run",
                   "--project-dir", str(tmp_path / "p")])
        assert rc == 0
        cfg = json.loads(capsys.readouterr().out)
        assert cfg["scale_factor"] == 2

    def test_do_without_source_errors(self, capsys):
        rc = main(["do", "make it pretty", "--dry-run"])
        assert rc == 1

    def test_missing_input_exit_code(self, tmp_path):
        rc = main(["restore", str(tmp_path / "nope.y4m"),
                   "--project-dir", str(tmp_path / "p")])
        assert rc == 1


class TestBatchVerbs:
    def test_submit_and_list(self, tmp_path, capsys):
        db = str(tmp_path / "jobs.db")
        assert main(["batch", "submit", "a.y4m", "--db", db]) == 0
        jid = capsys.readouterr().out.strip()
        assert main(["batch", "list", "--db", db]) == 0
        assert jid in capsys.readouterr().out

    def test_qa_report(self, tmp_path, capsys):
        rep = tmp_path / "r.html"
        assert main(["qa-report", "src.y4m", "--report", str(rep)]) == 0
        assert rep.exists()

    def test_audio_verb(self, tmp_path, capsys):
        from framewright_tpu.audio import write_wav

        t = np.arange(8000) / 8000
        x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        write_wav(tmp_path / "in.wav", x, 8000)
        rc = main(["audio", str(tmp_path / "in.wav"), str(tmp_path / "out.wav")])
        assert rc == 0
        assert (tmp_path / "out.wav").exists()


class TestProfileFlags:
    def test_save_and_use_profile(self, tmp_path, gradient_frame, monkeypatch, capsys):
        monkeypatch.setenv("FRAMEWRIGHT_PROFILES_DIR", str(tmp_path / "profiles"))
        src = _clip(tmp_path, gradient_frame)
        rc = main([str(src), "--dry-run", "--crf", "12", "--scale", "1",
                   "--model", "none", "--save-profile", "lowcrf",
                   "--project-dir", str(tmp_path / "p1")])
        assert rc == 0
        capsys.readouterr()
        # reuse the profile; crf should come from it
        rc = main([str(src), "--dry-run", "--profile", "lowcrf",
                   "--project-dir", str(tmp_path / "p2")])
        assert rc == 0
        from framewright_tpu.profiles import load_profile

        assert load_profile("lowcrf").crf == 12


class TestModelsVerbs:
    def test_models_port(self, tmp_path, monkeypatch, capsys):
        torch = pytest.importorskip("torch")
        monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
        import sys as _sys

        _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from test_models import TorchSRVGG

        (tmp_path / "w").mkdir()
        tm = TorchSRVGG(num_conv=16, upscale=4)
        torch.save({"params": tm.state_dict()},
                   tmp_path / "w" / "realesr-animevideov3.pth")
        rc = main(["models", "port", "realesr-animevideov3"])
        assert rc == 0
        assert (tmp_path / "w" / "realesr-animevideov3.npz").exists()
        capsys.readouterr()
        rc = main(["models", "list"])
        assert "cached" in capsys.readouterr().out
