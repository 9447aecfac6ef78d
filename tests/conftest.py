"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no TPU needed), mirroring the
reference's CI posture of running everything with external GPUs mocked
out (reference tests/conftest.py:92-130). Set platform env BEFORE jax
is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Interpret-mode kernel tests run at S=64 (the production default is a
# larger block tuned for v5e VMEM; the kernel logic is S-parametric and
# a slow cross-S test covers the production block size)
os.environ.setdefault("FW_RDB_S", "64")
os.environ.setdefault("FW_TAIL2_S", "32")   # small interpret-mode blocks
# Fused SRVGG chain: small blocks for interpret-mode tests (production
# default S=112 is a v5e VMEM tuning; the kernel is S-parametric)
os.environ.setdefault("FW_VGG_S", "48")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

_TEXTURE_CACHE: dict = {}
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers (reference gates heavy tests with markers, pyproject.toml:196):
# everything matching a pattern below is marked `slow` — model-forward and
# full-pipeline tests dominated by CPU conv time. Default CI tier:
#   pytest -m "not slow"   (< 3 min)
# Full suite: plain pytest.
# ---------------------------------------------------------------------------

_SLOW_PATTERNS = (
    "test_vsr.py",                  # recurrent VSR forwards (14-60 s each)
    "test_hat.py",
    "test_restormer_hdr.py::TestRestormer",
    "test_restoration_stack.py::TestGFPGAN",
    "test_restoration_stack.py::TestECCV16",
    "test_restoration_stack.py::TestWatermarkRemoval",
    "test_restoration_stack.py::TestLamaModel",
    "test_restoration_stack.py::TestColorize::test_palette_colorizes_bw",
    "test_restorer.py::TestFullRecipeStages",
    "test_restorer.py::TestInterpolationStage",
    "test_restorer.py::TestDenoiseStage",
    "test_restorer.py::TestCheckpointResume",
    "test_restorer.py::TestRestoreEndToEnd::test_validation_report",
    "test_denoise.py::TestFlickerReducer::test_restormer_method_runs",
    "test_denoise.py::TestNAFNet",
    "test_denoise.py::TestTemporalDenoiser",
    "test_project_testing.py::TestEnsemble::test_scale_mismatch_rejected",
    "test_tiling_planner.py::TestTiling::test_rrdb_tiled_exact",
    "test_interpolation.py::TestIFNet::test_shapes_and_range",
    "test_interpolation.py::TestInterpolator::test_doubles_frame_count",
    "test_diffusion.py::test_registry_and_processor",
    "test_periphery.py::TestBenchmarks::test_tiny_suite_runs",
    "test_fused_rrdb.py::TestApplyFast",
    "test_manifests.py::TestHATManifest",
    "test_manifests.py::TestGFPGANManifest",
    "test_cloud.py::TestFarmLive",
    "test_restorer.py::TestDeviceStatsValidation",
    "test_cli.py::TestRestoreVerbs::test_restore_default_command_sugar",
    "test_stabilization.py::TestRestorerWiring::test_dedup_interpolates",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(p in item.nodeid for p in _SLOW_PATTERNS):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_gradient_frame(h: int, w: int, t: int = 0) -> np.ndarray:
    """Deterministic synthetic frame: gradients + frame-index pattern.

    Analog of the reference's synthetic PNG fixtures which embed a frame
    number bit pattern (reference tests/fixtures/conftest.py:15-73).
    """
    # a fixed random texture panning 3 px/frame: consecutive frames
    # differ structurally everywhere (a uniform brightness change would
    # be invisible to difference hashes and flow estimators)
    key = (h, w)
    tex = _TEXTURE_CACHE.get(key)
    if tex is None:
        tex_rng = np.random.default_rng(42)
        base = tex_rng.integers(0, 256, (h, w * 2), dtype=np.uint8).astype(np.float32)
        # smooth slightly so it's image-like, not white noise
        tex = (base + np.roll(base, 1, 1) + np.roll(base, 1, 0) +
               np.roll(base, (1, 1), (0, 1))) / 4.0
        _TEXTURE_CACHE[key] = tex
    shift = (t * 3) % w
    r = tex[:, shift:shift + w]
    g = tex[:, w - 1 - shift:w - 1 - shift + w][:, ::-1]
    b = np.full((h, w), (t * 37) % 256, dtype=np.float32)
    frame = np.stack([r, g, b], axis=-1).astype(np.uint8)
    # frame-index bit pattern in the top-left 8x8 corner blocks
    for bit in range(8):
        v = 255 if (t >> bit) & 1 else 0
        x0 = bit * 8
        if x0 + 8 <= w:
            frame[0:8, x0:x0 + 8, :] = v
    return frame


@pytest.fixture
def gradient_frame():
    return make_gradient_frame


@pytest.fixture
def tiny_clip():
    """16 frames of 64x48 synthetic video as a (T, H, W, 3) array."""
    return np.stack([make_gradient_frame(48, 64, t) for t in range(16)])


@pytest.fixture
def tiny_y4m(tmp_path, tiny_clip):
    """Write the tiny clip as a .y4m file and return its path."""
    from framewright_tpu.io.y4m import Y4MWriter

    path = tmp_path / "tiny.y4m"
    with Y4MWriter(path, width=64, height=48, fps=25) as w:
        for f in tiny_clip:
            w.write_frame(f)
    return path
