"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no TPU needed), mirroring the
reference's CI posture of running everything with external GPUs mocked
out (reference tests/conftest.py:92-130). Set platform env BEFORE jax
is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_gradient_frame(h: int, w: int, t: int = 0) -> np.ndarray:
    """Deterministic synthetic frame: gradients + frame-index pattern.

    Analog of the reference's synthetic PNG fixtures which embed a frame
    number bit pattern (reference tests/fixtures/conftest.py:15-73).
    """
    yy = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    xx = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    r = np.broadcast_to(yy, (h, w))
    g = np.broadcast_to(xx, (h, w))
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
