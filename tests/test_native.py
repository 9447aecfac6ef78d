"""Native fwcore kernels: build, correctness vs numpy, fallback."""

import numpy as np
import pytest

from framewright_tpu import native
from framewright_tpu.io import color
from framewright_tpu.ops import dhash as pydhash


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestBuild:
    def test_builds_and_loads(self, lib):
        assert lib.fwcore_version() >= 1

    def test_env_disable(self, monkeypatch):
        # the wrapper must run pure-numpy when disabled
        monkeypatch.setenv("FRAMEWRIGHT_NO_NATIVE", "1")
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", False)
        rgb = np.random.default_rng(0).integers(0, 256, (16, 16, 3), np.uint8)
        y, u, v = native.rgb_to_yuv420(rgb, full_range=True)
        assert y.shape == (16, 16)
        monkeypatch.setattr(native, "_TRIED", False)


class TestColorParity:
    @pytest.mark.parametrize("full_range", [True, False])
    def test_yuv_to_rgb_matches_numpy(self, lib, rng, full_range):
        h, w = 48, 64
        y = rng.integers(0, 256, (h, w), np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
        a = native.yuv420_to_rgb(y, u, v, full_range=full_range)
        b = color.yuv420_to_rgb(y, u, v, full_range=full_range)
        # fixed-point vs float: tiny rounding differences allowed
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 3
        assert np.abs(a.astype(float) - b.astype(float)).mean() < 0.5

    @pytest.mark.parametrize("full_range", [True, False])
    def test_rgb_to_yuv_matches_numpy(self, lib, rng, full_range):
        rgb = rng.integers(0, 256, (48, 64, 3), np.uint8)
        ya, ua, va = native.rgb_to_yuv420(rgb, full_range=full_range)
        yb, ub, vb = color.rgb_to_yuv420(rgb, full_range=full_range)
        assert np.abs(ya.astype(int) - yb.astype(int)).max() <= 2
        assert np.abs(ua.astype(int) - ub.astype(int)).max() <= 2
        assert np.abs(va.astype(int) - vb.astype(int)).max() <= 2

    def test_roundtrip_stability(self, lib, rng):
        rgb = rng.integers(0, 256, (64, 64, 3), np.uint8)
        y, u, v = native.rgb_to_yuv420(rgb, full_range=True)
        back = native.yuv420_to_rgb(y, u, v, full_range=True)
        y2, _, _ = native.rgb_to_yuv420(back, full_range=True)
        assert np.abs(y2.astype(int) - y.astype(int)).mean() < 2


class TestDHashParity:
    def test_identical_frames_same_hash(self, lib, gradient_frame):
        f = gradient_frame(48, 64, 3)
        bits = native.dhash_batch(np.stack([f, f]))
        np.testing.assert_array_equal(bits[0], bits[1])

    def test_close_to_python_hash(self, lib, gradient_frame):
        frames = np.stack([gradient_frame(48, 64, t) for t in range(4)])
        a = native.dhash_batch(frames)
        b = pydhash.dhash_batch(frames)
        # different area-resize rounding: allow a few boundary bits
        agreement = (a == b).mean()
        assert agreement > 0.9

    def test_duplicate_detection_equivalent(self, lib, gradient_frame):
        # the dedup decision (same/different) must match python's
        f0 = gradient_frame(48, 64, 0)
        f1 = gradient_frame(48, 64, 1)
        bits = native.dhash_batch(np.stack([f0, f0, f1]))
        same = pydhash.hamming_similarity(bits[0:1], bits[1:2])[0]
        diff = pydhash.hamming_similarity(bits[0:1], bits[2:3])[0]
        assert same == 1.0
        assert diff < 0.98


class TestPerf:
    def test_native_faster_than_numpy_1080p(self, lib, rng):
        import time

        rgb = rng.integers(0, 256, (1080, 1920, 3), np.uint8)
        t0 = time.time()
        for _ in range(3):
            native.rgb_to_yuv420(rgb, full_range=True)
        t_native = (time.time() - t0) / 3
        t0 = time.time()
        for _ in range(3):
            color.rgb_to_yuv420(rgb, full_range=True)
        t_numpy = (time.time() - t0) / 3
        assert t_native < t_numpy  # typically 5-20x faster
