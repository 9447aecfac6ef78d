"""Processor tests: dedup, scene detection, SR (tiny model on CPU)."""

import numpy as np
import pytest

from framewright_tpu.ops import dhash
from framewright_tpu.processors.deduplication import DedupConfig, FrameDeduplicator
from framewright_tpu.processors.scene_detection import SceneConfig, SceneDetector
from framewright_tpu.processors.super_resolution import SRConfig, SuperResolution


class TestDHash:
    def test_identical_frames_similarity_1(self, gradient_frame):
        f = gradient_frame(48, 64, 1)
        h = dhash.dhash_batch(np.stack([f, f]))
        assert dhash.hamming_similarity(h[0:1], h[1:2])[0] == 1.0

    def test_different_frames_lower_similarity(self, rng):
        a = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        b = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        h = dhash.dhash_batch(np.stack([a, b]))
        assert dhash.hamming_similarity(h[0:1], h[1:2])[0] < 0.9

    def test_robust_to_small_noise(self, gradient_frame, rng):
        f = gradient_frame(64, 64, 2).astype(np.int16)
        noisy = np.clip(f + rng.integers(-2, 3, f.shape), 0, 255).astype(np.uint8)
        h = dhash.dhash_batch(np.stack([f.astype(np.uint8), noisy]))
        assert dhash.hamming_similarity(h[0:1], h[1:2])[0] >= 0.9

    def test_hash_size_parameter(self, gradient_frame):
        f = gradient_frame(48, 64, 1)
        assert dhash.dhash_batch(f[None], hash_size=16).shape == (1, 256)


class TestDedup:
    def _clip_with_dups(self, gradient_frame):
        # 18fps content padded to 24fps: every 4th frame repeats
        frames = []
        for t in range(24):
            src_t = (t * 3) // 4  # 18/24 pulldown
            frames.append(gradient_frame(48, 64, src_t))
        return frames

    def test_detects_pulldown_duplicates(self, gradient_frame):
        frames = self._clip_with_dups(gradient_frame)
        res = FrameDeduplicator().analyze(iter(frames), target_fps=24.0)
        assert res.total_frames == 24
        assert res.unique_frames == 18
        assert res.duplicates == 6
        assert abs(res.estimated_source_fps - 18.0) < 0.1

    def test_mapping_reconstructs_order(self, gradient_frame):
        frames = self._clip_with_dups(gradient_frame)
        res = FrameDeduplicator().analyze(iter(frames), target_fps=24.0)
        order = FrameDeduplicator.reconstruct_order(res)
        assert len(order) == 24
        assert order[0] == 0
        assert max(order) == res.unique_frames - 1
        assert order == sorted(order)  # non-decreasing

    def test_no_dups_all_unique(self, gradient_frame):
        frames = [gradient_frame(48, 64, t) for t in range(10)]
        res = FrameDeduplicator().analyze(iter(frames))
        assert res.unique_frames == 10
        assert res.duplicates == 0

    def test_threshold_configurable(self, gradient_frame):
        f = gradient_frame(48, 64, 1)
        frames = [f, f, f]
        strict = FrameDeduplicator(DedupConfig(similarity_threshold=1.01))
        assert strict.analyze(iter(frames)).unique_frames == 3


class TestSceneDetection:
    def test_detects_hard_cut(self, rng):
        a = np.full((16, 48, 64, 3), 40, np.uint8)
        b = np.full((16, 48, 64, 3), 215, np.uint8)
        frames = list(a) + list(b)
        res = SceneDetector(SceneConfig(threshold=0.3, min_scene_len=4)).analyze(iter(frames))
        assert res.boundaries == [16]
        assert res.scene_ranges() == [(0, 16), (16, 32)]

    def test_no_cut_on_static(self, gradient_frame):
        frames = [gradient_frame(48, 64, 0)] * 20
        res = SceneDetector().analyze(iter(frames))
        assert res.boundaries == []

    def test_min_scene_len_suppresses(self):
        # alternate black/white every frame: only cuts >= min_scene_len apart
        frames = [np.full((32, 32, 3), 255 * (t % 2), np.uint8) for t in range(20)]
        res = SceneDetector(SceneConfig(threshold=0.3, min_scene_len=8)).analyze(iter(frames))
        for i in range(1, len(res.boundaries)):
            assert res.boundaries[i] - res.boundaries[i - 1] >= 8

    def test_pairwise_gate(self):
        a = np.full((32, 32, 3), 0, np.uint8)
        b = np.full((32, 32, 3), 250, np.uint8)
        assert SceneDetector.is_scene_change(a, b)
        assert not SceneDetector.is_scene_change(a, a)


class TestSuperResolution:
    def test_tiny_model_batch(self, rng, tmp_path):
        sr = SuperResolution(SRConfig(
            model_name="realesr-animevideov3",  # smallest family
            compute_dtype="float32",
            weights_dir=str(tmp_path),
            batch_size=2,
        ))
        sr.setup(24, 32)
        frames = rng.integers(0, 256, (3, 24, 32, 3), dtype=np.uint8)
        out = sr.process_batch(frames)
        assert out.shape == (3, 96, 128, 3)
        assert out.dtype == np.uint8

    def test_process_video_streaming(self, rng, tmp_path):
        sr = SuperResolution(SRConfig(
            model_name="realesr-animevideov3",
            compute_dtype="float32",
            weights_dir=str(tmp_path),
        ))
        frames = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8) for _ in range(5)]
        outs = list(sr.process_video(iter(frames), batch_size=2))
        assert len(outs) == 5
        assert outs[0].shape == (64, 96, 3)

    def test_output_size_with_outscale(self, tmp_path):
        sr = SuperResolution(SRConfig(
            model_name="realesr-animevideov3", outscale=2.0,
            weights_dir=str(tmp_path), compute_dtype="float32",
        ))
        sr.scale = 4
        assert sr.output_size(10, 20) == (20, 40)
