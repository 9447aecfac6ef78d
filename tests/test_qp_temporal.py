"""QP artifact removal + cross-frame attention temporal consistency
(reference qp_artifact_removal.py:181, cross_attention_temporal.py:262)."""

import numpy as np
import pytest

from framewright_tpu.processors.qp_removal import (
    QPArtifactRemover,
    QPRemovalConfig,
    _dct_matrix,
    estimate_blockiness,
)
from framewright_tpu.processors.temporal_attention import (
    CFAConfig,
    CrossFrameAttention,
)


def _smooth_texture(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(np.float32)
    for _ in range(3):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                + np.roll(base, (1, 1), (0, 1))) / 4
    return base


def _quantize_dct(img: np.ndarray, q: float) -> np.ndarray:
    """Simulate codec blocking: quantize 8x8 DCT coefficients."""
    h, w = img.shape
    d = _dct_matrix(8)
    blocks = img.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,bcjk,lk->bcil", d, blocks, d)
    coef = np.round(coef / q) * q
    out = np.einsum("ji,bcjk,kl->bcil", d, coef, d)
    return out.transpose(0, 2, 1, 3).reshape(h, w)


def _psnr(a, b):
    m = np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2)
    return 10 * np.log10(255.0 ** 2 / m)


class TestQPRemoval:
    def test_blockiness_detects_quantization(self):
        clean = _smooth_texture(96, 128)
        blocky = _quantize_dct(clean, 24.0)
        c3 = np.clip(np.stack([clean] * 3, -1), 0, 255).astype(np.uint8)
        b3 = np.clip(np.stack([blocky] * 3, -1), 0, 255).astype(np.uint8)
        assert estimate_blockiness(b3) > estimate_blockiness(c3) + 0.05

    def test_deblocking_improves_psnr(self):
        clean = _smooth_texture(96, 128)
        c3 = np.clip(np.stack([clean] * 3, -1), 0, 255).astype(np.uint8)
        for q in (24.0, 40.0):
            blocky = _quantize_dct(clean, q)
            b3 = np.clip(np.stack([blocky] * 3, -1), 0, 255).astype(np.uint8)
            out = QPArtifactRemover().process_batch(b3[None])[0]
            assert out.shape == b3.shape and out.dtype == np.uint8
            assert _psnr(out, c3) > _psnr(b3, c3), f"q={q}"

    def test_clean_frame_untouched(self):
        """Auto mode must not filter frames with no visible grid."""
        clean = _smooth_texture(64, 96, seed=3)
        c3 = np.clip(np.stack([clean] * 3, -1), 0, 255).astype(np.uint8)
        out = QPArtifactRemover().process_batch(c3[None])[0]
        assert np.array_equal(out, c3)

    def test_stream_and_odd_sizes(self):
        frames = [np.clip(np.stack([_smooth_texture(50, 70, seed=t)] * 3, -1),
                          0, 255).astype(np.uint8) for t in range(5)]
        rem = QPArtifactRemover(QPRemovalConfig(strength=3.0, shifts=2))
        out = list(rem.process_stream(iter(frames), batch=2))
        assert len(out) == 5
        assert out[0].shape == (50, 70, 3)


class TestCrossFrameAttention:
    def _clip(self, n=12, flicker=12.0, noise=4.0, seed=0):
        rng = np.random.default_rng(seed)
        base = _smooth_texture(64, 96, seed=1)
        frames = []
        for t in range(n):
            f = np.clip(base + flicker * np.sin(t * 2.5)
                        + rng.normal(0, noise, base.shape), 0, 255)
            f3 = np.stack([f] * 3, -1)
            x = 8 + t * 4
            f3[20:36, x:x + 12] = 250       # moving bright square
            frames.append(f3.astype(np.uint8))
        return frames

    def test_reduces_flicker_and_noise(self):
        frames = self._clip()
        cfa = CrossFrameAttention(CFAConfig(radius=1, sigma=8.0))
        out = list(cfa.reduce_stream(iter(frames)))
        assert len(out) == len(frames)
        bg_in = np.asarray([f[48:, :, 0].mean() for f in frames])
        bg_out = np.asarray([f[48:, :, 0].mean() for f in out])
        assert bg_out.std() < bg_in.std() * 0.5
        nv_in = np.stack([f[48:, :, 0].astype(np.float32)
                          for f in frames]).std(0).mean()
        nv_out = np.stack([f[48:, :, 0].astype(np.float32)
                           for f in out]).std(0).mean()
        assert nv_out < nv_in * 0.6

    def test_motion_not_ghosted(self):
        frames = self._clip()
        cfa = CrossFrameAttention(CFAConfig(radius=1, sigma=8.0))
        out = list(cfa.reduce_stream(iter(frames)))
        # the moving square must stay bright and sharp in every frame
        for t in range(2, 10):
            x = 8 + t * 4
            assert out[t][22:34, x + 2:x + 10].mean() > 215

    def test_short_clip_and_counts(self):
        frames = self._clip(n=2)
        out = list(CrossFrameAttention(CFAConfig(radius=2))
                   .reduce_stream(iter(frames)))
        assert len(out) == 2
        out1 = list(CrossFrameAttention(CFAConfig(radius=1))
                    .reduce_stream(iter(frames[:1])))
        assert len(out1) == 1


class TestRestorerWiring:
    def test_qp_and_attention_reachable(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
        from framewright_tpu.config import Config
        from framewright_tpu.io.y4m import Y4MReader, Y4MWriter
        from framewright_tpu.restorer import VideoRestorer

        clean = _smooth_texture(48, 64)
        src = tmp_path / "in.y4m"
        with Y4MWriter(src, 64, 48, fps=24) as w:
            for t in range(8):
                blocky = _quantize_dct(clean + 8 * np.sin(t * 2.5), 30.0)
                w.write_frame(np.clip(np.stack([blocky] * 3, -1),
                                      0, 255).astype(np.uint8))
        out = tmp_path / "out.y4m"
        cfg = Config(project_dir=tmp_path / "p", scale_factor=1,
                     qp_removal=True, temporal_consistency=True,
                     temporal_model="attention", validate_output=False,
                     checkpoint_enabled=False, device_platform="cpu")
        VideoRestorer(cfg).restore_video(src, out)
        with Y4MReader(out) as r:
            got = [f.copy() for f in r]
        assert len(got) == 8


class TestVMAFProxy:
    """VMAF-class perceptual gate (reference quality/vmaf.py:133)."""

    def _clip(self, n=4):
        base = _smooth_texture(96, 128)
        return np.stack([
            np.clip(np.stack([base + 2 * t] * 3, -1), 0, 255).astype(np.uint8)
            for t in range(n)])

    def test_pristine_scores_high(self):
        from framewright_tpu.quality.vmaf import VMAFProxy

        ref = self._clip()
        res = VMAFProxy().score(ref, ref)
        assert res.score > 92
        assert len(res.per_frame) == 4
        assert 0.95 < res.vif <= 1.2 and res.dlm > 0.95

    def test_monotone_in_noise(self):
        from framewright_tpu.quality.vmaf import VMAFProxy

        rng = np.random.default_rng(0)
        ref = self._clip()
        v = VMAFProxy()
        scores = [v.score(ref, np.clip(
            ref.astype(np.int16) + rng.normal(0, s, ref.shape), 0, 255
        ).astype(np.uint8)).score for s in (0, 10, 25, 50)]
        assert all(a > b for a, b in zip(scores, scores[1:])), scores

    def test_blur_penalized(self):
        from framewright_tpu.quality.vmaf import VMAFProxy

        ref = self._clip()
        f = ref.astype(np.float32)
        for _ in range(2):
            f = (f + np.roll(f, 1, 1) + np.roll(f, -1, 1)
                 + np.roll(f, 1, 2) + np.roll(f, -1, 2)) / 5
        blur = np.clip(f, 0, 255).astype(np.uint8)
        v = VMAFProxy()
        assert v.score(ref, blur).score < v.score(ref, ref).score - 20

    def test_shape_mismatch_raises(self):
        from framewright_tpu.quality.vmaf import VMAFProxy

        ref = self._clip()
        with pytest.raises(ValueError):
            VMAFProxy().score(ref, ref[:, :64])
