"""RetinaFace detector tests (architecture, decode, NMS, fallback)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import retinaface


@pytest.fixture(scope="module")
def model():
    cfg = retinaface.RetinaFaceConfig()
    params = retinaface.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestForward:
    def test_shapes_and_anchor_count(self, model):
        cfg, params = model
        h, w = 64, 96
        x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3),
                                                        dtype=np.float32))
        score, boxes, ldm = retinaface.apply(params, x, cfg)
        n = sum(2 * (h // s) * (w // s) for s in cfg.steps)
        assert score.shape == (1, n)
        assert boxes.shape == (1, n, 4)
        assert ldm.shape == (1, n, 10)
        assert np.isfinite(np.asarray(boxes)).all()

    def test_priors_normalized(self):
        pri = np.asarray(retinaface._priors_level(8, 12, (16, 32), 8,
                                                  64, 96))
        assert pri.shape == (8 * 12 * 2, 4)
        assert (pri[:, :2] >= 0).all() and (pri[:, :2] <= 1).all()


class TestNMS:
    def test_suppresses_overlaps(self):
        boxes = np.asarray([[0.1, 0.1, 0.3, 0.3],
                            [0.11, 0.11, 0.31, 0.31],
                            [0.6, 0.6, 0.8, 0.8]], np.float32)
        scores = np.asarray([0.9, 0.8, 0.7], np.float32)
        keep = retinaface.nms_host(scores, boxes, iou=0.4,
                                   score_thresh=0.5, top_k=10)
        assert keep == [0, 2]

    def test_threshold_filters(self):
        boxes = np.asarray([[0.1, 0.1, 0.2, 0.2]], np.float32)
        assert retinaface.nms_host(np.asarray([0.2], np.float32), boxes,
                                   0.4, 0.5, 10) == []


class TestDetectorSelection:
    def test_auto_falls_back_without_weights(self, tmp_path):
        from framewright_tpu.processors.faces import (
            FaceDetector,
            make_detector,
        )

        det = make_detector("auto", weights_dir=str(tmp_path))
        assert isinstance(det, FaceDetector)

    def test_explicit_retinaface_raises_without_weights(self, tmp_path):
        from framewright_tpu.processors.faces import make_detector

        with pytest.raises(Exception):
            make_detector("retinaface", weights_dir=str(tmp_path))

    def test_learned_detector_with_ported_weights(self, tmp_path):
        # synth weights (random values, REAL structure) exercised
        # through the full npz->detect path
        import json
        from pathlib import Path

        from framewright_tpu.models import torch_port
        from framewright_tpu.processors.faces import RetinaFaceDetector

        man = json.loads(
            (Path("framewright_tpu/models/manifests")
             / "retinaface_mnet025.json").read_text())
        rng = np.random.default_rng(0)
        sd = {k: rng.standard_normal(v).astype(np.float32) * 0.05
              for k, v in man["keys"].items()}
        # BN running_var must be positive
        for k in sd:
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
        params = torch_port.port_retinaface(sd)
        torch_port.export_npz(params,
                              tmp_path / "RetinaFace_mnet025.npz")
        det = RetinaFaceDetector(weights_dir=str(tmp_path),
                                 score_thresh=0.99)
        frame = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
        boxes = det.detect(frame)  # random weights: just runs cleanly
        for b in boxes:
            assert 0 <= b.x0 < b.x1 <= 56 and 0 <= b.y0 < b.y1 <= 40


@pytest.mark.slow
class TestTorchParity:
    def test_scores_match_torch_reference(self, tmp_path):
        """Manifest-synthesized weights into the biubug6 torch
        re-statement and the BN-folded JAX port: anchor scores must
        match (validates BN folding, depthwise padding, FPN/SSH wiring
        and anchor ordering without the released .pth)."""
        torch = pytest.importorskip("torch")
        import numpy as np
        import jax.numpy as jnp

        from framewright_tpu.models import retinaface, torch_port, torch_ref
        from tests.test_manifests import load_manifest, synth_sd

        keys, _ = load_manifest("retinaface_mnet025")
        sd = synth_sd(keys)
        for k in list(sd):
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 0.5
            if k.endswith("running_mean"):
                sd[k] = sd[k] * 0.1
        tm = torch_ref.build_retinaface()
        missing, _unexpected = tm.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
        assert not missing, missing[:5]
        tm.eval()

        params = torch_port.port_retinaface(sd)
        rng = np.random.default_rng(0)
        x = rng.random((1, 64, 96, 3), dtype=np.float32)

        xb = x[..., ::-1] * 255.0 - np.asarray([104.0, 117.0, 123.0],
                                               np.float32)
        with torch.no_grad():
            cls_t, _box_t, _ldm_t = tm(
                torch.as_tensor(np.ascontiguousarray(
                    xb.transpose(0, 3, 1, 2))))
        scores_t = torch.softmax(cls_t, dim=-1)[..., 1].numpy()

        scores_j, _boxes, _ldm = retinaface.apply(params, jnp.asarray(x))
        scores_j = np.asarray(scores_j)
        assert scores_j.shape == scores_t.shape
        err = np.abs(scores_j - scores_t).max()
        assert err < 5e-3, f"score mismatch {err:.5f}"
