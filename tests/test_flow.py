"""FlowEstimator processor (processors/flow.py) — the reference
RAFTFlowEstimator surface (raft_flow.py:70-407) on TPU backends."""

import numpy as np
import pytest

from framewright_tpu.processors.flow import FlowEstimator, FlowField


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def _shifted_pair(shift=3, size=64, seed=0):
    rng = np.random.default_rng(seed)
    tex = rng.integers(0, 256, (size, size * 2), dtype=np.uint8)
    f0 = np.stack([tex[:, :size]] * 3, -1)
    f1 = np.stack([tex[:, shift:size + shift]] * 3, -1)
    return f0, f1


class TestEstimator:
    def test_field_shape_and_metadata(self):
        est = FlowEstimator(backend="ifnet")
        f0, f1 = _shifted_pair()
        field = est.estimate(f0, f1)
        assert isinstance(field, FlowField)
        assert field.flow.shape == (64, 64, 2)
        assert field.flow_x.shape == (64, 64)
        assert field.magnitude.shape == (64, 64)
        assert field.confidence.min() >= 0.0
        assert field.confidence.max() <= 1.0

    def test_bidirectional(self):
        est = FlowEstimator(backend="ifnet")
        f0, f1 = _shifted_pair()
        fwd, bwd = est.estimate_bidirectional(f0, f1)
        assert fwd.flow.shape == bwd.flow.shape == (64, 64, 2)

    @pytest.mark.slow
    def test_raft_backend_runs(self, tmp_path):
        est = FlowEstimator(backend="raft", iters=2,
                            weights_dir=str(tmp_path))
        f0, f1 = _shifted_pair(size=32)
        field = est.estimate(f0, f1, with_confidence=False)
        assert field.flow.shape == (32, 32, 2)
        assert np.all(np.isfinite(field.flow))
        assert field.iterations_used == 2

    def test_bad_backend_rejected(self):
        from framewright_tpu.errors import ConfigError

        with pytest.raises(ConfigError):
            FlowEstimator(backend="farneback")


class TestConsistency:
    def test_agreeing_flows_pass(self):
        fw = np.full((8, 8, 2), 1.0, np.float32)
        bw = np.full((8, 8, 2), -1.0, np.float32)
        mask = FlowEstimator.check_flow_consistency(fw, bw)
        assert mask.all()

    def test_disagreeing_flows_fail(self):
        fw = np.full((8, 8, 2), 5.0, np.float32)
        bw = np.full((8, 8, 2), 5.0, np.float32)   # should be ~ -5
        mask = FlowEstimator.check_flow_consistency(fw, bw)
        assert not mask.any()

    def test_confidence_high_when_consistent(self):
        fw = np.zeros((8, 8, 2), np.float32)
        bw = np.zeros((8, 8, 2), np.float32)
        conf = FlowEstimator._consistency_confidence(fw, bw)
        np.testing.assert_allclose(conf, 1.0)


class TestWarp:
    def test_zero_flow_identity(self):
        rng = np.random.default_rng(1)
        frame = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        out = FlowEstimator.warp_frame(frame, np.zeros((16, 16, 2), np.float32))
        np.testing.assert_array_equal(out, frame)

    def test_integer_shift(self):
        rng = np.random.default_rng(2)
        frame = rng.random((8, 16, 3)).astype(np.float32)
        flow = np.zeros((8, 16, 2), np.float32)
        flow[..., 0] = 2.0        # sample from x+2
        out = FlowEstimator.warp_frame(frame, flow)
        np.testing.assert_allclose(out[:, :14], frame[:, 2:], atol=1e-5)
