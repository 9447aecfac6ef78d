"""RAFT flow estimator (models/raft.py).

Covers the forward contract (shapes, determinism, padding entry),
the correlation pyramid/lookup math on hand-checkable volumes, and
structure-completeness of the checkpoint port against the recorded
raft-things key inventory.
"""

import numpy as np
import pytest

from tests.test_manifests import run_port


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="module")
def small_cfg():
    from framewright_tpu.models import raft

    return raft.RAFTConfig(iters=4)


@pytest.fixture(scope="module")
def params(small_cfg):
    import jax

    from framewright_tpu.models import raft

    return raft.init(jax.random.PRNGKey(0), small_cfg)


class TestCorrelation:
    def test_all_pairs_matches_direct(self):
        import jax.numpy as jnp

        from framewright_tpu.models.raft import corr_pyramid

        rng = np.random.default_rng(0)
        f1 = rng.standard_normal((1, 4, 6, 8)).astype(np.float32)
        f2 = rng.standard_normal((1, 4, 6, 8)).astype(np.float32)
        pyr = corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), levels=2)
        # direct: corr[p, q] = <f1[p], f2[q]> / sqrt(C)
        a = f1.reshape(24, 8)
        b = f2.reshape(24, 8)
        want = (a @ b.T / np.sqrt(8)).reshape(24, 4, 6)
        np.testing.assert_allclose(np.asarray(pyr[0]), want, atol=0.02)
        # level 1 = 2x average pooling over the target dims
        pooled = want.reshape(24, 2, 2, 3, 2).mean(axis=(2, 4))
        np.testing.assert_allclose(np.asarray(pyr[1]), pooled, atol=0.02)

    def test_lookup_center_tap(self):
        """At integer coords, the window's center tap is the exact
        volume value."""
        import jax.numpy as jnp

        from framewright_tpu.models.raft import corr_lookup

        rng = np.random.default_rng(1)
        vol = rng.standard_normal((6, 4, 4)).astype(np.float32)
        coords = np.zeros((1, 2, 3, 2), np.float32)
        coords[..., 0] = 2.0      # x
        coords[..., 1] = 1.0      # y
        out = corr_lookup((jnp.asarray(vol),), jnp.asarray(coords), radius=1)
        # window is 3x3 row-major (dy, dx); center index 4
        center = np.asarray(out).reshape(6, 9)[:, 4]
        np.testing.assert_allclose(center, vol[:, 1, 2], atol=1e-5)

    def test_lookup_out_of_bounds_zero(self):
        import jax.numpy as jnp

        from framewright_tpu.models.raft import corr_lookup

        vol = np.ones((1, 4, 4), np.float32)
        coords = np.full((1, 1, 1, 2), 50.0, np.float32)
        out = corr_lookup((jnp.asarray(vol),), jnp.asarray(coords), radius=1)
        assert float(np.abs(np.asarray(out)).max()) == 0.0


@pytest.mark.slow
class TestForward:
    def test_shapes_and_determinism(self, params, small_cfg):
        import jax.numpy as jnp

        from framewright_tpu.models import raft

        rng = np.random.default_rng(2)
        img0 = jnp.asarray(rng.random((1, 32, 48, 3), np.float32))
        img1 = jnp.asarray(rng.random((1, 32, 48, 3), np.float32))
        flow = raft.apply(params, img0, img1, small_cfg)
        assert flow.shape == (1, 32, 48, 2)
        flow2 = raft.apply(params, img0, img1, small_cfg)
        np.testing.assert_array_equal(np.asarray(flow), np.asarray(flow2))

    def test_padded_entry_crops(self, params, small_cfg):
        import jax.numpy as jnp

        from framewright_tpu.models import raft

        rng = np.random.default_rng(3)
        img0 = jnp.asarray(rng.random((1, 30, 41, 3), np.float32))
        img1 = jnp.asarray(rng.random((1, 30, 41, 3), np.float32))
        flow = raft.estimate_flow(params, img0, img1, small_cfg)
        assert flow.shape == (1, 30, 41, 2)

    def test_identical_inputs_small_flow(self, params, small_cfg):
        """Zero motion: even with random weights the iterative update
        must produce identical fields for img0==img1 under x-flip
        symmetry of the inputs... at minimum the field is finite and
        bounded (random weights carry no motion prior)."""
        import jax.numpy as jnp

        from framewright_tpu.models import raft

        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
        flow = np.asarray(raft.estimate_flow(params, img, img, small_cfg))
        assert np.all(np.isfinite(flow))


class TestPort:
    def test_structure_complete(self):
        import jax

        from framewright_tpu.models import raft, torch_port

        run_port("raft-things", torch_port.port_raft,
                 lambda: raft.init(jax.random.PRNGKey(0)))

    def test_module_prefix_stripped(self):
        from tests.test_manifests import load_manifest, synth_sd

        from framewright_tpu.models import torch_port

        keys, _ = load_manifest("raft-things")
        sd = {"module." + k: v for k, v in synth_sd(keys).items()}
        ported = torch_port.port_raft(sd)
        assert "fnet" in ported and "update" in ported

    def test_registry_reachable(self):
        from framewright_tpu.models.registry import get_model

        spec = get_model("raft-things")
        assert spec.family == "flow"


@pytest.mark.slow
class TestTorchParity:
    def test_flow_matches_torch_reference(self):
        """Load the SAME (manifest-synthesized) weights into the torch
        RAFT re-statement and the JAX port; flows must match. This is
        the offline half of the <=0.1 dB parity harness — it proves the
        port math (norm folding, GRU order, corr lookup, convex
        upsample) without needing the released .pth."""
        torch = pytest.importorskip("torch")
        import jax
        import jax.numpy as jnp
        import numpy as np

        from framewright_tpu.models import raft, torch_ref, torch_port
        from tests.test_manifests import load_manifest, synth_sd

        keys, _ = load_manifest("raft-things")
        sd = synth_sd(keys)
        # BatchNorm running_var must be non-negative for torch's sqrt
        for k in list(sd):
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 0.5
            if k.endswith("running_mean"):
                sd[k] = sd[k] * 0.1
        iters = 3
        tm = torch_ref.build_raft(iters=iters)
        missing, unexpected = tm.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
        assert not missing, missing[:5]
        tm.eval()

        params = torch_port.port_raft(sd)
        cfg = raft.RAFTConfig(iters=iters)
        rng = np.random.default_rng(0)
        # >=128 px so the coarsest correlation level is >=2x2 (the
        # normalized-grid sampler divides by (size-1))
        a = rng.random((1, 128, 128, 3), dtype=np.float32)
        b = np.roll(a, 2, axis=2)

        with torch.no_grad():
            yt = tm(torch.as_tensor(a.transpose(0, 3, 1, 2)),
                    torch.as_tensor(b.transpose(0, 3, 1, 2)))
        flow_t = yt.numpy().transpose(0, 2, 3, 1)
        flow_j = np.asarray(raft.apply(params, jnp.asarray(a),
                                       jnp.asarray(b), cfg))
        err = np.abs(flow_j - flow_t)
        scale = np.abs(flow_t).max() + 1e-3
        assert err.max() / scale < 0.01, (
            f"max rel err {err.max() / scale:.4f} "
            f"(abs {err.max():.4f} vs scale {scale:.3f})")
