"""jax.distributed bring-up spec parsing / gating (parallel/dcn.py)."""

import pytest

from framewright_tpu.parallel import dcn


class TestDistributedSpec:
    def test_from_env_explicit(self):
        spec = dcn.DistributedSpec.from_env({
            "FRAMEWRIGHT_COORDINATOR": "10.0.0.2:8476",
            "FRAMEWRIGHT_NUM_PROCESSES": "4",
            "FRAMEWRIGHT_PROCESS_ID": "1",
        })
        assert spec.coordinator == "10.0.0.2:8476"
        assert spec.num_processes == 4 and spec.process_id == 1
        assert spec.explicit

    def test_jax_env_names_accepted(self):
        spec = dcn.DistributedSpec.from_env({
            "JAX_COORDINATOR_ADDRESS": "head:1234",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": "0",
        })
        assert spec.coordinator == "head:1234"

    def test_empty_env_not_explicit(self):
        spec = dcn.DistributedSpec.from_env({})
        assert not spec.explicit

    def test_bad_coordinator_rejected(self):
        with pytest.raises(ValueError):
            dcn.DistributedSpec.from_env(
                {"FRAMEWRIGHT_COORDINATOR": "no-port"})

    def test_mismatched_pair_rejected(self):
        with pytest.raises(ValueError):
            dcn.DistributedSpec.from_env(
                {"FRAMEWRIGHT_NUM_PROCESSES": "4"})

    def test_process_id_range(self):
        with pytest.raises(ValueError):
            dcn.DistributedSpec.from_env({
                "FRAMEWRIGHT_COORDINATOR": "h:1",
                "FRAMEWRIGHT_NUM_PROCESSES": "2",
                "FRAMEWRIGHT_PROCESS_ID": "2",
            })


class TestEnsure:
    def test_single_host_noop(self, monkeypatch):
        # no env, not a pod -> no-op, returns False, no jax.distributed
        monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
        monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("TPU_WORKER_ID", raising=False)
        assert dcn.ensure_distributed(dcn.DistributedSpec()) is False

    def test_pod_heuristic(self, monkeypatch):
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "a,b")
        assert dcn._on_tpu_pod()
        monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
        monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("TPU_WORKER_ID", raising=False)
        assert not dcn._on_tpu_pod()
