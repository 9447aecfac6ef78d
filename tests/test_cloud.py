"""Cloud burst: providers (offline via injected transport), SigV4,
storage backends, burst manager policy, and a live local-burst e2e."""

import json
import threading
import time
from pathlib import Path

import numpy as np
import pytest

from framewright_tpu.cloud import (
    BurstPolicy,
    CloudBurstManager,
    CloudError,
    CloudInstance,
    GCSStorage,
    InstanceSpec,
    LocalDirStorage,
    LocalSubprocessProvider,
    RunPodProvider,
    S3Storage,
    TPUPodProvider,
    VastAIProvider,
    sigv4_headers,
)


class FakeTransport:
    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []

    def __call__(self, method, url, headers, body):
        self.calls.append((method, url, headers, body))
        return self.responses.pop(0)


# ---------------------------------------------------------------------------
# Providers
# ---------------------------------------------------------------------------

class TestRunPod:
    def test_provision_and_lifecycle(self):
        tr = FakeTransport([
            (200, {"data": {"podFindAndDeployOnDemand":
                            {"id": "pod1", "costPerHr": 0.44}}}),
            (200, {"data": {"pod": {"desiredStatus": "RUNNING",
                                    "runtime": {"uptimeInSeconds": 5}}}}),
            (200, {"data": {"podTerminate": None}}),
        ])
        p = RunPodProvider(api_key="k", transport=tr)
        inst = p.provision(InstanceSpec(accelerator="NVIDIA RTX 4090",
                                        env={"A": 'va"l'}))
        assert inst.instance_id == "pod1" and inst.usd_per_hour == 0.44
        assert p.status(inst) == "running"
        p.terminate(inst)
        assert inst.status == "stopped"
        # API key rides in a header (never the URL — it would leak to logs)
        assert all("api_key" not in c[1] for c in tr.calls)
        assert all(c[2]["Authorization"] == "Bearer k" for c in tr.calls)
        payload = json.loads(tr.calls[0][3])
        assert "podFindAndDeployOnDemand" in payload["query"]
        # values travel as GraphQL variables, not string-built queries
        inp = payload["variables"]["input"]
        assert inp["gpuTypeId"] == "NVIDIA RTX 4090"
        assert inp["env"] == [{"key": "A", "value": 'va"l'}]

    def test_json_bytes_transport(self):
        """Providers decode raw-bytes bodies (the default urllib path)."""
        tr = FakeTransport([
            (200, json.dumps({"data": {"podFindAndDeployOnDemand":
                                       {"id": "p2", "costPerHr": 0.2}}}).encode()),
        ])
        inst = RunPodProvider("k", tr).provision(InstanceSpec())
        assert inst.instance_id == "p2"

    def test_api_error_raises(self):
        tr = FakeTransport([(200, {"errors": [{"message": "nope"}]})])
        with pytest.raises(CloudError):
            RunPodProvider("k", tr).provision(InstanceSpec())


class TestVastAI:
    def test_picks_cheapest_offer(self):
        tr = FakeTransport([
            (200, {"offers": [{"id": 7, "dph_total": 0.19},
                              {"id": 9, "dph_total": 0.30}]}),
            (200, {"success": True, "new_contract": 1234}),
        ])
        p = VastAIProvider("k", tr)
        inst = p.provision(InstanceSpec(accelerator="RTX_4090",
                                        max_usd_per_hour=0.5))
        assert inst.instance_id == "1234" and inst.usd_per_hour == 0.19
        assert "/asks/7/" in tr.calls[1][1]

    def test_no_offers(self):
        tr = FakeTransport([(200, {"offers": []})])
        with pytest.raises(CloudError, match="no vast.ai offers"):
            VastAIProvider("k", tr).provision(InstanceSpec())

    def test_status_mapping(self):
        tr = FakeTransport([(200, {"instances": {"actual_status": "running"}}),
                            (200, {"instances": {"actual_status": "loading"}})])
        p = VastAIProvider("k", tr)
        inst = CloudInstance("vastai", "1")
        assert p.status(inst) == "running"
        assert p.status(inst) == "provisioning"


class TestTPUPod:
    def test_provision_targets_tpu_api(self):
        tr = FakeTransport([(200, {}), (200, {"state": "READY"}), (200, {})])
        p = TPUPodProvider(api_key="tok", project="proj1",
                           zone="us-central2-b", transport=tr)
        inst = p.provision(InstanceSpec(accelerator="v5litepod-8"))
        m, url, headers, body = tr.calls[0]
        assert m == "POST" and "tpu.googleapis.com/v2" in url
        assert "/projects/proj1/locations/us-central2-b/nodes" in url
        assert headers["Authorization"] == "Bearer tok"
        assert json.loads(body)["acceleratorType"] == "v5litepod-8"
        assert p.status(inst) == "running"
        p.terminate(inst)
        assert tr.calls[2][0] == "DELETE"


# ---------------------------------------------------------------------------
# SigV4 + storage
# ---------------------------------------------------------------------------

class TestSigV4:
    def test_deterministic_and_key_sensitive(self):
        args = dict(method="PUT", url="https://b.s3.us-east-1.amazonaws.com/k",
                    region="us-east-1", service="s3", access_key="AK",
                    payload=b"data", amz_date="20260816T120000Z")
        h1 = sigv4_headers(secret_key="S1", **args)
        h2 = sigv4_headers(secret_key="S1", **args)
        h3 = sigv4_headers(secret_key="S2", **args)
        assert h1 == h2
        assert h1["Authorization"] != h3["Authorization"]
        assert h1["Authorization"].startswith("AWS4-HMAC-SHA256 Credential=AK/"
                                              "20260816/us-east-1/s3/aws4_request")
        assert "SignedHeaders=host;x-amz-content-sha256;x-amz-date" in h1["Authorization"]

    def test_payload_hash_in_headers(self):
        import hashlib

        h = sigv4_headers("GET", "https://b.s3.r.amazonaws.com/x", "r", "s3",
                          "AK", "SK", b"", "20260816T120000Z")
        assert h["x-amz-content-sha256"] == hashlib.sha256(b"").hexdigest()


class TestStorage:
    def test_local_roundtrip(self, tmp_path):
        st = LocalDirStorage(tmp_path / "store")
        src = tmp_path / "a.bin"
        src.write_bytes(b"hello")
        st.upload(src, "jobs/a.bin")
        assert st.exists("jobs/a.bin")
        dst = tmp_path / "b.bin"
        st.download("jobs/a.bin", dst)
        assert dst.read_bytes() == b"hello"
        assert not st.exists("jobs/missing")

    def test_s3_put_request_shape(self, tmp_path):
        tr = FakeTransport([(200, {})])
        st = S3Storage("bkt", "eu-west-1", "AK", "SK", transport=tr,
                       now=lambda: "20260816T120000Z")
        f = tmp_path / "c.y4m"
        f.write_bytes(b"YUV")
        st.upload(f, "parts/c.y4m")
        m, url, headers, body = tr.calls[0]
        assert m == "PUT"
        assert url == "https://bkt.s3.eu-west-1.amazonaws.com/parts/c.y4m"
        assert body == b"YUV" and "Authorization" in headers

    def test_s3_download_binary_exact(self, tmp_path):
        """Raw-bytes transport bodies reach disk bit-exact (binary media
        must not pass through any text decode)."""
        blob = bytes(range(256)) * 4 + b"\xff\xfe\x00Y4M"
        tr = FakeTransport([(200, blob)])
        st = S3Storage("bkt", "us-east-1", "AK", "SK", transport=tr,
                       now=lambda: "20260816T120000Z")
        dst = tmp_path / "out.bin"
        st.download("parts/x.y4m", dst)
        assert dst.read_bytes() == blob

    def test_sigv4_encoded_key_not_double_encoded(self):
        """A pre-encoded path signs over the once-encoded form; query
        pairs are key/value-encoded and sorted."""
        h1 = sigv4_headers("GET",
                           "https://b.s3.r.amazonaws.com/a%20b/c.y4m?b=2&a=1",
                           "r", "s3", "AK", "SK", b"", "20260816T120000Z")
        h2 = sigv4_headers("GET",
                           "https://b.s3.r.amazonaws.com/a%2520b/c.y4m?a=1&b=2",
                           "r", "s3", "AK", "SK", b"", "20260816T120000Z")
        # if '%' were re-quoted, the first URL would sign as the second
        assert h1["Authorization"] != h2["Authorization"]

    def test_gcs_download_binary_exact(self, tmp_path):
        blob = b"\x00\x01\xfe\xffRAW"
        tr = FakeTransport([(200, blob)])
        st = GCSStorage("bkt", token="tok", transport=tr)
        dst = tmp_path / "g.bin"
        st.download("a/b.bin", dst)
        assert dst.read_bytes() == blob

    def test_gcs_upload_url(self, tmp_path):
        tr = FakeTransport([(200, {})])
        st = GCSStorage("bkt", token="tok", transport=tr)
        f = tmp_path / "d.bin"
        f.write_bytes(b"x")
        st.upload(f, "a/b.bin")
        _, url, headers, _ = tr.calls[0]
        assert "uploadType=media&name=a%2Fb.bin" in url
        assert headers["Authorization"] == "Bearer tok"


# ---------------------------------------------------------------------------
# Burst manager
# ---------------------------------------------------------------------------

class _StubProvider(LocalSubprocessProvider):
    """Counts provisions without spawning processes."""

    def __init__(self):
        super().__init__(job_dir=Path("/tmp"))
        self.provisioned = []

    def provision(self, spec):
        inst = CloudInstance("stub", str(len(self.provisioned)),
                             status="running", usd_per_hour=0.5,
                             started_at=time.time())
        self.provisioned.append(inst)
        return inst

    def terminate(self, instance):
        instance.status = "stopped"


class TestBurstPolicy:
    def test_small_jobs_do_not_burst(self, tmp_path):
        mgr = CloudBurstManager(_StubProvider(), LocalDirStorage(tmp_path),
                                BurstPolicy(min_chunks_per_instance=2))
        assert not mgr.should_burst(total_chunks=3)
        assert mgr.should_burst(total_chunks=8)

    def test_fleet_size_and_budget(self, tmp_path):
        prov = _StubProvider()
        mgr = CloudBurstManager(prov, LocalDirStorage(tmp_path),
                                BurstPolicy(max_instances=8, budget_usd=1.4,
                                            min_chunks_per_instance=2))
        assert mgr.instances_for(10) == 5
        mgr.provision_fleet(InstanceSpec(max_usd_per_hour=0.5), 5)
        # budget 1.4 admits only 2 x $0.5/h before the 3rd would exceed
        assert len(prov.provisioned) == 2
        cost = mgr.teardown()
        assert cost >= 0 and mgr.instances == []
        assert all(i.status == "stopped" for i in prov.provisioned)


def _write_clip(path, frames=12, w=48, h=32):
    from framewright_tpu.io.y4m import Y4MWriter

    rng = np.random.default_rng(0)
    tex = rng.integers(0, 256, (h, w + frames * 2), dtype=np.uint8)
    with Y4MWriter(path, w, h, fps=24) as wr:
        for t in range(frames):
            wr.write_frame(np.stack([tex[:, t * 2 : t * 2 + w]] * 3, -1))


class TestFarmLive:
    def test_coordinator_with_thread_workers(self, tmp_path, monkeypatch):
        """Full farm protocol in-process: 2 worker threads restore
        chunks, coordinator merges."""
        monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
        from framewright_tpu.parallel.multihost import (
            RenderJob,
            run_coordinator,
            run_worker,
        )

        src = tmp_path / "in.y4m"
        _write_clip(src, frames=8)
        wd = tmp_path / "job"
        job = RenderJob(
            job_id="t", source=str(src), output=str(wd / "merged.y4m"),
            config={"sr_model": "realesr-animevideov3",
                    "compute_dtype": "float32", "scale_factor": 4},
            total_frames=8, chunk_frames=3,
        )
        workers = [threading.Thread(target=run_worker, args=(wd,),
                                    kwargs={"worker_id": f"w{i}"})
                   for i in range(2)]
        for w in workers:
            w.start()
        out = run_coordinator(wd, job, timeout=300.0, poll_s=0.2)
        for w in workers:
            w.join(timeout=30)
        from framewright_tpu.io.y4m import Y4MReader

        with Y4MReader(out) as r:
            assert (r.width, r.height) == (192, 128)
            assert r.count_frames() == 8


class TestLifecycle:
    def test_wait_running_transitions(self):
        tr = FakeTransport([
            (200, {"data": {"pod": {"desiredStatus": "RUNNING", "runtime": None}}}),
            (200, {"data": {"pod": {"desiredStatus": "RUNNING",
                                    "runtime": {"uptimeInSeconds": 3}}}}),
        ])
        p = RunPodProvider("k", tr)
        inst = CloudInstance("runpod", "p1")
        out = p.wait_running(inst, timeout=5.0, poll=0.01)
        assert out.status == "running" and out.started_at > 0

    def test_wait_running_timeout(self):
        tr = FakeTransport([(200, {"data": {"pod": {"desiredStatus": "RUNNING",
                                                    "runtime": None}}})] * 50)
        p = RunPodProvider("k", tr)
        with pytest.raises(CloudError, match="timeout"):
            p.wait_running(CloudInstance("runpod", "p2"), timeout=0.05, poll=0.01)

    def test_cost_accrues_with_time(self):
        inst = CloudInstance("x", "1", usd_per_hour=1.2,
                             started_at=time.time() - 1800)
        assert abs(inst.cost_so_far() - 0.6) < 0.01


class TestAzureGDriveStorage:
    """Round-3 backends (reference cloud/storage.py AzureStorage,
    cloud/gdrive.py:52 GoogleDriveStorage)."""

    def test_azure_put_request_shape(self, tmp_path):
        from framewright_tpu.cloud import AzureBlobStorage

        tr = FakeTransport([(201, {})])
        st = AzureBlobStorage("acct", "cont", account_key="QUJD",
                              transport=tr,
                              now=lambda: "Sun, 17 Aug 2026 12:00:00 GMT")
        f = tmp_path / "c.y4m"
        f.write_bytes(b"YUV")
        st.upload(f, "parts/c.y4m")
        m, url, headers, body = tr.calls[0]
        assert m == "PUT"
        assert url == ("https://acct.blob.core.windows.net/cont/"
                       "parts/c.y4m")
        assert body == b"YUV"
        assert headers["Authorization"].startswith("SharedKey acct:")
        assert headers["x-ms-blob-type"] == "BlockBlob"
        # urllib auto-adds a Content-Type to body-carrying requests; PUT
        # must pin and sign an explicit one or real uploads 403.
        assert headers["Content-Type"] == "application/octet-stream"

    def test_azure_put_signs_the_content_type_slot(self, tmp_path):
        """The signed string-to-sign must include the Content-Type that is
        actually sent (SharedKey canonicalization slot 6)."""
        import base64
        import hashlib
        import hmac

        from framewright_tpu.cloud import AzureBlobStorage

        tr = FakeTransport([(201, {})])
        st = AzureBlobStorage("acct", "cont", account_key="QUJD",
                              transport=tr,
                              now=lambda: "Sun, 17 Aug 2026 12:00:00 GMT")
        f = tmp_path / "c.y4m"
        f.write_bytes(b"YUV")
        st.upload(f, "parts/c.y4m")
        _, _, headers, body = tr.calls[0]
        sts = "\n".join([
            "PUT", "", "", str(len(body)), "", "application/octet-stream",
            "", "", "", "", "", "",
        ]) + "\n" + (
            "x-ms-blob-type:BlockBlob\n"
            "x-ms-date:Sun, 17 Aug 2026 12:00:00 GMT\n"
            f"x-ms-version:{AzureBlobStorage._VERSION}\n"
        ) + "/acct/cont/parts/c.y4m"
        want = base64.b64encode(hmac.new(
            base64.b64decode("QUJD"), sts.encode(),
            hashlib.sha256).digest()).decode()
        assert headers["Authorization"] == f"SharedKey acct:{want}"

    def test_azure_download_binary_exact(self, tmp_path):
        from framewright_tpu.cloud import AzureBlobStorage

        blob = bytes(range(256)) + b"\xff\x00Y4M"
        tr = FakeTransport([(200, blob)])
        st = AzureBlobStorage("acct", "cont", account_key="QUJD",
                              transport=tr)
        dst = tmp_path / "o.bin"
        st.download("x.y4m", dst)
        assert dst.read_bytes() == blob

    def test_azure_signature_depends_on_key_and_path(self, tmp_path):
        from framewright_tpu.cloud import AzureBlobStorage

        now = lambda: "Sun, 17 Aug 2026 12:00:00 GMT"  # noqa: E731
        f = tmp_path / "f.bin"
        f.write_bytes(b"z")
        sigs = []
        for key, path in (("QUJD", "a.bin"), ("QUJE", "a.bin"),
                          ("QUJD", "b.bin")):
            tr = FakeTransport([(201, {})])
            AzureBlobStorage("acct", "cont", account_key=key,
                             transport=tr, now=now).upload(f, path)
            sigs.append(tr.calls[0][2]["Authorization"])
        assert len(set(sigs)) == 3

    def test_gdrive_upload_multipart(self, tmp_path):
        from framewright_tpu.cloud import GoogleDriveStorage

        tr = FakeTransport([(200, {"files": []}),      # dedup lookup: none
                            (200, {"id": "f1"})])
        st = GoogleDriveStorage(token="tok", folder_id="fold",
                                transport=tr)
        f = tmp_path / "d.bin"
        f.write_bytes(b"PAYLOAD")
        st.upload(f, "jobs/d.bin")
        m, url, headers, body = tr.calls[1]
        assert m == "POST" and "uploadType=multipart" in url
        assert b"PAYLOAD" in body
        assert b'"name": "jobs/d.bin"' in body
        assert b'"parents": ["fold"]' in body
        assert headers["Authorization"] == "Bearer tok"

    def test_gdrive_reupload_patches_existing_file(self, tmp_path):
        """Drive allows duplicate names; re-upload must PATCH in place so a
        later download resolves the fresh bytes, not a stale copy."""
        from framewright_tpu.cloud import GoogleDriveStorage

        tr = FakeTransport([
            (200, {"files": [{"id": "old1", "name": "jobs/d.bin"}]}),
            (200, {"id": "old1"}),
        ])
        st = GoogleDriveStorage(token="tok", folder_id="fold",
                                transport=tr)
        f = tmp_path / "d.bin"
        f.write_bytes(b"NEWBYTES")
        st.upload(f, "jobs/d.bin")
        m, url, headers, body = tr.calls[1]
        assert m == "PATCH" and "files/old1" in url
        assert "uploadType=media" in url
        assert body == b"NEWBYTES"

    def test_gdrive_download_resolves_name_then_media(self, tmp_path):
        from framewright_tpu.cloud import GoogleDriveStorage

        blob = b"\x00\xffY4M"
        tr = FakeTransport([
            (200, {"files": [{"id": "abc123", "name": "jobs/d.bin"}]}),
            (200, blob),
        ])
        st = GoogleDriveStorage(token="tok", transport=tr)
        dst = tmp_path / "out.bin"
        st.download("jobs/d.bin", dst)
        assert dst.read_bytes() == blob
        assert "files?q=" in tr.calls[0][1]
        assert "/files/abc123?alt=media" in tr.calls[1][1]

    def test_gdrive_exists_false_on_empty(self):
        from framewright_tpu.cloud import GoogleDriveStorage

        tr = FakeTransport([(200, {"files": []})])
        st = GoogleDriveStorage(token="tok", transport=tr)
        assert not st.exists("nope.bin")
