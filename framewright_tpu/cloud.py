"""Cloud burst: rent remote accelerators when local capacity runs out.

Re-creates the reference's cloud layer (cloud/base.py:284 CloudProvider
ABC, runpod.py:53, vastai.py:54 providers, burst.py:83
CloudBurstManager, storage.py:11-482 S3/GCS storage) with a TPU-native
twist: alongside the GPU marketplaces (RunPod, Vast.ai) there is a GCP
TPU-VM provider, since this framework's compute path is TPU-first.

Design differences from the reference:

- Every provider takes an injectable ``transport(method, url, headers,
  body) -> (status, dict)``. The default uses urllib; tests (and
  air-gapped hosts) inject a fake. Provider logic — payload
  construction, offer selection, lifecycle — is fully exercisable
  offline.
- Storage is the handoff mechanism (upload source chunk + job manifest,
  worker produces a part, controller downloads). ``LocalDirStorage``
  covers shared-FS clusters and tests; ``S3Storage`` implements real
  AWS SigV4 request signing in-process (hmac/hashlib; the reference
  shelled out to rclone); ``GCSStorage`` uses bearer-token JSON API.
- ``LocalSubprocessProvider`` "provisions" worker processes on this
  host running the CLI — the live path that needs no cloud account,
  and the one the burst manager's tests drive end to end.
- Chunking/merge reuses parallel/distributor + io/y4m append semantics
  (same machinery as the multi-host render farm, parallel/multihost.py).
"""

from __future__ import annotations

import hashlib
import hmac
import json
import logging
import shutil
import subprocess
import sys
import threading
import time
import urllib.parse
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from framewright_tpu.errors import FramewrightError

logger = logging.getLogger(__name__)

# Transports return the RAW response body (bytes); callers decode.
# (JSON decoding in the transport would corrupt binary media downloads.)
# Fake transports in tests may return ready-made dicts — the _as_json /
# _as_bytes helpers accept both.
Transport = Callable[[str, str, Dict[str, str], Optional[bytes]],
                     Tuple[int, object]]


class CloudError(FramewrightError):
    pass


def _urllib_transport(method: str, url: str, headers: Dict[str, str],
                      body: Optional[bytes]) -> Tuple[int, bytes]:
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers,
                                 method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except Exception as exc:  # noqa: BLE001
        raise CloudError(f"{method} {url} failed: {exc}") from exc


def _as_json(data) -> Dict:
    """Decode a transport body as JSON (tolerates dict-returning fakes)."""
    if isinstance(data, dict):
        return data
    if isinstance(data, (bytes, bytearray)):
        if not data:
            return {}
        try:
            return json.loads(data)
        except json.JSONDecodeError:
            return {"raw": bytes(data).decode("utf-8", "replace")}
    if isinstance(data, str):
        try:
            return json.loads(data) if data else {}
        except json.JSONDecodeError:
            return {"raw": data}
    return {}


def _as_bytes(data) -> bytes:
    """Binary body from a transport (tolerates dict/str-returning fakes)."""
    if isinstance(data, (bytes, bytearray)):
        return bytes(data)
    if isinstance(data, str):
        return data.encode()
    if isinstance(data, dict):
        raw = data.get("raw", b"")
        return raw.encode() if isinstance(raw, str) else bytes(raw)
    return b""


# ---------------------------------------------------------------------------
# Provider model
# ---------------------------------------------------------------------------

@dataclass
class InstanceSpec:
    """What to rent. accelerator examples: 'RTX4090', 'A100', 'v5e-8'."""

    accelerator: str = "RTX4090"
    count: int = 1
    max_usd_per_hour: float = 1.0
    disk_gb: int = 60
    image: str = "framewright/worker:latest"
    region: Optional[str] = None
    env: Dict[str, str] = field(default_factory=dict)


@dataclass
class CloudInstance:
    provider: str
    instance_id: str
    status: str = "provisioning"      # provisioning|running|stopped|failed
    usd_per_hour: float = 0.0
    started_at: float = 0.0
    meta: Dict = field(default_factory=dict)

    def cost_so_far(self, now: Optional[float] = None) -> float:
        if not self.started_at:
            return 0.0
        hours = ((now or time.time()) - self.started_at) / 3600.0
        return round(hours * self.usd_per_hour, 4)


class CloudProvider(ABC):
    """Lifecycle of rented instances (reference cloud/base.py:284)."""

    name = "abstract"

    def __init__(self, api_key: str = "", transport: Optional[Transport] = None):
        self.api_key = api_key
        self.transport = transport or _urllib_transport

    @abstractmethod
    def provision(self, spec: InstanceSpec) -> CloudInstance: ...

    @abstractmethod
    def status(self, instance: CloudInstance) -> str: ...

    @abstractmethod
    def terminate(self, instance: CloudInstance) -> None: ...

    def wait_running(self, instance: CloudInstance, timeout: float = 600.0,
                     poll: float = 5.0) -> CloudInstance:
        t0 = time.time()
        while time.time() - t0 < timeout:
            st = self.status(instance)
            instance.status = st
            if st == "running":
                if not instance.started_at:
                    instance.started_at = time.time()
                return instance
            if st == "failed":
                raise CloudError(f"{self.name} instance {instance.instance_id} failed")
            time.sleep(poll)
        raise CloudError(f"timeout waiting for {instance.instance_id}")


class RunPodProvider(CloudProvider):
    """RunPod GraphQL API (reference cloud/runpod.py:53)."""

    name = "runpod"
    endpoint = "https://api.runpod.io/graphql"

    def _gql(self, query: str, variables: Optional[Dict] = None) -> Dict:
        # GraphQL variables (never string-built payloads: user-controlled
        # accelerator/image/env would be query injection); API key rides
        # in a header, not the URL, so it can't leak into request logs.
        status, raw = self.transport(
            "POST", self.endpoint,
            {"Content-Type": "application/json",
             "Authorization": f"Bearer {self.api_key}"},
            json.dumps({"query": query, "variables": variables or {}}).encode())
        data = _as_json(raw)
        if status != 200 or "errors" in data:
            raise CloudError(f"runpod API error ({status}): {data}")
        return data.get("data", {})

    def provision(self, spec: InstanceSpec) -> CloudInstance:
        q = (
            "mutation Deploy($input: PodFindAndDeployOnDemandInput) {"
            " podFindAndDeployOnDemand(input: $input)"
            " { id costPerHr desiredStatus } }"
        )
        variables = {"input": {
            "cloudType": "COMMUNITY",
            "gpuCount": spec.count,
            "volumeInGb": spec.disk_gb,
            "containerDiskInGb": 10,
            "gpuTypeId": spec.accelerator,
            "name": "framewright-burst",
            "imageName": spec.image,
            "env": [{"key": k, "value": v} for k, v in spec.env.items()],
        }}
        data = self._gql(q, variables)
        pod = data.get("podFindAndDeployOnDemand") or {}
        if not pod.get("id"):
            raise CloudError(f"runpod returned no pod: {data}")
        return CloudInstance(self.name, pod["id"],
                             usd_per_hour=float(pod.get("costPerHr", 0.0)))

    def status(self, instance: CloudInstance) -> str:
        data = self._gql(
            "query Pod($input: PodFilter) { pod(input: $input)"
            " { desiredStatus runtime { uptimeInSeconds } } }",
            {"input": {"podId": instance.instance_id}})
        pod = data.get("pod") or {}
        st = (pod.get("desiredStatus") or "").upper()
        if st == "RUNNING" and (pod.get("runtime") or {}).get("uptimeInSeconds"):
            return "running"
        if st in ("EXITED", "TERMINATED"):
            return "stopped"
        return "provisioning"

    def terminate(self, instance: CloudInstance) -> None:
        self._gql(
            "mutation Terminate($input: PodTerminateInput!)"
            " { podTerminate(input: $input) }",
            {"input": {"podId": instance.instance_id}})
        instance.status = "stopped"


class VastAIProvider(CloudProvider):
    """Vast.ai REST API (reference cloud/vastai.py:54): search offers,
    rent the cheapest match, destroy when done."""

    name = "vastai"
    endpoint = "https://console.vast.ai/api/v0"

    def _call(self, method: str, path: str, body: Optional[Dict] = None) -> Dict:
        status, raw = self.transport(
            method, f"{self.endpoint}{path}",
            {"Content-Type": "application/json",
             "Authorization": f"Bearer {self.api_key}"},
            json.dumps(body).encode() if body is not None else None)
        data = _as_json(raw)
        if status not in (200, 201):
            raise CloudError(f"vast.ai API error ({status}): {data}")
        return data

    def search_offers(self, spec: InstanceSpec) -> List[Dict]:
        q = {
            "gpu_name": {"eq": spec.accelerator},
            "num_gpus": {"gte": spec.count},
            "dph_total": {"lte": spec.max_usd_per_hour},
            "rentable": {"eq": True},
        }
        data = self._call(
            "GET", "/bundles/",
            {"q": q, "order": [["dph_total", "asc"]], "limit": 16})
        return data.get("offers", [])

    def provision(self, spec: InstanceSpec) -> CloudInstance:
        offers = self.search_offers(spec)
        if not offers:
            raise CloudError(
                f"no vast.ai offers for {spec.accelerator} "
                f"<= ${spec.max_usd_per_hour}/h")
        offer = offers[0]
        data = self._call("PUT", f"/asks/{offer['id']}/", {
            "client_id": "me", "image": spec.image,
            "disk": spec.disk_gb, "env": spec.env,
        })
        if not data.get("success"):
            raise CloudError(f"vast.ai rent failed: {data}")
        return CloudInstance(self.name, str(data.get("new_contract")),
                             usd_per_hour=float(offer.get("dph_total", 0.0)))

    def status(self, instance: CloudInstance) -> str:
        data = self._call("GET", f"/instances/{instance.instance_id}/")
        st = ((data.get("instances") or data).get("actual_status") or "")
        return {"running": "running", "exited": "stopped",
                "created": "provisioning", "loading": "provisioning"}.get(
                    st, "provisioning")

    def terminate(self, instance: CloudInstance) -> None:
        self._call("DELETE", f"/instances/{instance.instance_id}/")
        instance.status = "stopped"


class TPUPodProvider(CloudProvider):
    """GCP TPU VM API (tpu.googleapis.com v2) — the TPU-native burst
    target this framework is designed for. api_key is an OAuth bearer
    token; accelerator is a TPU type like 'v5litepod-8'."""

    name = "gcp-tpu"
    endpoint = "https://tpu.googleapis.com/v2"

    def __init__(self, api_key: str = "", project: str = "",
                 zone: str = "us-central2-b",
                 transport: Optional[Transport] = None):
        super().__init__(api_key, transport)
        self.project = project
        self.zone = zone

    def _call(self, method: str, path: str, body: Optional[Dict] = None) -> Dict:
        status, raw = self.transport(
            method, f"{self.endpoint}{path}",
            {"Authorization": f"Bearer {self.api_key}",
             "Content-Type": "application/json"},
            json.dumps(body).encode() if body is not None else None)
        data = _as_json(raw)
        if status not in (200, 201):
            raise CloudError(f"TPU API error ({status}): {data}")
        return data

    def provision(self, spec: InstanceSpec) -> CloudInstance:
        node_id = f"framewright-burst-{int(time.time())}"
        parent = f"/projects/{self.project}/locations/{self.zone}"
        self._call("POST", f"{parent}/nodes?nodeId={node_id}", {
            "acceleratorType": spec.accelerator or "v5litepod-8",
            "runtimeVersion": "tpu-ubuntu2204-base",
            "metadata": spec.env,
        })
        return CloudInstance(self.name, node_id,
                             meta={"parent": parent})

    def status(self, instance: CloudInstance) -> str:
        data = self._call(
            "GET", f"{instance.meta['parent']}/nodes/{instance.instance_id}")
        return {"READY": "running", "CREATING": "provisioning",
                "STOPPED": "stopped"}.get(data.get("state", ""), "provisioning")

    def terminate(self, instance: CloudInstance) -> None:
        self._call("DELETE",
                   f"{instance.meta['parent']}/nodes/{instance.instance_id}")
        instance.status = "stopped"


class LocalSubprocessProvider(CloudProvider):
    """'Provisions' worker processes on this machine running the
    framewright CLI — the zero-account burst target, and what the burst
    manager's end-to-end tests exercise. Each instance is a multihost
    SharedDirWorker consuming chunks from the job directory."""

    name = "local"

    def __init__(self, job_dir: Optional[Path] = None):
        super().__init__("", lambda *a: (_ for _ in ()).throw(
            CloudError("local provider makes no HTTP calls")))
        self.job_dir = job_dir
        self._procs: Dict[str, subprocess.Popen] = {}

    def provision(self, spec: InstanceSpec) -> CloudInstance:
        if self.job_dir is None:
            raise CloudError("LocalSubprocessProvider needs a job_dir")
        proc = subprocess.Popen(
            [sys.executable, "-m", "framewright_tpu.cli", "farm", "work",
             str(self.job_dir), "--device", "cpu"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            env={**spec.env, "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": ":".join(sys.path)},
        )
        inst = CloudInstance(self.name, str(proc.pid), status="running",
                             started_at=time.time())
        self._procs[inst.instance_id] = proc
        return inst

    def status(self, instance: CloudInstance) -> str:
        proc = self._procs.get(instance.instance_id)
        if proc is None:
            return "stopped"
        return "running" if proc.poll() is None else "stopped"

    def terminate(self, instance: CloudInstance) -> None:
        proc = self._procs.pop(instance.instance_id, None)
        if proc is not None and proc.poll() is None:
            proc.terminate()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
        instance.status = "stopped"


PROVIDERS = {
    "runpod": RunPodProvider,
    "vastai": VastAIProvider,
    "gcp-tpu": TPUPodProvider,
    "local": LocalSubprocessProvider,
}


# ---------------------------------------------------------------------------
# Storage (reference cloud/storage.py:11-482)
# ---------------------------------------------------------------------------

class CloudStorage(ABC):
    @abstractmethod
    def upload(self, local: Path, remote_key: str) -> None: ...

    @abstractmethod
    def download(self, remote_key: str, local: Path) -> None: ...

    @abstractmethod
    def exists(self, remote_key: str) -> bool: ...


class LocalDirStorage(CloudStorage):
    """Shared-directory storage (NFS/gcsfuse mounts; also the test
    backend)."""

    def __init__(self, root: Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def upload(self, local: Path, remote_key: str) -> None:
        dst = self.root / remote_key
        dst.parent.mkdir(parents=True, exist_ok=True)
        tmp = dst.with_suffix(dst.suffix + ".tmp")
        shutil.copyfile(local, tmp)
        tmp.rename(dst)

    def download(self, remote_key: str, local: Path) -> None:
        local.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(self.root / remote_key, local)

    def exists(self, remote_key: str) -> bool:
        return (self.root / remote_key).exists()


def sigv4_headers(method: str, url: str, region: str, service: str,
                  access_key: str, secret_key: str, payload: bytes,
                  amz_date: str) -> Dict[str, str]:
    """AWS Signature Version 4 (hmac/hashlib only, no boto3). amz_date
    is 'YYYYMMDDTHHMMSSZ' — injected for determinism/testability."""
    parsed = urllib.parse.urlparse(url)
    host = parsed.netloc
    # the URL path arrives already percent-encoded; keep '%' safe so the
    # encoded sequences aren't double-encoded, but escape anything raw
    canonical_uri = urllib.parse.quote(parsed.path or "/", safe="/%")
    if parsed.query:
        pairs = urllib.parse.parse_qsl(parsed.query, keep_blank_values=True)
        enc = [(urllib.parse.quote(k, safe="-_.~"),
                urllib.parse.quote(v, safe="-_.~")) for k, v in pairs]
        canonical_query = "&".join(f"{k}={v}" for k, v in sorted(enc))
    else:
        canonical_query = ""
    payload_hash = hashlib.sha256(payload).hexdigest()
    datestamp = amz_date[:8]
    canonical_headers = (f"host:{host}\nx-amz-content-sha256:{payload_hash}\n"
                         f"x-amz-date:{amz_date}\n")
    signed_headers = "host;x-amz-content-sha256;x-amz-date"
    canonical_request = "\n".join([
        method, canonical_uri, canonical_query, canonical_headers,
        signed_headers, payload_hash])
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical_request.encode()).hexdigest()])

    def _hmac(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = _hmac(("AWS4" + secret_key).encode(), datestamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    k = _hmac(k, "aws4_request")
    signature = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()
    return {
        "x-amz-date": amz_date,
        "x-amz-content-sha256": payload_hash,
        "Authorization": (
            f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
            f"SignedHeaders={signed_headers}, Signature={signature}"),
    }


class S3Storage(CloudStorage):
    """S3 REST with in-process SigV4 (reference shelled to rclone)."""

    def __init__(self, bucket: str, region: str = "us-east-1",
                 access_key: str = "", secret_key: str = "",
                 transport: Optional[Transport] = None,
                 now: Callable[[], str] = None):
        self.bucket = bucket
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.transport = transport or _urllib_transport
        self.now = now or (lambda: time.strftime("%Y%m%dT%H%M%SZ", time.gmtime()))

    def _url(self, key: str) -> str:
        return (f"https://{self.bucket}.s3.{self.region}.amazonaws.com/"
                f"{urllib.parse.quote(key)}")

    def _request(self, method: str, key: str, payload: bytes = b"") -> Tuple[int, Dict]:
        url = self._url(key)
        headers = sigv4_headers(method, url, self.region, "s3",
                                self.access_key, self.secret_key, payload,
                                self.now())
        return self.transport(method, url, headers, payload or None)

    def upload(self, local: Path, remote_key: str) -> None:
        status, data = self._request("PUT", remote_key, Path(local).read_bytes())
        if status != 200:
            raise CloudError(f"S3 upload {remote_key} failed ({status}): {data}")

    def download(self, remote_key: str, local: Path) -> None:
        status, data = self._request("GET", remote_key)
        if status != 200:
            raise CloudError(f"S3 download {remote_key} failed ({status})")
        Path(local).parent.mkdir(parents=True, exist_ok=True)
        Path(local).write_bytes(_as_bytes(data))

    def exists(self, remote_key: str) -> bool:
        status, _ = self._request("HEAD", remote_key)
        return status == 200


class GCSStorage(CloudStorage):
    """GCS JSON API with a bearer token."""

    def __init__(self, bucket: str, token: str = "",
                 transport: Optional[Transport] = None):
        self.bucket = bucket
        self.token = token
        self.transport = transport or _urllib_transport

    def _headers(self) -> Dict[str, str]:
        return {"Authorization": f"Bearer {self.token}"}

    def upload(self, local: Path, remote_key: str) -> None:
        url = (f"https://storage.googleapis.com/upload/storage/v1/b/"
               f"{self.bucket}/o?uploadType=media&name="
               f"{urllib.parse.quote(remote_key, safe='')}")
        status, data = self.transport("POST", url, self._headers(),
                                      Path(local).read_bytes())
        if status != 200:
            raise CloudError(f"GCS upload failed ({status}): {data}")

    def download(self, remote_key: str, local: Path) -> None:
        url = (f"https://storage.googleapis.com/storage/v1/b/{self.bucket}"
               f"/o/{urllib.parse.quote(remote_key, safe='')}?alt=media")
        status, data = self.transport("GET", url, self._headers(), None)
        if status != 200:
            raise CloudError(f"GCS download failed ({status})")
        Path(local).parent.mkdir(parents=True, exist_ok=True)
        Path(local).write_bytes(_as_bytes(data))

    def exists(self, remote_key: str) -> bool:
        url = (f"https://storage.googleapis.com/storage/v1/b/{self.bucket}"
               f"/o/{urllib.parse.quote(remote_key, safe='')}")
        status, _ = self.transport("GET", url, self._headers(), None)
        return status == 200


class AzureBlobStorage(CloudStorage):
    """Azure Blob REST with in-process SharedKey signing (reference
    cloud/storage.py AzureStorage shelled to rclone; here the HMAC
    canonicalization is native, mirroring the S3 SigV4 approach)."""

    _VERSION = "2021-08-06"

    def __init__(self, account: str, container: str, account_key: str = "",
                 transport: Optional[Transport] = None,
                 now: Callable[[], str] = None):
        self.account = account
        self.container = container
        self.account_key = account_key
        self.transport = transport or _urllib_transport
        self.now = now or (lambda: time.strftime(
            "%a, %d %b %Y %H:%M:%S GMT", time.gmtime()))

    def _url(self, key: str) -> str:
        return (f"https://{self.account}.blob.core.windows.net/"
                f"{self.container}/{urllib.parse.quote(key)}")

    def _headers(self, method: str, key: str, payload: bytes) -> Dict[str, str]:
        import base64
        import hashlib
        import hmac

        date = self.now()
        xms = {"x-ms-blob-type": "BlockBlob",
               "x-ms-date": date,
               "x-ms-version": self._VERSION}
        if method != "PUT":
            xms.pop("x-ms-blob-type")
        length = str(len(payload)) if payload else ""
        # urllib auto-adds a Content-Type to any request with a body; an
        # unsigned default would 403 (AuthenticationFailed), so PUTs pin an
        # explicit octet-stream and sign it at the Content-Type slot.
        content_type = "application/octet-stream" if method == "PUT" else ""
        canon_headers = "".join(
            f"{k}:{v}\n" for k, v in sorted(xms.items()))
        canon_resource = (f"/{self.account}/{self.container}/"
                          f"{urllib.parse.quote(key)}")
        string_to_sign = "\n".join([
            method, "", "", length, "", content_type,
            "", "", "", "", "", "",
        ]) + "\n" + canon_headers + canon_resource
        signature = base64.b64encode(hmac.new(
            base64.b64decode(self.account_key or b"AA=="),
            string_to_sign.encode(), hashlib.sha256).digest()).decode()
        headers = {**xms,
                   "Authorization": f"SharedKey {self.account}:{signature}"}
        if content_type:
            headers["Content-Type"] = content_type
        return headers

    def upload(self, local: Path, remote_key: str) -> None:
        payload = Path(local).read_bytes()
        status, data = self.transport(
            "PUT", self._url(remote_key),
            self._headers("PUT", remote_key, payload), payload)
        if status not in (200, 201):
            raise CloudError(
                f"Azure upload {remote_key} failed ({status}): {data}")

    def download(self, remote_key: str, local: Path) -> None:
        status, data = self.transport(
            "GET", self._url(remote_key),
            self._headers("GET", remote_key, b""), None)
        if status != 200:
            raise CloudError(f"Azure download {remote_key} failed ({status})")
        Path(local).parent.mkdir(parents=True, exist_ok=True)
        Path(local).write_bytes(_as_bytes(data))

    def exists(self, remote_key: str) -> bool:
        status, _ = self.transport(
            "HEAD", self._url(remote_key),
            self._headers("HEAD", remote_key, b""), None)
        return status == 200


class GoogleDriveStorage(CloudStorage):
    """Google Drive v3 with an OAuth bearer token (reference
    cloud/gdrive.py:52 GoogleDriveStorage via rclone remotes; here the
    multipart upload + name-query lookup run over the plain REST API).
    ``remote_key`` maps to a file name inside ``folder_id``."""

    _API = "https://www.googleapis.com/drive/v3"
    _UPLOAD = "https://www.googleapis.com/upload/drive/v3"

    def __init__(self, token: str = "", folder_id: str = "root",
                 transport: Optional[Transport] = None):
        self.token = token
        self.folder_id = folder_id
        self.transport = transport or _urllib_transport

    def _headers(self, extra: Optional[Dict[str, str]] = None) -> Dict[str, str]:
        h = {"Authorization": f"Bearer {self.token}"}
        h.update(extra or {})
        return h

    def _find(self, remote_key: str) -> Optional[str]:
        name = remote_key.replace("'", "\\'")
        q = urllib.parse.quote(
            f"name = '{name}' and '{self.folder_id}' in parents "
            f"and trashed = false")
        status, data = self.transport(
            "GET", f"{self._API}/files?q={q}&fields=files(id,name)",
            self._headers(), None)
        if status != 200:
            raise CloudError(f"GDrive list failed ({status}): {data}")
        files = _as_json(data).get("files", [])
        return files[0]["id"] if files else None

    def upload(self, local: Path, remote_key: str) -> None:
        # Drive allows duplicate names in a folder; a repeated upload must
        # update the existing file in place or download()/exists() would
        # later resolve an arbitrary stale copy.
        existing = self._find(remote_key)
        if existing is not None:
            status, data = self.transport(
                "PATCH",
                f"{self._UPLOAD}/files/{existing}?uploadType=media",
                self._headers({"Content-Type": "application/octet-stream"}),
                Path(local).read_bytes())
            if status != 200:
                raise CloudError(f"GDrive update failed ({status}): {data}")
            return
        boundary = "fw-boundary-7b3d"
        meta = json.dumps({"name": remote_key,
                           "parents": [self.folder_id]})
        body = (
            f"--{boundary}\r\n"
            "Content-Type: application/json; charset=UTF-8\r\n\r\n"
            f"{meta}\r\n"
            f"--{boundary}\r\n"
            "Content-Type: application/octet-stream\r\n\r\n"
        ).encode() + Path(local).read_bytes() + f"\r\n--{boundary}--".encode()
        status, data = self.transport(
            "POST", f"{self._UPLOAD}/files?uploadType=multipart",
            self._headers({"Content-Type":
                           f"multipart/related; boundary={boundary}"}),
            body)
        if status != 200:
            raise CloudError(f"GDrive upload failed ({status}): {data}")

    def download(self, remote_key: str, local: Path) -> None:
        fid = self._find(remote_key)
        if fid is None:
            raise CloudError(f"GDrive: {remote_key!r} not found")
        status, data = self.transport(
            "GET", f"{self._API}/files/{fid}?alt=media",
            self._headers(), None)
        if status != 200:
            raise CloudError(f"GDrive download failed ({status})")
        Path(local).parent.mkdir(parents=True, exist_ok=True)
        Path(local).write_bytes(_as_bytes(data))

    def exists(self, remote_key: str) -> bool:
        return self._find(remote_key) is not None


# ---------------------------------------------------------------------------
# Burst manager (reference cloud/burst.py:83)
# ---------------------------------------------------------------------------

@dataclass
class BurstPolicy:
    """When to burst and how much (reference: local-capacity-triggered)."""

    max_instances: int = 4
    min_chunks_per_instance: int = 2       # don't rent for tiny jobs
    budget_usd: float = 10.0
    local_fps_threshold: float = 0.0       # burst if local fps below this


class CloudBurstManager:
    """Split a restore into chunks, run some remotely, merge.

    Flow: stage the source + per-chunk manifests through storage, rent
    instances (each boots a worker that claims chunks — the multihost
    shared-dir protocol, parallel/multihost.py), watch part completion,
    download and concatenate, always terminate instances (the
    reference's auto-destroy guarantee)."""

    def __init__(self, provider: CloudProvider, storage: CloudStorage,
                 policy: Optional[BurstPolicy] = None):
        self.provider = provider
        self.storage = storage
        self.policy = policy or BurstPolicy()
        self.instances: List[CloudInstance] = []
        self._lock = threading.Lock()

    def should_burst(self, total_chunks: int, local_fps: float = 1e9) -> bool:
        p = self.policy
        if total_chunks < 2 * p.min_chunks_per_instance:
            return False
        if local_fps < p.local_fps_threshold:
            return True
        return total_chunks >= 2 * p.min_chunks_per_instance

    def instances_for(self, total_chunks: int) -> int:
        p = self.policy
        return max(1, min(p.max_instances,
                          total_chunks // p.min_chunks_per_instance))

    def provision_fleet(self, spec: InstanceSpec, n: int) -> List[CloudInstance]:
        for _ in range(n):
            est = sum(i.usd_per_hour for i in self.instances)
            if est + spec.max_usd_per_hour > self.policy.budget_usd:
                logger.warning("burst budget reached at %d instances",
                               len(self.instances))
                break
            inst = self.provider.provision(spec)
            with self._lock:
                self.instances.append(inst)
        return self.instances

    def teardown(self) -> float:
        """Terminate everything; returns total cost estimate."""
        cost = 0.0
        with self._lock:
            insts, self.instances = self.instances, []
        for inst in insts:
            cost += inst.cost_so_far()
            try:
                self.provider.terminate(inst)
            except CloudError:
                logger.exception("terminate %s failed", inst.instance_id)
        return round(cost, 4)

    def run(self, source: Path, output: Path, total_frames: int,
            config: Optional[Dict] = None, spec: Optional[InstanceSpec] = None,
            chunk_frames: int = 100, timeout: float = 3600.0) -> Path:
        """Full burst job over the shared-dir worker protocol: stage the
        source through storage, rent a fleet sized to the chunk count,
        coordinate until parts complete, merge, always tear down."""
        import threading as _t

        from framewright_tpu.parallel.multihost import (
            RenderJob,
            run_coordinator,
        )

        if not isinstance(self.storage, LocalDirStorage):
            raise CloudError(
                "burst execution currently requires LocalDirStorage (a "
                "shared mount); S3/GCS staging is upload/download only")
        job_dir = self.storage.root
        job_dir.mkdir(parents=True, exist_ok=True)
        self.storage.upload(Path(source), "source.y4m")
        job = RenderJob(
            job_id="burst", source=str(job_dir / "source.y4m"),
            output=str(job_dir / "merged.y4m"), config=config or {},
            total_frames=total_frames, chunk_frames=chunk_frames,
        )
        if isinstance(self.provider, LocalSubprocessProvider):
            self.provider.job_dir = job_dir
        n = self.instances_for(len(job.chunks()))
        try:
            # provision AFTER a short delay so job.json exists when
            # workers boot; run_coordinator submits it first thing
            timer = _t.Timer(0.2, self.provision_fleet,
                             args=(spec or InstanceSpec(), n))
            timer.start()
            merged = run_coordinator(job_dir, job, timeout=timeout)
            timer.join()
            shutil.copyfile(merged, output)
            return Path(output)
        finally:
            cost = self.teardown()
            logger.info("burst complete; estimated cost $%.4f", cost)
