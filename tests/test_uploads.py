"""Publishing integrations (uploads.py): Archive.org IAS3, YouTube
resumable protocol, email/SMS notification routing — all offline via
injectable transports (reference integration/archive_org.py,
youtube_upload.py, notifications.py)."""

import json

import pytest

from framewright_tpu.events import EventBus, EventType
from framewright_tpu.uploads import (
    ArchiveMetadata,
    ArchiveUploader,
    EmailConfig,
    EmailSender,
    NotificationRouter,
    SMSSender,
    YouTubeMetadata,
    YouTubeUploader,
)


class FakeTransport:
    def __init__(self, script):
        self.script = list(script)      # [(status, body-dict-or-bytes)]
        self.calls = []

    def __call__(self, method, url, headers, body):
        self.calls.append((method, url, dict(headers), body))
        return self.script.pop(0)


@pytest.fixture()
def video(tmp_path):
    p = tmp_path / "out.y4m"
    p.write_bytes(b"YUV4MPEG2 fake video payload " * 100)
    return p


class TestArchive:
    def test_metadata_validation(self):
        bad = ArchiveMetadata(identifier="x", title="")
        errs = bad.validate()
        assert len(errs) == 2
        assert not ArchiveMetadata(identifier="my-film_1936",
                                   title="Film").validate()

    def test_upload_headers_and_url(self, video):
        t = FakeTransport([(200, b"")])
        up = ArchiveUploader("AK", "SK", transport=t)
        meta = ArchiveMetadata(identifier="my-film", title="My Film",
                               creator="Me", subjects=["silent", "16mm"])
        result = up.upload(video, meta)
        assert result.ok
        assert result.url.endswith("/details/my-film")
        method, url, headers, body = t.calls[0]
        assert method == "PUT"
        assert url == "https://s3.us.archive.org/my-film/out.y4m"
        assert headers["authorization"] == "LOW AK:SK"
        assert headers["x-archive-meta-title"] == "My Film"
        assert headers["x-archive-meta01-subject"] == "silent"
        assert body == video.read_bytes()

    def test_unauthenticated_refused(self, video):
        up = ArchiveUploader(transport=FakeTransport([]))
        result = up.upload(video, ArchiveMetadata(identifier="abc",
                                                  title="T"))
        assert not result and "keys" in result.error

    def test_identifier_availability(self):
        taken = FakeTransport([(200, {"metadata": {"title": "x"}})])
        assert not ArchiveUploader("a", "s",
                                   transport=taken).check_identifier_available("x")
        free = FakeTransport([(404, b"")])
        assert ArchiveUploader("a", "s",
                               transport=free).check_identifier_available("y")


class TestYouTube:
    def test_resumable_upload_flow(self, video):
        t = FakeTransport([
            (200, {"location": "https://upload.example/session1"}),
            (200, {"id": "vid123"}),
        ])
        up = YouTubeUploader("TOKEN", transport=t)
        result = up.upload(video, YouTubeMetadata(title="Restored"))
        assert result.ok and result.item_id == "vid123"
        assert result.url == "https://youtu.be/vid123"
        open_call, put_call = t.calls
        assert open_call[0] == "POST"
        snippet = json.loads(open_call[3])
        assert snippet["snippet"]["title"] == "Restored"
        assert snippet["status"]["privacyStatus"] == "private"
        assert put_call[1] == "https://upload.example/session1"
        assert put_call[2]["content-range"].startswith("bytes 0-")

    def test_chunked_with_308(self, video):
        data = video.read_bytes()
        t = FakeTransport([
            (200, {"location": "https://u/session"}),
            (308, b""),
            (200, {"id": "v2"}),
        ])
        up = YouTubeUploader("TOKEN", transport=t)
        up.CHUNK = len(data) // 2 + 1
        result = up.upload(video, YouTubeMetadata(title="T"))
        assert result.ok
        assert len(t.calls) == 3

    def test_token_refresh(self):
        t = FakeTransport([(200, {"access_token": "fresh"})])
        up = YouTubeUploader(transport=t)
        assert up.refresh_access_token("cid", "sec", "rtok")
        assert up.access_token == "fresh"
        assert "grant_type=refresh_token" in t.calls[0][3].decode()

    def test_bad_metadata(self, video):
        up = YouTubeUploader("TOKEN", transport=FakeTransport([]))
        result = up.upload(video, YouTubeMetadata(title="x" * 200,
                                                  privacy="everyone"))
        assert not result and "100 chars" in result.error


class FakeSMTP:
    instances = []

    def __init__(self, host, port):
        self.host, self.port = host, port
        self.tls = False
        self.sent = []
        FakeSMTP.instances.append(self)

    def starttls(self):
        self.tls = True

    def login(self, u, p):
        self.creds = (u, p)

    def sendmail(self, frm, to, msg):
        self.sent.append((frm, to, msg))

    def quit(self):
        pass


class TestNotifications:
    def test_email_send(self):
        FakeSMTP.instances.clear()
        cfg = EmailConfig(smtp_host="smtp.test", username="u@test",
                          password="pw", recipients=["a@b.c"])
        sender = EmailSender(cfg, smtp_factory=FakeSMTP)
        assert sender.send("done", "job finished")
        smtp = FakeSMTP.instances[0]
        assert smtp.tls and smtp.creds == ("u@test", "pw")
        frm, to, msg = smtp.sent[0]
        assert to == ["a@b.c"] and "done" in msg

    def test_sms_send(self):
        t = FakeTransport([(200, b"")])
        sms = SMSSender("https://gw.test/send", api_key="k", transport=t)
        assert sms.send("+15550100", "job complete")
        method, url, headers, body = t.calls[0]
        assert headers["authorization"] == "Bearer k"
        assert json.loads(body)["to"] == "+15550100"

    def test_router_fans_out_on_events(self):
        FakeSMTP.instances.clear()
        email = EmailSender(
            EmailConfig(smtp_host="h", recipients=["x@y.z"],
                        use_tls=False),
            smtp_factory=FakeSMTP)
        sms_t = FakeTransport([(200, b""), (200, b"")])
        router = NotificationRouter(
            email=email, sms_sender=SMSSender("https://gw", transport=sms_t),
            sms_to="+1555")
        bus = EventBus()
        router.attach(bus)
        bus.emit(EventType.JOB_COMPLETED, source="t", job_id="j1")
        assert "email:job_completed" in router.sent
        assert "sms:job_completed" in router.sent
        bus.emit(EventType.PROGRESS, source="t")   # not routed
        assert len([s for s in router.sent if "progress" in s]) == 0
