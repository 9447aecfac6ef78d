"""I/O layer tests: Y4M container, PNG sequences, unified API, ring buffer."""

import io
from pathlib import Path

import numpy as np
import pytest

from framewright_tpu.errors import InputError, MediaFormatError
from framewright_tpu.io import color
from framewright_tpu.io.png_seq import FrameDirReader, FrameDirWriter, list_frames
from framewright_tpu.io.ring import PrefetchRing, WriterDrain
from framewright_tpu.io.video import open_reader, open_writer, probe
from framewright_tpu.io.y4m import Y4MHeader, Y4MReader, Y4MWriter


class TestColor:
    def test_yuv_rgb_luma_preserved_on_noise(self, rng):
        # 4:2:0 chroma subsampling destroys decorrelated chroma, but the
        # luma of the reconstruction must match the luma of the source.
        rgb = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        y, u, v = color.rgb_to_yuv420(rgb, full_range=True)
        back = color.yuv420_to_rgb(y, u, v, full_range=True)
        y2, _, _ = color.rgb_to_yuv420(back, full_range=True)
        err = np.abs(y2.astype(int) - y.astype(int)).mean()
        assert err < 2

    def test_limited_range_roundtrip(self, gradient_frame):
        rgb = gradient_frame(48, 64, 3)
        y, u, v = color.rgb_to_yuv420(rgb, full_range=False)
        back = color.yuv420_to_rgb(y, u, v, full_range=False)
        err = np.abs(back.astype(int) - rgb.astype(int)).mean()
        assert err < 12

    def test_gray_preserved_exactly_ish(self):
        rgb = np.full((16, 16, 3), 128, dtype=np.uint8)
        y, u, v = color.rgb_to_yuv420(rgb, full_range=True)
        back = color.yuv420_to_rgb(y, u, v, full_range=True)
        assert np.abs(back.astype(int) - 128).max() <= 1

    def test_jax_variants_match_numpy(self):
        rgb = np.linspace(0, 1, 16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
        yuv = color.rgb_to_yuv_jax(rgb, full_range=True)
        back = np.asarray(color.yuv_to_rgb_jax(yuv, full_range=True))
        assert np.abs(back - rgb).max() < 1e-3


class TestY4M:
    def test_header_roundtrip(self):
        h = Y4MHeader(1920, 1080, fps=__import__("fractions").Fraction(30000, 1001))
        parsed = Y4MHeader.parse(h.to_line())
        assert parsed.width == 1920 and parsed.height == 1080
        assert parsed.fps == h.fps

    def test_bad_magic(self):
        with pytest.raises(MediaFormatError):
            Y4MHeader.parse(b"RIFF....")

    def test_write_read_roundtrip(self, tmp_path, tiny_clip):
        path = tmp_path / "clip.y4m"
        with Y4MWriter(path, 64, 48, fps=25) as w:
            for f in tiny_clip:
                w.write_frame(f)
        with Y4MReader(path) as r:
            assert (r.width, r.height) == (64, 48)
            assert r.fps == 25.0
            assert r.count_frames() == len(tiny_clip)
            frames = list(r)
        assert len(frames) == len(tiny_clip)
        # lossy 4:2:0 but luma close
        err = np.abs(frames[0].astype(int) - tiny_clip[0].astype(int)).mean()
        assert err < 12

    def test_in_memory_stream(self, tiny_clip):
        buf = io.BytesIO()
        w = Y4MWriter(buf, 64, 48, fps=24)
        w.write_frame(tiny_clip[0])
        w.close()
        buf.seek(0)
        r = Y4MReader(buf)
        f = r.read_frame()
        assert f.shape == (48, 64, 3)
        assert r.read_frame() is None

    def test_wrong_frame_shape_rejected(self, tmp_path):
        w = Y4MWriter(tmp_path / "x.y4m", 64, 48)
        with pytest.raises(MediaFormatError):
            w.write_frame(np.zeros((10, 10, 3), np.uint8))

    def test_mono_colorspace(self, tmp_path, tiny_clip):
        path = tmp_path / "m.y4m"
        with Y4MWriter(path, 64, 48, colorspace="mono") as w:
            w.write_frame(tiny_clip[0])
        with Y4MReader(path) as r:
            f = r.read_frame()
        assert f.shape == (48, 64, 3)
        assert np.all(f[..., 0] == f[..., 1])


class TestFrameDir:
    def test_write_read_lossless(self, tmp_path, tiny_clip):
        d = tmp_path / "frames"
        with FrameDirWriter(d) as w:
            for f in tiny_clip[:4]:
                w.write_frame(f)
        paths = list_frames(d)
        assert [p.name for p in paths] == [f"frame_{i:06d}.png" for i in range(1, 5)]
        with FrameDirReader(d) as r:
            frames = list(r)
        assert len(frames) == 4
        np.testing.assert_array_equal(frames[2], tiny_clip[2])

    def test_empty_dir_raises(self, tmp_path):
        d = tmp_path / "empty"
        d.mkdir()
        with pytest.raises(InputError):
            FrameDirReader(d)

    def test_numeric_ordering_not_lexical(self, tmp_path, tiny_clip):
        d = tmp_path / "frames"
        d.mkdir()
        from framewright_tpu.io.png_seq import save_frame

        for i in (2, 10, 1):
            save_frame(d / f"frame_{i}.png", tiny_clip[0])
        assert [p.name for p in list_frames(d)] == ["frame_1.png", "frame_2.png", "frame_10.png"]


class TestUnifiedAPI:
    def test_probe_y4m(self, tiny_y4m):
        meta = probe(tiny_y4m)
        assert (meta.width, meta.height) == (64, 48)
        assert meta.nb_frames == 16
        assert meta.container == "y4m"

    def test_open_reader_missing(self, tmp_path):
        with pytest.raises(InputError):
            open_reader(tmp_path / "nope.y4m")

    def test_reader_writer_pipeline(self, tmp_path, tiny_y4m):
        out = tmp_path / "out.y4m"
        with open_reader(tiny_y4m) as r:
            with open_writer(out, r.width, r.height, fps=r.fps) as w:
                for f in r:
                    w.write_frame(f)
        assert probe(out).nb_frames == 16

    def test_frame_dir_writer_via_suffix(self, tmp_path, tiny_clip):
        d = tmp_path / "outdir"
        w = open_writer(d, 64, 48)
        w.write_frame(tiny_clip[0])
        w.close()
        assert (d / "frame_000001.png").exists()


class TestRing:
    def test_batching_and_padding(self, tiny_clip):
        ring = PrefetchRing(iter(tiny_clip), batch_size=5, depth=2)
        batches = list(ring)
        assert [b.valid for b in batches] == [5, 5, 5, 1]
        assert all(b.frames.shape == (5, 48, 64, 3) for b in batches)
        assert batches[1].start_frame == 5
        # padding repeats the last real frame
        np.testing.assert_array_equal(batches[3].frames[4], tiny_clip[15])

    def test_error_propagates(self):
        def bad_iter():
            yield np.zeros((8, 8, 3), np.uint8)
            raise RuntimeError("decode failed")

        ring = PrefetchRing(bad_iter(), batch_size=4)
        with pytest.raises(RuntimeError, match="decode failed"):
            list(ring)

    def test_skip_frames(self, tiny_clip):
        ring = PrefetchRing(iter(tiny_clip), batch_size=4, skip_frames=8, start_frame=8)
        batches = list(ring)
        assert sum(b.valid for b in batches) == 8
        assert batches[0].start_frame == 8

    def test_writer_drain(self, tiny_clip):
        out = []
        drain = WriterDrain(out.append, depth=2)
        drain.submit(tiny_clip[:4], valid=4)
        drain.submit(tiny_clip[4:8], valid=2)
        drain.close()
        assert len(out) == 6
        np.testing.assert_array_equal(out[4], tiny_clip[4])


class TestDownload:
    def test_build_command_flags(self):
        from framewright_tpu.io.download import build_command

        cmd = build_command("yt-dlp", "https://example.com/v", Path("/tmp/o.mp4"),
                            rate_limit="2M")
        assert cmd[0] == "yt-dlp" and cmd[-1] == "https://example.com/v"
        assert "--no-playlist" in cmd and "--limit-rate" in cmd

    def test_build_command_rejects_bad_scheme(self):
        import pytest as _pytest

        from framewright_tpu.errors import InputError
        from framewright_tpu.io.download import build_command

        with _pytest.raises(InputError):
            build_command("yt-dlp", "file:///etc/passwd", Path("/tmp/o"))

    def test_download_without_binary_is_clean_error(self, tmp_path, monkeypatch):
        import pytest as _pytest

        from framewright_tpu.errors import FramewrightError
        from framewright_tpu.io import download as dl

        monkeypatch.setattr(dl, "find_downloader", lambda: None)
        with _pytest.raises(FramewrightError, match="yt-dlp"):
            dl.download_video("https://example.com/v", tmp_path / "o.mp4")
