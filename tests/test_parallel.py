"""Mesh, sharded execution, chunk queue, and multi-host coordination
tests — on the virtual 8-device CPU mesh (the reference's analog: mocked
nvidia-smi GPU lists, tests/test_multi_gpu.py)."""

import json
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.errors import ShardingError
from framewright_tpu.parallel.distributor import (
    ChunkQueue,
    ChunkState,
    ShardedFrameProcessor,
    make_scene_chunks,
)
from framewright_tpu.parallel.mesh import build_mesh, frame_sharding, shard_frames
from framewright_tpu.parallel.multihost import (
    RenderJob,
    SharedDirCoordinator,
    SharedDirWorker,
)


class TestMesh:
    def test_default_mesh_all_devices(self):
        mesh = build_mesh()
        assert mesh.shape["frames"] == len(jax.devices())

    def test_2d_mesh(self):
        mesh = build_mesh((4, 2))
        assert mesh.shape == {"frames": 4, "space": 2}

    def test_too_many_devices(self):
        with pytest.raises(ShardingError):
            build_mesh((64,))

    def test_shard_frames_divisibility(self):
        mesh = build_mesh((8,))
        with pytest.raises(ShardingError):
            shard_frames(np.zeros((3, 4, 4, 3)), mesh)
        out = shard_frames(np.zeros((16, 4, 4, 3), np.float32), mesh)
        assert out.shape == (16, 4, 4, 3)


class TestSceneChunks:
    def test_plain_split(self):
        chunks = make_scene_chunks(250, 100)
        assert [(c.start, c.end) for c in chunks] == [(0, 100), (100, 200), (200, 250)]

    def test_snaps_to_scene_boundary(self):
        chunks = make_scene_chunks(300, 100, scene_boundaries=[90, 215])
        assert chunks[0].end == 90      # snapped from 100
        assert chunks[2].end == 215 or chunks[1].end == 215

    def test_covers_everything_once(self):
        chunks = make_scene_chunks(997, 64, scene_boundaries=[100, 130, 555])
        assert chunks[0].start == 0
        assert chunks[-1].end == 997
        for a, b in zip(chunks, chunks[1:]):
            assert a.end == b.start


class TestChunkQueue:
    def test_assign_complete(self):
        q = ChunkQueue(make_scene_chunks(30, 10))
        c1 = q.next_pending("w1")
        assert c1.index == 0 and c1.state is ChunkState.ASSIGNED
        q.complete(0)
        assert q.chunks[0].state is ChunkState.DONE
        assert not q.done
        q.complete(q.next_pending("w1").index)
        q.complete(q.next_pending("w1").index)
        assert q.done
        assert q.progress == 1.0

    def test_fail_requeues_until_max(self):
        q = ChunkQueue(make_scene_chunks(10, 10), max_attempts=2)
        c = q.next_pending()
        q.fail(c.index)
        assert q.chunks[0].state is ChunkState.PENDING
        c = q.next_pending()
        q.fail(c.index)
        assert q.chunks[0].state is ChunkState.FAILED


class TestShardedProcessor:
    def test_matches_single_device(self, rng):
        mesh = build_mesh((8,))
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 3)).astype(np.float32) * 0.2)

        def fn(params, x):
            return jax.lax.conv_general_dilated(
                x, params, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        proc = ShardedFrameProcessor(fn, w, mesh=mesh)
        batch = rng.standard_normal((11, 16, 16, 3)).astype(np.float32)  # pads to 16
        out = proc.process(batch)
        assert out.shape == (11, 16, 16, 3)
        ref = np.asarray(fn(w, jnp.asarray(batch)))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_speedup_model(self):
        assert ShardedFrameProcessor.estimate_speedup(8) > 7.5


class TestMultiHost:
    def _job(self, tmp_path, total=30):
        return RenderJob(
            job_id="j1", source="src.y4m", output=str(tmp_path / "out.y4m"),
            config={"scale": 2}, total_frames=total, chunk_frames=10,
        )

    def _fake_processor(self, gradient_frame):
        from framewright_tpu.io.y4m import Y4MWriter

        def process_chunk(chunk, part_path):
            with Y4MWriter(part_path, 64, 48, fps=24) as w:
                for t in range(chunk.start, chunk.end):
                    w.write_frame(gradient_frame(48, 64, t))

        return process_chunk

    def test_single_worker_completes_job(self, tmp_path, gradient_frame):
        job = self._job(tmp_path)
        coord = SharedDirCoordinator(tmp_path / "farm")
        coord.submit(job)
        worker = SharedDirWorker(tmp_path / "farm", "w1")
        n = worker.work_loop(coord.load_job(), self._fake_processor(gradient_frame))
        assert n == 3
        assert coord.is_complete(3)
        out = coord.merge(job)
        from framewright_tpu.io.y4m import Y4MReader

        with Y4MReader(out) as r:
            assert r.count_frames() == 30

    def test_two_workers_split_chunks(self, tmp_path, gradient_frame):
        job = self._job(tmp_path, total=60)
        coord = SharedDirCoordinator(tmp_path / "farm")
        coord.submit(job)
        proc = self._fake_processor(gradient_frame)
        counts = {}

        def run(wid):
            w = SharedDirWorker(tmp_path / "farm", wid)
            counts[wid] = w.work_loop(coord.load_job(), proc)

        threads = [threading.Thread(target=run, args=(f"w{i}",)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sum(counts.values()) == 6       # every chunk exactly once
        assert coord.is_complete(6)

    def test_stale_reassignment(self, tmp_path, gradient_frame):
        job = self._job(tmp_path)
        coord = SharedDirCoordinator(tmp_path / "farm", heartbeat_timeout=0.01)
        coord.submit(job)
        # dead worker claims chunk 0 and never reports
        dead = SharedDirWorker(tmp_path / "farm", "dead")
        chunks = job.chunks()
        claimed = dead.claim_chunk(chunks)
        assert claimed.index == 0
        import time

        time.sleep(0.05)
        assert coord.reassign_stale() == 1
        # a live worker can now claim it
        live = SharedDirWorker(tmp_path / "farm", "live")
        live.heartbeat()
        c = live.claim_chunk(job.chunks())
        assert c.index == 0

    def test_worker_heartbeat_visible(self, tmp_path):
        coord = SharedDirCoordinator(tmp_path / "farm")
        w = SharedDirWorker(tmp_path / "farm", "w9")
        w.heartbeat()
        assert "w9" in coord.live_workers()


class TestShardedDenoise:
    def test_mesh_matches_unsharded(self, rng):
        """Temporal denoise sharded over the frames mesh must equal the
        unsharded batched path (BASELINE config-5 recipe stage)."""
        from framewright_tpu.processors.temporal_denoise import (
            TemporalDenoiseConfig,
            TemporalDenoiser,
        )

        base = (rng.random((16, 16, 3)) * 200).astype(np.float32)
        frames = [
            np.clip(base + rng.normal(0, 12, base.shape), 0, 255).astype(np.uint8)
            for _ in range(10)
        ]
        common = dict(radius=2, strength=1.0, method="temporal",
                      scene_change_threshold=9.9)
        sharded = TemporalDenoiser(TemporalDenoiseConfig(
            sharding="data", **common))
        sharded.setup(16, 16)
        assert sharded._mesh is not None
        assert sharded._batch == len(jax.devices())
        single = TemporalDenoiser(TemporalDenoiseConfig(
            sharding="none", **common))
        single.setup(16, 16)
        a = list(sharded.denoise_stream(iter(frames)))
        b = list(single.denoise_stream(iter(frames)))
        assert len(a) == len(b) == 10
        for fa, fb in zip(a, b):
            np.testing.assert_allclose(fa.astype(int), fb.astype(int), atol=1)


class TestShardedInterpolation:
    def test_mesh_matches_unsharded(self, rng):
        """IFNet midpoint synthesis sharded over pair batches must equal
        the unsharded path."""
        from framewright_tpu.processors.interpolation import (
            FrameInterpolator,
            InterpolationConfig,
        )

        frames = [
            (rng.random((16, 16, 3)) * 255).astype(np.uint8) for _ in range(7)
        ]
        sharded = FrameInterpolator(InterpolationConfig(sharding="data"))
        sharded.setup(16, 16)
        assert sharded._mesh is not None
        single = FrameInterpolator(InterpolationConfig(sharding="none"))
        single.setup(16, 16)
        a = list(sharded.interpolate_stream(iter(frames), 2))
        b = list(single.interpolate_stream(iter(frames), 2))
        assert len(a) == len(b) == 13
        for fa, fb in zip(a, b):
            np.testing.assert_allclose(fa.astype(int), fb.astype(int), atol=1)


class TestShardedVSR:
    def test_mesh_matches_unsharded(self, rng):
        """Recurrent VSR with the window height sharded over a ``space``
        mesh (XLA conv halo exchanges) must equal unsharded."""
        from framewright_tpu.processors.video_sr import (
            VideoSuperResolution,
            VSRConfig,
        )

        common = dict(model_name="BasicVSR", chunk=4, overlap=1,
                      compute_dtype="float32")
        sharded = VideoSuperResolution(VSRConfig(sharding="spatial", **common))
        sharded.setup(16, 16)
        assert sharded._mesh is not None
        single = VideoSuperResolution(VSRConfig(sharding="none", **common))
        single.setup(16, 16)
        frames = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
        a = sharded.process_batch(frames)
        b = single.process_batch(frames)
        assert a.shape == b.shape == (4, 64, 64, 3)
        # random weights saturate the output at 0/255: reduction-order
        # epsilon from the halo exchange flips a small fraction of
        # hard-clipped pixels, so gate on the mismatch fraction
        mismatch = (np.abs(a.astype(int) - b.astype(int)) > 1).mean()
        assert mismatch < 0.02, f"{mismatch:.2%} pixels differ"


class TestShardedSR:
    def test_sr_uses_mesh_and_matches_unsharded(self, rng, tmp_path):
        from framewright_tpu.processors.super_resolution import SRConfig, SuperResolution

        common = dict(model_name="realesr-animevideov3", compute_dtype="float32",
                      weights_dir=str(tmp_path))
        sharded = SuperResolution(SRConfig(sharding="data", **common))
        sharded.setup(16, 16)
        assert sharded._mesh is not None
        single = SuperResolution(SRConfig(sharding="none", **common))
        single.setup(16, 16)
        frames = rng.integers(0, 256, (5, 16, 16, 3), dtype=np.uint8)  # pads to 8
        a = sharded.process_batch(frames)
        b = single.process_batch(frames)
        assert a.shape == b.shape == (5, 64, 64, 3)
        np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)

    def test_sr_2d_mesh_spatial_sharding_matches_unsharded(self, rng, tmp_path):
        """frames x space mesh: height-axis sharding makes XLA insert
        conv halo exchanges; numerics must match the unsharded path."""
        from framewright_tpu.processors.super_resolution import SRConfig, SuperResolution

        common = dict(model_name="realesr-animevideov3", compute_dtype="float32",
                      weights_dir=str(tmp_path), device_stats=True)
        sharded = SuperResolution(SRConfig(sharding="2d", **common))
        sharded.setup(16, 16)
        assert sharded._mesh is not None and sharded._spatial
        assert dict(sharded._mesh.shape) == {"frames": 4, "space": 2}
        single = SuperResolution(SRConfig(sharding="none", **common))
        single.setup(16, 16)
        frames = rng.integers(0, 256, (5, 16, 16, 3), dtype=np.uint8)
        ha = sharded.dispatch(frames)
        a = sharded.materialize(ha)
        b = single.process_batch(frames)
        assert a.shape == b.shape == (5, 64, 64, 3)
        np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)
        stats = ha.get("stats_np")
        assert stats is not None and stats["psnr"].shape == (5,)
        assert np.all(np.isfinite(stats["psnr"]))
