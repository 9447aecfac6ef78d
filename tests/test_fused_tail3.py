"""Resident tail (tail3): the whole Real-ESRGAN tail on the merge
body's resident blocks (ops/fused_tail3.py), interpret-mode CPU.

Covers the new machinery beyond tail2: the in-kernel ring refresh
feeding conv_body (multi-block grids), the feat-skip operand, batch>1
(neighbor index clipping across frame boundaries is masked by
extents), and the int8-i32 merge body feeding the bf16 tail3 kernel.

Reference parity anchor: the tail of RRDBNet in the reference
(processors/pytorch_realesrgan.py) — conv_body + skip + up1/up2/hr/
conv_last with nearest-2x upsamples.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import rrdb


@pytest.fixture(scope="module")
def small_net():
    cfg = rrdb.RRDBConfig(num_block=2, scale=2)
    params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = rrdb.stack_body(params)
    fast = rrdb.make_fast_params(jax.device_get(params))
    return cfg, params, fast


class TestTail3:
    def test_bundle_built(self, small_net):
        _, _, fast = small_net
        assert "tail3_phase" in fast
        assert fast["tail3_phase"]["Ws"].shape == (64, 576)

    def test_single_block_matches_apply(self, small_net, monkeypatch):
        monkeypatch.setenv("FW_TAIL", "3")
        cfg, params, fast = small_net
        x = jnp.asarray(np.random.default_rng(5).random((1, 40, 56, 3)),
                        jnp.float32)
        want = np.asarray(rrdb.apply(params, x, cfg), np.float32)
        got = np.asarray(
            rrdb.apply_fast(params, fast, x.astype(jnp.bfloat16), cfg,
                            interpret=True), np.float32)
        assert got.shape == want.shape
        err = np.abs(want - got)
        assert err.max() < 0.05, err.max()
        assert err.mean() < 0.005, err.mean()

    def test_multiblock_batch_matches_apply(self, small_net, monkeypatch):
        # body 100x104 -> 2x2 grid of S=112 blocks; B=2 checks that the
        # clipped cross-frame neighbor reads are masked by extents
        monkeypatch.setenv("FW_TAIL", "3")
        cfg, params, fast = small_net
        x = jnp.asarray(np.random.default_rng(7).random((2, 200, 208, 3)),
                        jnp.float32)
        want = np.asarray(rrdb.apply(params, x, cfg), np.float32)
        got = np.asarray(
            rrdb.apply_fast(params, fast, x.astype(jnp.bfloat16), cfg,
                            interpret=True), np.float32)
        err = np.abs(want - got)
        assert err.max() < 0.05, err.max()
        assert err.mean() < 0.005, err.mean()

    def test_rgb_u8_out_mode_matches_epilogue(self, small_net, monkeypatch):
        # the in-kernel uint8 quantization must reproduce the SR jit's
        # production epilogue floor(clip(y,0,1)*255+0.5); f32-accum in
        # the kernel vs bf16 y in the fallback allows ±1 LSB
        monkeypatch.setenv("FW_TAIL", "3")
        cfg, params, fast = small_net
        x = jnp.asarray(np.random.default_rng(3).random((1, 40, 56, 3)),
                        jnp.bfloat16)
        ref = np.asarray(rrdb.apply_fast(params, fast, x, cfg,
                                         interpret=True), np.float32)
        want = np.floor(np.clip(ref, 0.0, 1.0) * 255.0 + 0.5)
        got = np.asarray(rrdb.apply_fast(params, fast, x, cfg,
                                         interpret=True,
                                         out_mode="rgb_u8"))
        assert got.dtype == np.uint8
        diff = np.abs(got.astype(np.float32) - want)
        assert diff.max() <= 1.0, diff.max()
        assert (diff > 0).mean() < 0.02, (diff > 0).mean()

    def test_yuv420_u8_out_mode_matches_epilogue(self, small_net,
                                                 monkeypatch):
        # in-kernel BT.601 CSC + 4:2:0 phase-row subsample vs the exact
        # XLA epilogue (rrdb._out_epilogue == super_resolution run())
        monkeypatch.setenv("FW_TAIL", "3")
        cfg, params, fast = small_net
        x = jnp.asarray(np.random.default_rng(4).random((2, 40, 56, 3)),
                        jnp.bfloat16)
        ref = rrdb.apply_fast(params, fast, x, cfg, interpret=True)
        want = jax.device_get(rrdb._out_epilogue(
            jnp.asarray(ref), "yuv420_u8", False))
        got = rrdb.apply_fast(params, fast, x, cfg, interpret=True,
                              out_mode="yuv420_u8")
        assert isinstance(got, tuple) and len(got) == 3
        for g, w, name in zip(got, want, "yuv"):
            g = np.asarray(g)
            assert g.shape == w.shape, (name, g.shape, w.shape)
            assert g.dtype == np.uint8
            diff = np.abs(g.astype(np.float32) - w.astype(np.float32))
            assert diff.max() <= 1.0, (name, diff.max())
            assert (diff > 0).mean() < 0.02, (name, (diff > 0).mean())

    def test_yuv420_retrace_across_batch_sizes(self, small_net,
                                               monkeypatch):
        # regression: yuv420_matrix was lru_cached returning jnp arrays;
        # the first jit trace cached a tracer and the SECOND batch size
        # died with UnexpectedTracerError (round-5 TPU bench)
        monkeypatch.setenv("FW_TAIL", "3")
        cfg, params, fast = small_net
        fwd = jax.jit(lambda p, fp, t: rrdb.apply_fast(
            p, fp, t, cfg, interpret=True, out_mode="yuv420_u8"))
        x1 = jnp.asarray(np.random.default_rng(5).random((1, 40, 56, 3)),
                         jnp.bfloat16)
        y1 = fwd(params, fast, x1)
        x3 = jnp.broadcast_to(x1, (3,) + x1.shape[1:])
        y3 = fwd(params, fast, x3)          # must not leak a tracer
        assert np.asarray(y3[0]).shape[0] == 3
        np.testing.assert_array_equal(np.asarray(y1[0])[0],
                                      np.asarray(y3[0])[0])

    def test_processor_fused_yuv_stats_path(self, monkeypatch, tmp_path):
        """The PRODUCTION fused output path through the SuperResolution
        processor: in-kernel YUV420 epilogue + luma-domain device stats
        in one program (FW_INTERPRET=1 runs the same program in the
        Pallas interpreter on CPU)."""
        monkeypatch.setenv("FW_TAIL", "3")
        monkeypatch.setenv("FW_INTERPRET", "1")
        from framewright_tpu.processors.super_resolution import (
            SRConfig,
            SuperResolution,
        )

        sr = SuperResolution(SRConfig(
            model_name="RealESRGAN_x4plus_anime_6B",
            compute_dtype="bfloat16", use_fused_kernel=True,
            sharding="none", device_stats=True, output_color="yuv420",
            weights_dir=str(tmp_path)))
        sr.setup(24, 32)
        assert sr._plan is not None and not sr._plan.tiled
        frames = np.random.default_rng(0).integers(
            0, 256, (1, 24, 32, 3), dtype=np.uint8)
        handle = sr.dispatch(frames)
        planes = sr.materialize(handle)
        assert isinstance(planes, tuple) and len(planes) == 3
        assert planes[0].shape == (1, 96, 128)
        assert planes[1].shape == planes[2].shape == (1, 48, 64)
        assert planes[0].dtype == np.uint8
        stats = handle.get("stats_np")
        assert stats is not None
        assert stats["psnr"].shape == (1,)
        assert np.all(np.isfinite(stats["psnr"]))
        assert bool(np.all(stats["finite"]))

    def test_out_mode_fallback_without_tail3(self, small_net, monkeypatch):
        # FW_TAIL=2 bypasses tail3 -> the XLA fallback epilogue must
        # produce the same contract (uint8 planes)
        monkeypatch.setenv("FW_TAIL", "2")
        cfg, params, fast = small_net
        x = jnp.asarray(np.random.default_rng(6).random((1, 40, 56, 3)),
                        jnp.bfloat16)
        got = rrdb.apply_fast(params, fast, x, cfg, interpret=True,
                              out_mode="yuv420_u8")
        assert isinstance(got, tuple) and len(got) == 3
        assert np.asarray(got[0]).shape == (1, 80, 112)
        assert np.asarray(got[1]).shape == (1, 40, 56)

    def test_int8_i32_body_tail3(self, small_net, monkeypatch):
        monkeypatch.setenv("FW_TAIL", "3")
        cfg, params, fast16 = small_net
        sample = jnp.asarray(
            np.random.default_rng(9).random((1, 64, 64, 3)), jnp.bfloat16)
        amax = rrdb.calibrate_act_scales(params, cfg, sample)
        fast8 = rrdb.make_fast_params(
            jax.device_get(params), compute_dtype="int8",
            act_amax=np.asarray(amax), int8_scheme="i32")
        assert "tail3_phase" in fast8
        x = jnp.asarray(np.random.default_rng(11).random((1, 40, 56, 3)),
                        jnp.bfloat16)
        ref16 = np.asarray(
            rrdb.apply_fast(params, fast16, x, cfg, interpret=True),
            np.float32)
        got8 = np.asarray(
            rrdb.apply_fast(params, fast8, x, cfg, interpret=True),
            np.float32)
        # int8 body quantization noise dominates; the tail itself is bf16
        psnr = -10 * np.log10(np.mean((ref16 - got8) ** 2) + 1e-12)
        assert psnr > 35, psnr
