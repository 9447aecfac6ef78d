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
