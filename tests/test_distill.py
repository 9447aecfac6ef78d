"""SR training machinery (models/distill.py): synthetic degradations,
the 6-block student, teacher distillation, and the trained diffusion-SR
quality gate (VERDICT round-2 items 3 and 5)."""

import numpy as np
import pytest


class TestSyntheticData:
    def test_patch_structure(self):
        from framewright_tpu.models import distill

        rng = np.random.default_rng(0)
        hr = distill.synth_hr_patch(rng, 64)
        assert hr.shape == (64, 64, 3)
        assert 0.0 <= hr.min() and hr.max() <= 1.0
        # must contain real structure, not a constant
        assert hr.std() > 0.05

    def test_degrade_shapes_and_information_loss(self):
        from framewright_tpu.models import distill

        rng = np.random.default_rng(1)
        hr = distill.synth_hr_patch(rng, 64)
        lr = distill.degrade(rng, hr, 2)
        assert lr.shape == (32, 32, 3)
        # degradation must lose detail vs plain area downsample
        area = hr.reshape(32, 2, 32, 2, 3).mean((1, 3))
        assert np.abs(lr - area).mean() > 1e-4

    def test_batch(self):
        from framewright_tpu.models import distill

        rng = np.random.default_rng(2)
        lrs, hrs = distill.make_sr_batch(rng, 3, 32, 4)
        assert lrs.shape == (3, 8, 8, 3)
        assert hrs.shape == (3, 32, 32, 3)


@pytest.mark.slow
class TestStudentTraining:
    def test_supervised_loss_decreases(self):
        """A few steps on a tiny student must reduce the L1 loss."""
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import distill, rrdb

        cfg = rrdb.RRDBConfig(num_block=1, scale=2)
        rng = np.random.default_rng(3)
        lrs, hrs = distill.make_sr_batch(rng, 4, 48, 2)

        def l1(p):
            out = rrdb.apply(p, jnp.asarray(lrs), cfg)
            return float(jnp.mean(jnp.abs(out - jnp.asarray(hrs))))

        p0 = rrdb.stack_body(rrdb.init(jax.random.PRNGKey(0), cfg))
        before = l1(p0)
        trained = distill.train_student(cfg, steps=25, batch=4, hr_size=48,
                                        seed=3, mode="synthetic")
        after = l1(trained)
        assert after < before, (before, after)

    def test_distill_mode_tracks_teacher(self):
        """Distillation loss: student moves toward the teacher's output."""
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import distill, rrdb

        t_cfg = rrdb.RRDBConfig(num_block=2, scale=2)
        t_params = rrdb.stack_body(rrdb.init(jax.random.PRNGKey(9), t_cfg))
        s_cfg = rrdb.RRDBConfig(num_block=1, scale=2)
        rng = np.random.default_rng(4)
        lrs, _ = distill.make_sr_batch(rng, 4, 48, 2)

        def dist(p):
            s = rrdb.apply(p, jnp.asarray(lrs), s_cfg)
            t = rrdb.apply(t_params, jnp.asarray(lrs), t_cfg)
            return float(jnp.mean(jnp.abs(s - t)))

        p0 = rrdb.stack_body(rrdb.init(jax.random.PRNGKey(0), s_cfg))
        before = dist(p0)
        trained = distill.train_student(
            s_cfg, steps=25, batch=4, hr_size=48, seed=4,
            mode="distill", teacher=(t_params, t_cfg))
        assert dist(trained) < before

    def test_sampler_finetune_reduces_sample_mse(self):
        """End-to-end DDIM fine-tune: MSE of the SAMPLED output (the
        gate metric) must drop — this is the lever that took
        DiffusionSR_x4 from +0.26 to +0.60 dB over bicubic."""
        import jax
        import jax.numpy as jnp

        from framewright_tpu.models import diffusion_sr, distill

        cfg = diffusion_sr.DiffusionSRConfig(
            base_ch=8, ch_mults=(1, 2), time_dim=16, steps=2, scale=2)
        # held-out eval pairs: seed 99 != the training seed 5 below, so
        # the MSE drop measures generalization, not batch memorization
        rng = np.random.default_rng(99)
        lrs, hrs = distill.make_sr_batch(rng, 4, 32, 2)

        def sample_mse(p):
            out = diffusion_sr.apply(p, jnp.asarray(lrs), cfg)
            return float(jnp.mean((out - jnp.asarray(hrs)) ** 2))

        p0 = diffusion_sr.init(jax.random.PRNGKey(0), cfg)
        before = sample_mse(p0)
        trained = distill.finetune_sampler(
            cfg=cfg, steps=30, batch=4, hr_size=32, seed=5)
        assert sample_mse(trained) < before


@pytest.mark.slow
class TestTrainedCheckpoints:
    """Gates on the committed in-repo checkpoints (PARITY.md)."""

    def test_fast6_beats_bicubic_if_shipped(self):
        from pathlib import Path

        import jax.numpy as jnp

        from framewright_tpu.models import distill, rrdb, registry

        ckpt = registry.packaged_weights_dir() / "FW_fast6_x2.npz"
        if not ckpt.exists():
            pytest.skip("FW_fast6_x2 checkpoint not trained yet")
        spec, params = registry.init_model("FW_fast6_x2",
                                           allow_random=False)
        psnr_m, psnr_b = distill.eval_psnr(
            lambda lr: rrdb.apply(params, lr, spec.arch_config), 2)
        assert psnr_m > psnr_b + 0.5, (psnr_m, psnr_b)

    def test_fastvgg_beats_bicubic_if_shipped(self):
        from pathlib import Path

        from framewright_tpu.models import distill, srvgg, registry

        ckpt = registry.packaged_weights_dir() / "FW_fastvgg_x2.npz"
        if not ckpt.exists():
            pytest.skip("FW_fastvgg_x2 checkpoint not trained yet")
        spec, params = registry.init_model("FW_fastvgg_x2",
                                           allow_random=False)
        psnr_m, psnr_b = distill.eval_psnr(
            lambda lr: srvgg.apply(params, lr, spec.arch_config), 2)
        assert psnr_m > psnr_b + 0.5, (psnr_m, psnr_b)

    def test_fastvgg_x4_beats_bicubic_if_shipped(self):
        from pathlib import Path

        from framewright_tpu.models import distill, srvgg, registry

        ckpt = registry.packaged_weights_dir() / "FW_fastvgg_x4.npz"
        if not ckpt.exists():
            pytest.skip("FW_fastvgg_x4 checkpoint not trained yet")
        spec, params = registry.init_model("FW_fastvgg_x4",
                                           allow_random=False)
        psnr_m, psnr_b = distill.eval_psnr(
            lambda lr: srvgg.apply(params, lr, spec.arch_config), 4)
        assert psnr_m > psnr_b + 0.5, (psnr_m, psnr_b)

    def test_fastvgg_fused_kernel_matches_plain(self):
        """The shipped checkpoint must produce the same output through
        the fused conv-chain kernel (the path bench.py measures)."""
        from pathlib import Path

        import jax.numpy as jnp

        from framewright_tpu.models import registry, srvgg
        from framewright_tpu.ops import fused_srvgg

        ckpt = registry.packaged_weights_dir() / "FW_fastvgg_x2.npz"
        if not ckpt.exists():
            pytest.skip("FW_fastvgg_x2 checkpoint not trained yet")
        spec, params = registry.init_model("FW_fastvgg_x2",
                                           allow_random=False)
        fast = fused_srvgg.make_fast_params(params, spec.arch_config)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.random((1, 40, 44, 3), dtype=np.float32))
        want = np.asarray(srvgg.apply(params, x, spec.arch_config),
                          np.float32)
        got = np.asarray(
            fused_srvgg.apply_fast(params, fast, x, spec.arch_config,
                                   interpret=True), np.float32)
        assert np.abs(got - want).max() < 0.05

    def test_nafnet_denoiser_beats_noisy_if_shipped(self):
        from pathlib import Path

        from framewright_tpu.models import distill, nafnet, registry

        ckpt = registry.packaged_weights_dir() / "FW_nafnet_dn.npz"
        if not ckpt.exists():
            pytest.skip("FW_nafnet_dn checkpoint not trained yet")
        spec, params = registry.init_model("FW_nafnet_dn",
                                           allow_random=False)
        psnr_m, psnr_n = distill.eval_denoise_psnr(
            lambda x: nafnet.apply(params, x, spec.arch_config))
        # a real denoiser recovers several dB on the synthetic mixture
        assert psnr_m > psnr_n + 3.0, (psnr_m, psnr_n)

    def test_diffusion_beats_bicubic_if_shipped(self):
        from pathlib import Path

        from framewright_tpu.models import (
            diffusion_sr,
            distill,
            registry,
        )

        ckpt = registry.packaged_weights_dir() / "DiffusionSR_x4.npz"
        if not ckpt.exists():
            pytest.skip("DiffusionSR_x4 checkpoint not trained yet")
        spec, params = registry.init_model("DiffusionSR_x4",
                                           allow_random=False)
        # n=32: the n=4 gate was noise-dominated (+-0.4 dB between
        # seeds); 32 held-out pairs gives a stable margin estimate
        psnr_m, psnr_b = distill.eval_psnr(
            lambda lr: diffusion_sr.apply(params, lr, spec.arch_config),
            4, n=32, hr_size=64)
        assert psnr_m > psnr_b + 0.5, (psnr_m, psnr_b)
