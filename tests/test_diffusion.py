"""Diffusion SR: DDIM algebra (oracle-verified), graceful degradation,
video propagation, registry + processor integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import diffusion_sr as ds
from framewright_tpu.models.layers import resize_bicubic
from framewright_tpu.models.registry import MODEL_SPECS, ModelSpec, get_model

TINY = ds.DiffusionSRConfig(base_ch=8, ch_mults=(1, 2), time_dim=16, steps=4)


@pytest.fixture(scope="module")
def tiny_params():
    return ds.init(jax.random.PRNGKey(0), TINY)


def test_schedule_monotone():
    a = np.asarray(ds.alphas_cumprod(1000))
    assert a[0] > 0.999 and a[-1] < 0.01
    assert (np.diff(a) <= 1e-7).all()


@pytest.mark.slow
def test_oracle_model_recovered_exactly(tiny_params):
    """If the denoiser predicts the true x0 at every step, DDIM must
    reconstruct it exactly — validates the sampler algebra
    independently of any trained weights."""
    lr = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 12, 3))
    target = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 48, 3)) * 2 - 1
    out = ds.ddim_sample(tiny_params, lr, TINY,
                         model_fn=lambda xt, tf: jnp.broadcast_to(target, xt.shape))
    assert float(jnp.abs(out * 2 - 1 - target).max()) < 1e-5


def test_untrained_net_degrades_to_bicubic(tiny_params):
    """Zero-init output head => x0 prediction equals the bicubic
    condition, so an unweighted model is a safe bicubic upscaler."""
    lr = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 8, 3))
    y = ds.apply(tiny_params, lr, TINY)
    base = jnp.clip(resize_bicubic(lr, (32, 32)), 0, 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(base), atol=1e-5)


def test_deterministic(tiny_params):
    lr = jax.random.uniform(jax.random.PRNGKey(4), (1, 8, 8, 3))
    y1 = np.asarray(ds.apply(tiny_params, lr, TINY))
    y2 = np.asarray(ds.apply(tiny_params, lr, TINY))
    np.testing.assert_array_equal(y1, y2)


@pytest.mark.slow
def test_video_propagation_shapes(tiny_params):
    fr = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 8, 8, 3))
    v = ds.sample_video(tiny_params, fr, TINY)
    assert v.shape == (1, 3, 32, 32, 3)
    # static clip: propagated frames stay close to the first
    frs = jnp.broadcast_to(fr[:, :1], fr.shape)
    vs = np.asarray(ds.sample_video(tiny_params, frs, TINY))
    assert np.abs(vs[0, 1] - vs[0, 0]).mean() < 0.05


def test_registry_and_processor(tmp_path):
    spec = get_model("DiffusionSR_x4")
    assert spec.family == "diffusion" and spec.scale == 4

    from framewright_tpu.processors.super_resolution import (
        SRConfig,
        SuperResolution,
    )

    name = "diffusion-test-tiny"
    MODEL_SPECS[name] = ModelSpec(
        name=name, family="diffusion", scale=4, arch_config=TINY,
        apply_fn=ds.apply, init_fn=ds.init)
    try:
        sr = SuperResolution(SRConfig(model_name=name,
                                      compute_dtype="float32",
                                      weights_dir=str(tmp_path)))
        sr.setup(16, 16)
        out = sr.process_batch(np.full((2, 16, 16, 3), 90, np.uint8))
        assert out.shape == (2, 64, 64, 3) and out.dtype == np.uint8
    finally:
        MODEL_SPECS.pop(name, None)
