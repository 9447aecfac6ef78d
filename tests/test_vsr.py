"""Recurrent video SR (BasicVSR-class): model, port, processor, pipeline.

Mirrors the reference's per-family test pattern (SURVEY §4): shape and
determinism contracts for the net, state-dict port mapping, streaming
chunk semantics, and an end-to-end restore through the orchestrator.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framewright_tpu.models import vsr
from framewright_tpu.models.registry import MODEL_SPECS, ModelSpec, get_model
from framewright_tpu.models.torch_port import port_basicvsr
from framewright_tpu.processors.video_sr import VideoSuperResolution, VSRConfig

TINY = vsr.BasicVSRConfig(mid_channels=8, num_blocks=2, spynet_levels=3)


@pytest.fixture(scope="module")
def tiny_params():
    return vsr.init(jax.random.PRNGKey(0), TINY)


def test_forward_shape_and_range(tiny_params):
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 16, 32, 3))
    y = vsr.apply(tiny_params, x, TINY)
    assert y.shape == (2, 4, 64, 128, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_deterministic(tiny_params):
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 16, 16, 3))
    y1 = np.asarray(vsr.apply(tiny_params, x, TINY))
    y2 = np.asarray(vsr.apply(tiny_params, x, TINY))
    np.testing.assert_array_equal(y1, y2)


def test_temporal_context_matters(tiny_params):
    """A recurrent model must produce different output for a frame when
    its neighbours change — that's the point of VSR."""
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 4, 16, 16, 3))
    x2 = x.at[:, 0].set(jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3)))
    y = np.asarray(vsr.apply(tiny_params, x, TINY))
    y2 = np.asarray(vsr.apply(tiny_params, x2, TINY))
    # frame 2 differs between the two runs (propagated context)
    assert np.abs(y[0, 2] - y2[0, 2]).max() > 1e-6


def test_spynet_zero_flow_for_identical_frames(tiny_params):
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 32, 32, 3))
    flow = vsr.spynet_flow(tiny_params["spynet"], x, x, levels=3)
    assert flow.shape == (1, 32, 32, 2)
    # identical frames: flow is whatever the net outputs, but must be
    # identical to a second evaluation and finite
    assert np.isfinite(np.asarray(flow)).all()


def _synthetic_sd(num_blocks=2, levels=3, mid=8, conv_module_style=True):
    """Build an mmediting-named BasicVSR state dict (numpy)."""
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    sd = {}
    chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
    for lv in range(levels):
        for j, (ci, co) in enumerate(chans):
            key = (f"spynet.basic_module.{lv}.basic_module.{j}.conv"
                   if conv_module_style else
                   f"spynet.basic_module.{lv}.basic_module.{2 * j}")
            sd[key + ".weight"] = t(co, ci, 7, 7)
            sd[key + ".bias"] = t(co)
    for d in ("backward_resblocks", "forward_resblocks"):
        sd[f"{d}.main.0.weight"] = t(mid, 3 + mid, 3, 3)
        sd[f"{d}.main.0.bias"] = t(mid)
        for i in range(num_blocks):
            for c in ("conv1", "conv2"):
                sd[f"{d}.main.2.{i}.{c}.weight"] = t(mid, mid, 3, 3)
                sd[f"{d}.main.2.{i}.{c}.bias"] = t(mid)
    sd["fusion.weight"] = t(mid, 2 * mid, 1, 1)
    sd["fusion.bias"] = t(mid)
    sd["upsample1.upsample_conv.weight"] = t(mid * 4, mid, 3, 3)
    sd["upsample1.upsample_conv.bias"] = t(mid * 4)
    sd["upsample2.upsample_conv.weight"] = t(64 * 4, mid, 3, 3)
    sd["upsample2.upsample_conv.bias"] = t(64 * 4)
    sd["conv_hr.weight"] = t(64, 64, 3, 3)
    sd["conv_hr.bias"] = t(64)
    sd["conv_last.weight"] = t(3, 64, 3, 3)
    sd["conv_last.bias"] = t(3)
    return sd


@pytest.mark.parametrize("style", [True, False])
def test_port_basicvsr_both_namings(style):
    sd = _synthetic_sd(conv_module_style=style)
    params = port_basicvsr(sd, num_blocks=2, spynet_levels=3)
    assert len(params["spynet"]) == 3
    assert params["backward"]["conv1"]["w"].shape == (2, 3, 3, 8, 8)
    assert params["fusion"]["w"].shape == (1, 1, 16, 8)
    # ported params actually run
    cfg = vsr.BasicVSRConfig(mid_channels=8, num_blocks=2, spynet_levels=3)
    x = jnp.ones((1, 3, 16, 16, 3)) * 0.5
    y = vsr.apply(jax.tree_util.tree_map(jnp.asarray, params), x, cfg)
    assert y.shape == (1, 3, 64, 64, 3)


def test_port_generator_prefix():
    sd = {"generator." + k: v for k, v in _synthetic_sd().items()}
    params = port_basicvsr(sd, num_blocks=2, spynet_levels=3)
    assert params["conv_last"]["b"].shape == (3,)


def test_registry_has_basicvsr():
    spec = get_model("BasicVSR")
    assert spec.family == "vsr" and spec.scale == 4


# ---------------------------------------------------------------------------
# Streaming processor
# ---------------------------------------------------------------------------

@pytest.fixture()
def tiny_registered():
    """Register a test-size VSR spec so processor tests stay fast."""
    name = "basicvsr-test-tiny"
    MODEL_SPECS[name] = ModelSpec(
        name=name, family="vsr", scale=4, arch_config=TINY,
        apply_fn=vsr.apply, init_fn=vsr.init, port_fn=port_basicvsr,
    )
    yield name
    MODEL_SPECS.pop(name, None)


def test_processor_chunked_stream(tiny_registered, tmp_path):
    proc = VideoSuperResolution(VSRConfig(
        model_name=tiny_registered, chunk=4, overlap=2,
        compute_dtype="float32", weights_dir=str(tmp_path)))
    proc.setup(18, 30)  # non-multiple of 32: exercises pad/crop
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (10, 18, 30, 3), dtype=np.uint8)
    outs = [proc.process_batch(frames[i : i + 4]) for i in (0, 4, 8)]
    out = np.concatenate(outs, 0)
    assert out.shape == (10, 72, 120, 3) and out.dtype == np.uint8
    # determinism across a fresh processor with identical chunking
    proc2 = VideoSuperResolution(VSRConfig(
        model_name=tiny_registered, chunk=4, overlap=2,
        compute_dtype="float32", weights_dir=str(tmp_path)))
    proc2.setup(18, 30)
    outs2 = [proc2.process_batch(frames[i : i + 4]) for i in (0, 4, 8)]
    np.testing.assert_array_equal(out, np.concatenate(outs2, 0))


def test_processor_oversize_batch_slices(tiny_registered, tmp_path):
    proc = VideoSuperResolution(VSRConfig(
        model_name=tiny_registered, chunk=3, overlap=1,
        compute_dtype="float32", weights_dir=str(tmp_path)))
    proc.setup(16, 16)
    frames = np.full((7, 16, 16, 3), 128, np.uint8)
    out = proc.process_batch(frames)
    assert out.shape == (7, 64, 64, 3)


def test_restorer_end_to_end_vsr(tiny_registered, tmp_path, monkeypatch):
    from framewright_tpu.config import Config
    from framewright_tpu.io.y4m import Y4MReader, Y4MWriter
    from framewright_tpu.restorer import VideoRestorer

    monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "weights"))
    src = tmp_path / "in.y4m"
    rng = np.random.default_rng(2)
    tex = rng.integers(0, 256, (32, 96), dtype=np.uint8)
    with Y4MWriter(src, 48, 32, fps=24) as w:
        for t in range(6):
            sh = t * 4
            w.write_frame(np.stack([tex[:, sh : sh + 48]] * 3, -1))
    out = tmp_path / "out.y4m"
    cfg = Config(
        project_dir=tmp_path / "proj", sr_model=tiny_registered,
        compute_dtype="float32", validate_output=False,
        checkpoint_enabled=False, batch_size=3, deduplicate=True,
    )
    res = VideoRestorer(cfg).restore_video(src, output=out)
    assert res.frames_out == 6
    with Y4MReader(out) as rd:
        assert (rd.width, rd.height) == (192, 128)
        assert rd.count_frames() == 6


def test_yuv_direct_fast_path_matches_rgb_path(tmp_path, monkeypatch):
    """Device-side YUV420 SR output must match the host-converted RGB
    path within CSC rounding (both end at 4:2:0 in the Y4M)."""
    from framewright_tpu.config import Config
    from framewright_tpu.io.y4m import Y4MReader, Y4MWriter
    from framewright_tpu.restorer import VideoRestorer

    monkeypatch.setenv("FRAMEWRIGHT_WEIGHTS_DIR", str(tmp_path / "w"))
    src = tmp_path / "in.y4m"
    rng = np.random.default_rng(3)
    with Y4MWriter(src, 32, 24, fps=24) as w:
        for _ in range(4):
            w.write_frame(rng.integers(0, 256, (24, 32, 3), dtype=np.uint8))

    def run(out, **kw):
        cfg = Config(project_dir=tmp_path / f"proj_{out.stem}",
                     sr_model="realesr-animevideov3", compute_dtype="float32",
                     validate_output=False, checkpoint_enabled=False, **kw)
        VideoRestorer(cfg).restore_video(src, output=out)
        with Y4MReader(out) as r:
            return np.stack(list(r))

    fast = run(tmp_path / "fast.y4m")                      # yuv_direct on
    slow = run(tmp_path / "slow.y4m", face_restore=False,
               outscale=4.0)                               # outscale -> rgb path
    assert fast.shape == slow.shape == (4, 96, 128, 3)
    diff = np.abs(fast.astype(np.int16) - slow.astype(np.int16))
    assert diff.max() <= 3, f"max diff {diff.max()}"


def test_write_yuv_frame_roundtrip(tmp_path):
    from framewright_tpu.io.color import rgb_to_yuv420
    from framewright_tpu.io.y4m import Y4MReader, Y4MWriter

    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    a, b = tmp_path / "a.y4m", tmp_path / "b.y4m"
    with Y4MWriter(a, 24, 16, fps=24) as w:
        # match the writer's range (default colorspace 420jpeg = full)
        w.write_yuv_frame(*rgb_to_yuv420(rgb, full_range=w.full_range))
        assert w.frames_written == 1
    with Y4MWriter(b, 24, 16, fps=24) as w:
        w.write_frame(rgb)
    # pre-converted planes must byte-match the RGB write path (within
    # the native fixed-point vs float rounding of the CSC)
    with Y4MReader(a) as ra, Y4MReader(b) as rb:
        fa, fb = next(iter(ra)), next(iter(rb))
    assert np.abs(fa.astype(np.int16) - fb.astype(np.int16)).max() <= 2


@pytest.mark.slow
class TestTorchParity:
    def test_full_model_matches_mmediting_reference(self):
        """Manifest-synthesized weights into the mmediting BasicVSRNet
        re-statement and the JAX port: outputs must match. Validates
        the SpyNet pyramid conventions (align_corners, x2 flow scaling,
        border-padded internal warp), the zeros-padded propagation
        warp, fusion channel order (the round-1 advisor finding), and
        the upsampling tail."""
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        from framewright_tpu.models import torch_port, torch_ref, vsr
        from tests.test_manifests import load_manifest, synth_sd

        keys, _ = load_manifest("basicvsr_reds4")
        sd = synth_sd(keys)
        # damp conv gains so 30-block residual chains don't amplify
        # float noise into the comparison (weights still random)
        sd = {k: v * (0.3 if k.endswith("weight") and v.ndim == 4 else 1.0)
              for k, v in sd.items()}
        tm = torch_ref.build_basicvsr()
        missing, _un = tm.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
        assert not missing, missing[:5]
        tm.eval()

        params = torch_port.port_basicvsr(sd)
        rng = np.random.default_rng(0)
        x = rng.random((1, 3, 32, 32, 3), dtype=np.float32)  # B,T,H,W,C
        with torch.no_grad():
            yt = tm(torch.as_tensor(
                x.transpose(0, 1, 4, 2, 3)))      # B,T,C,H,W
        y_torch = yt.numpy().transpose(0, 1, 3, 4, 2)
        y_jax = np.asarray(vsr.apply(params, jnp.asarray(x)))
        err = np.abs(y_jax - y_torch)
        assert err.max() < 1e-2, f"max abs err {err.max():.5f}"
