"""Model registry: name -> architecture, config, weights.

Analog of the reference's model manager (utils/model_manager.py:38-946:
registry of download URLs + hash checks + ~/.framewright/models layout)
rebuilt around JAX pytrees: weights resolve from (1) a local .npz in the
weights dir, (2) a released torch .pth ported on the fly, or (3) seeded
random init (test/benchmark mode — numerics exercised without weights).

Note one deliberate divergence from the reference's table
(processors/pytorch_realesrgan.py:118-127): it constructs RRDBNet for
realesr-animevideov3 / realesr-general-x4v3, but the released
checkpoints for those names are SRVGGNetCompact — we register the arch
that actually loads the weights.
"""

from __future__ import annotations

import os
import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.errors import ModelError
from framewright_tpu.models import (
    codeformer,
    diffusion_sr,
    gfpgan,
    hat,
    ifnet,
    lama,
    nafnet,
    raft,
    retinaface,
    rrdb,
    srvgg,
    tvsr,
    vsr,
)
from framewright_tpu.models import torch_port


def default_weights_dir() -> Path:
    env = os.environ.get("FRAMEWRIGHT_WEIGHTS_DIR")
    if env:
        return Path(env)
    return Path.home() / ".framewright_tpu" / "models"


@dataclass(frozen=True)
class ModelSpec:
    name: str
    family: str                       # rrdb | srvgg | ifnet | nafnet | ...
    scale: int
    arch_config: Any
    url: str = ""
    apply_fn: Callable = None         # type: ignore[assignment]
    init_fn: Callable = None          # type: ignore[assignment]
    port_fn: Callable = None          # type: ignore[assignment]

    def init(self, key=None, dtype=jnp.float32):
        key = key if key is not None else jax.random.PRNGKey(0)
        return self.init_fn(key, self.arch_config, dtype=dtype)


MODEL_SPECS: Dict[str, ModelSpec] = {}


def _register(spec: ModelSpec) -> None:
    MODEL_SPECS[spec.name] = spec


_register(ModelSpec(
    name="RealESRGAN_x4plus", family="rrdb", scale=4,
    arch_config=rrdb.RRDBConfig(num_block=23, scale=4),
    url="https://github.com/xinntao/Real-ESRGAN/releases/download/v0.1.0/RealESRGAN_x4plus.pth",
    apply_fn=rrdb.apply, init_fn=rrdb.init,
    port_fn=lambda sd: torch_port.port_rrdb(sd, 23),
))
_register(ModelSpec(
    name="RealESRGAN_x2plus", family="rrdb", scale=2,
    arch_config=rrdb.RRDBConfig(num_block=23, scale=2),
    url="https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.1/RealESRGAN_x2plus.pth",
    apply_fn=rrdb.apply, init_fn=rrdb.init,
    port_fn=lambda sd: torch_port.port_rrdb(sd, 23),
))
_register(ModelSpec(
    name="RealESRGAN_x4plus_anime_6B", family="rrdb", scale=4,
    arch_config=rrdb.RRDBConfig(num_block=6, scale=4),
    url="https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.2.4/RealESRGAN_x4plus_anime_6B.pth",
    apply_fn=rrdb.apply, init_fn=rrdb.init,
    port_fn=lambda sd: torch_port.port_rrdb(sd, 6),
))
_register(ModelSpec(
    name="FW_fast6_x2", family="rrdb", scale=2,
    arch_config=rrdb.RRDBConfig(num_block=6, scale=2),
    url="",  # trained in-repo: models/distill.py self-training /
             # distillation from RealESRGAN_x2plus (PERF.md distilled
             # fast path; ref pytorch_realesrgan.py:103-128 ships its
             # own fewer-block variant the same way)
    apply_fn=rrdb.apply, init_fn=rrdb.init,
    port_fn=lambda sd: torch_port.port_rrdb(sd, 6),
))
_register(ModelSpec(
    name="FW_fastvgg_x2", family="srvgg", scale=2,
    arch_config=srvgg.SRVGGConfig(num_conv=16, scale=2),
    url="",  # trained in-repo: models/distill.py train_student(
             # arch="srvgg") — the SRVGG compact student is the
             # reference's own fast-video-model play (its
             # realesr-animevideov3 IS SRVGGNetCompact, ref
             # pytorch_realesrgan.py:118-127); here it runs through the
             # fused conv-chain Pallas kernel (ops/fused_srvgg.py)
    apply_fn=srvgg.apply, init_fn=srvgg.init,
    port_fn=lambda sd: torch_port.port_srvgg(sd, 16),
))
_register(ModelSpec(
    name="FW_fastvgg_x4", family="srvgg", scale=4,
    url="",  # trained in-repo (models/distill.py, arch="srvgg"): the
             # x4 member of the fast menu — the reference's archive
             # use case is low-res -> 4K at x4 (its animevideov3
             # default scale, ref pytorch_realesrgan.py:118-127).
             # 32 convs: x4 needs the same capacity bump the
             # reference's own general x4 model made (realesr-
             # general-x4v3 is SRVGG-32; 16 measured too small here)
    arch_config=srvgg.SRVGGConfig(num_conv=32, scale=4),
    apply_fn=srvgg.apply, init_fn=srvgg.init,
    port_fn=lambda sd: torch_port.port_srvgg(sd, 32),
))
_register(ModelSpec(
    name="realesr-animevideov3", family="srvgg", scale=4,
    arch_config=srvgg.SRVGGConfig(num_conv=16, scale=4),
    url="https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.5.0/realesr-animevideov3.pth",
    apply_fn=srvgg.apply, init_fn=srvgg.init,
    port_fn=lambda sd: torch_port.port_srvgg(sd, 16),
))
_register(ModelSpec(
    name="realesr-general-x4v3", family="srvgg", scale=4,
    arch_config=srvgg.SRVGGConfig(num_conv=32, scale=4),
    url="https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.5.0/realesr-general-x4v3.pth",
    apply_fn=srvgg.apply, init_fn=srvgg.init,
    port_fn=lambda sd: torch_port.port_srvgg(sd, 32),
))


_register(ModelSpec(
    name="HAT_SRx4", family="hat", scale=4,
    arch_config=hat.official_config(),
    url="https://github.com/XPixelGroup/HAT/releases/download/v0.1.0/HAT_SRx4.pth",
    apply_fn=hat.apply, init_fn=hat.init,
    port_fn=lambda sd: torch_port.port_hat(sd, depths=(6,) * 6, scale=4),
))
_register(ModelSpec(
    name="DiffusionSR_x4", family="diffusion", scale=4,
    # steps=1: the in-repo checkpoint (weights/DiffusionSR_x4.npz) is
    # x0-pretrained (train_diffusion), fine-tuned through the 2-step
    # DDIM unroll (v3), then DISTILLED to a 1-step sampler (round-5
    # scripts/train_diffusion_v4.py — consistency-distillation family:
    # fine-tuned through the steps=1 unroll so the composed net becomes
    # a noise-invariant regressor conditioned on the bicubic upsample).
    # Measured +0.63..+0.90 dB over bicubic across 4 held-out synthetic
    # eval seeds (min-margin 0.650 vs the 2-step checkpoint's 0.438).
    arch_config=dataclasses.replace(diffusion_sr.DiffusionSRConfig(),
                                    steps=1),
    apply_fn=diffusion_sr.apply, init_fn=diffusion_sr.init,
    port_fn=None,  # no portable released pixel-space checkpoint; see
                   # models/diffusion_sr.py docstring
))
_register(ModelSpec(
    name="BasicVSR", family="vsr", scale=4,
    arch_config=vsr.BasicVSRConfig(),
    url="https://download.openmmlab.com/mmediting/restorers/basicvsr/basicvsr_reds4_20120409-0e599677.pth",
    apply_fn=vsr.apply, init_fn=vsr.init,
    port_fn=lambda sd: torch_port.port_basicvsr(sd),
))
_register(ModelSpec(
    name="TVSR_x4", family="vsr", scale=4,
    arch_config=tvsr.TVSRConfig(),
    apply_fn=tvsr.apply, init_fn=tvsr.init,
    port_fn=None,  # original architecture (VRT-class TMSA); no
                   # published checkpoint to port — models/tvsr.py
))
_register(ModelSpec(
    name="FW_nafnet_dn", family="nafnet", scale=1,
    url="",  # trained in-repo: models/distill.py:train_denoiser on
             # synthetic noise mixtures (gaussian/grain/impulse +
             # quantization); the reference's TAP backend ships
             # pretrained NAFNet weights the same role
             # (tap_denoise.py:156)
    arch_config=nafnet.NAFNetConfig(width=16, enc_blocks=(1, 1, 2),
                                    middle_blocks=2,
                                    dec_blocks=(1, 1, 1)),
    apply_fn=nafnet.apply, init_fn=nafnet.init,
    port_fn=None,
))
_register(ModelSpec(
    name="CodeFormer", family="face", scale=1,
    arch_config=codeformer.CodeFormerConfig(),
    url="https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/codeformer.pth",
    apply_fn=codeformer.apply, init_fn=codeformer.init,
    port_fn=torch_port.port_codeformer,
))
_register(ModelSpec(
    name="GFPGANv1.4", family="face", scale=1,
    arch_config=gfpgan.GFPGANConfig(),
    url="https://github.com/TencentARC/GFPGAN/releases/download/v1.3.0/GFPGANv1.4.pth",
    apply_fn=gfpgan.apply, init_fn=gfpgan.init,
    port_fn=torch_port.port_gfpgan,
))
_register(ModelSpec(
    name="big-lama", family="inpaint", scale=1,
    # paper Big-LaMa generator: 18 FFC blocks, ratio 0.75; the port
    # infers the real dims from the file (LaMa-Fourier is 9 blocks),
    # and processors derive the runtime config from the ported tree
    # (lama.config_from_params)
    arch_config=lama.LamaConfig(ngf=64, n_down=3, n_blocks=18,
                                global_ratio=0.75),
    url="https://github.com/saic-mdal/lama (big-lama release)",
    apply_fn=lama.apply, init_fn=lama.init,
    port_fn=torch_port.port_lama,
))
_register(ModelSpec(
    name="rife-v4.6", family="ifnet", scale=1,
    arch_config=ifnet.IFNetConfig(),
    url="https://github.com/hzwer/Practical-RIFE",  # flownet.pkl in the
                                                    # v4.6 release zip
    apply_fn=ifnet.apply, init_fn=ifnet.init,
    port_fn=torch_port.port_ifnet,
))
_register(ModelSpec(
    name="raft-things", family="flow", scale=1,
    arch_config=raft.RAFTConfig(),
    url="https://dl.dropboxusercontent.com/s/4j4z58wuv8o0mfz/models.zip",
    apply_fn=raft.apply, init_fn=raft.init,
    port_fn=torch_port.port_raft,
))
_register(ModelSpec(
    name="RetinaFace_mnet025", family="detector", scale=1,
    arch_config=retinaface.RetinaFaceConfig(),
    url="https://github.com/xinntao/facexlib/releases/download/v0.1.0/detection_mobilenet0.25_Final.pth",
    apply_fn=retinaface.apply, init_fn=retinaface.init,
    port_fn=lambda sd: torch_port.port_retinaface(sd),
))


def get_model(name: str) -> ModelSpec:
    if name not in MODEL_SPECS:
        raise ModelError(f"Unknown model {name!r}. Registered: {sorted(MODEL_SPECS)}")
    return MODEL_SPECS[name]


# When-to-use guidance per model — the dashboard's model guide and
# `models --guide` (reference ui.py "AI Model Guide" section, ~1963).
MODEL_GUIDE: Dict[str, str] = {
    "RealESRGAN_x4plus": "Real footage, 4x: the general-purpose "
        "restoration default. Pre-1960 film: add grain preservation.",
    "RealESRGAN_x2plus": "Real footage, 2x: the 1080p->4K headline "
        "path (fused TPU kernels, int8 mode).",
    "RealESRGAN_x4plus_anime_6B": "Anime/animation stills, 4x: "
        "6-block body, crisper lines, ~4x fewer FLOPs.",
    "realesr-animevideov3": "Anime VIDEO, 4x: the fastest SR (SRVGG "
        "family, ~22 fps/chip at 1080p); light degradations.",
    "realesr-general-x4v3": "Mixed/unknown content, 4x: general SRVGG "
        "with denoise built in.",
    "FW_fast6_x2": "Speed-first real footage, 2x: in-repo distilled "
        "6-block RRDB (~14 fps/chip).",
    "FW_fastvgg_x2": "Speed-first 2x preview/proxy work (in-repo "
        "trained, ~22 fps/chip).",
    "FW_fastvgg_x4": "Speed-first 4x (in-repo trained SRVGG).",
    "HAT_SRx4": "Maximum-detail stills/archival 4x: window-attention "
        "SR; slowest, highest ceiling with real weights.",
    "DiffusionSR_x4": "Generative detail for heavily degraded 4x "
        "content; stochastic — pair with temporal consistency.",
    "BasicVSR": "Video SR with temporal propagation: best on pans/"
        "static cameras where neighboring frames carry real detail.",
    "TVSR_x4": "Transformer video SR, 4x: stronger than BasicVSR on "
        "complex motion, costlier.",
    "FW_nafnet_dn": "Learned single-frame denoiser (auto-picked by "
        "--denoise-method auto on heavy noise).",
    "CodeFormer": "Face restoration with a fidelity dial "
        "(--face-fidelity): favors identity over beauty.",
    "GFPGANv1.4": "Face restoration default: strong on old/blurry "
        "portraits.",
    "big-lama": "Inpainting: watermark/logo/subtitle removal masks.",
    "rife-v4.6": "Frame interpolation / fps doubling; also the flow "
        "backend for temporal alignment.",
    "raft-things": "Precision optical flow (--flow-model raft) when "
        "alignment quality matters more than speed.",
    "RetinaFace_mnet025": "Face detector feeding the face-restore "
        "pipeline (auto).",
}


def packaged_weights_dir() -> Path:
    """Directory of trained-in-repo checkpoints shipped with the
    package (the fallback below user weights in init_model)."""
    return Path(__file__).parent / "weights"


def init_model(
    name: str,
    weights_dir: Optional[Path] = None,
    dtype=jnp.float32,
    allow_random: bool = True,
    seed: int = 0,
    device: bool = True,
) -> Tuple[ModelSpec, Dict]:
    """Resolve weights for a registered model.

    Priority: <weights_dir>/<name>.npz -> <weights_dir>/<name>.pth
    (ported via torch) -> random init (if allowed). Returns
    (spec, params) with params cast to ``dtype``.
    """
    spec = get_model(name)
    wdir = Path(weights_dir) if weights_dir else default_weights_dir()
    npz = wdir / f"{name}.npz"
    pth = wdir / f"{name}.pth"
    packaged = packaged_weights_dir() / f"{name}.npz"
    if npz.exists():
        params = torch_port.import_npz(npz)
    elif packaged.exists():
        params = torch_port.import_npz(packaged)
    elif pth.exists():
        sd = torch_port.load_state_dict(pth)
        params = spec.port_fn(sd)
        torch_port.export_npz(params, npz)  # cache the ported form
    elif allow_random:
        # Seeded random init is deterministic, so cache it as npz: the
        # eager init is ~400 small RNG dispatches (~15 s for RRDB on
        # CPU) that every weightless run would otherwise repeat.
        rand_npz = wdir / f"{name}.rand{seed}.npz"
        params = None
        if rand_npz.exists():
            try:
                params = torch_port.import_npz(rand_npz)
            except ValueError:
                # stale cache from before None-leaf encoding (object
                # arrays refuse to load): regenerate
                rand_npz.unlink(missing_ok=True)
        if params is None:
            # Run init on the host CPU backend: on remote-compile TPU
            # stacks each RNG op is a compile round-trip (measured:
            # minutes of startup). Params move to device on first use.
            # Generated in f32 (npz can't round-trip bf16); the final
            # cast below produces the requested dtype.
            try:
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    params = spec.init(jax.random.PRNGKey(seed),
                                       dtype=jnp.float32)
            else:
                params = spec.init(jax.random.PRNGKey(seed), dtype=jnp.float32)
            try:
                torch_port.export_npz(params, rand_npz)
            except OSError:
                pass  # read-only weights dir: just skip the cache
    else:
        raise ModelError(
            f"No weights for {name!r} in {wdir} (looked for .npz/.pth). "
            f"Download from {spec.url}"
        )
    # Cast on the host (ml_dtypes handles bf16 in numpy) and ship with
    # ONE bulk device_put: pure transfers. The old per-leaf
    # jnp.asarray(..., dtype) compiled a convert program per unique
    # shape — minutes of remote-compile stall on the axon stack.
    import numpy as np

    nd = np.dtype(dtype)
    params = jax.tree_util.tree_map(
        lambda p: np.asarray(p).astype(nd, copy=False), params)
    if not device:
        # host numpy params: callers that derive weight transforms
        # (wide/fused forms, body stacking) do them host-side and ship
        # ONE device_put — on the axon tunnel, per-leaf D2H round
        # trips during those transforms measured ~314 s of SR setup
        # (scripts/probe_e2e_warm.py, 2026-08-19)
        return spec, params
    return spec, jax.device_put(params)
