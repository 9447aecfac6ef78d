"""Torch checkpoint -> JAX param pytree conversion.

The reference downloads released .pth weights (Real-ESRGAN et al.,
utils/model_manager.py:38-946). This module ports those checkpoints
into this framework's param pytrees: OIHW conv kernels transpose to
HWIO, and state_dict key paths map onto the pytree structure defined by
each model's ``init``. Conversion accepts either a torch state_dict or
a plain ``{name: np.ndarray}`` mapping, so torch itself is optional.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Mapping

import os

import numpy as np

from framewright_tpu.errors import ModelError


def _to_np(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(sd: Mapping[str, Any], prefix: str,
          bias: bool = True) -> Dict[str, np.ndarray]:
    """``bias=False`` for architecturally bias-free convs (Restormer,
    LaMa FFC bodies, NAFNet ups) — every other family keeps the loud
    missing-key error so a truncated checkpoint fails at port time, not
    with a KeyError deep inside jit tracing."""
    try:
        w = _to_np(sd[prefix + ".weight"])
        b = _to_np(sd[prefix + ".bias"]) if bias else None
    except KeyError as exc:
        raise ModelError(f"Missing weight {exc} while porting {prefix!r}") from exc
    if w.ndim != 4:
        raise ModelError(f"{prefix}.weight is not a conv kernel: shape {w.shape}")
    out = {"w": np.transpose(w, (2, 3, 1, 0))}  # OIHW -> HWIO
    if b is not None:
        out["b"] = b
    return out


def load_state_dict(path: Path) -> Dict[str, np.ndarray]:
    """Read a .pth checkpoint into numpy (requires torch, CPU-only)."""
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for key in ("params_ema", "params", "state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    out = {k: _to_np(v) for k, v in obj.items()}
    if any(k.startswith("module.") for k in out):
        # DataParallel-saved checkpoints (e.g. RIFE flownet.pkl); any()
        # not all() — a stray non-prefixed metadata entry must not
        # disable the strip (same convention as port_raft)
        out = {(k[len("module."):] if k.startswith("module.") else k): v
               for k, v in out.items()}
    return out


# ---------------------------------------------------------------------------
# RRDBNet (Real-ESRGAN)
# ---------------------------------------------------------------------------

def port_rrdb(sd: Mapping[str, Any], num_block: int = 23) -> Dict:
    """basicsr RRDBNet state_dict -> rrdb.init-compatible pytree."""
    body = []
    for i in range(num_block):
        blk = {}
        for j in (1, 2, 3):
            blk[f"rdb{j}"] = {
                f"conv{k}": _conv(sd, f"body.{i}.rdb{j}.conv{k}") for k in range(1, 6)
            }
        body.append(blk)
    return {
        "conv_first": _conv(sd, "conv_first"),
        "body": body,
        "conv_body": _conv(sd, "conv_body"),
        "conv_up1": _conv(sd, "conv_up1"),
        "conv_up2": _conv(sd, "conv_up2"),
        "conv_hr": _conv(sd, "conv_hr"),
        "conv_last": _conv(sd, "conv_last"),
    }


def infer_rrdb_blocks(sd: Mapping[str, Any]) -> int:
    idx = [int(m.group(1)) for k in sd for m in [re.match(r"body\.(\d+)\.rdb1", k)] if m]
    return max(idx) + 1 if idx else 0


# ---------------------------------------------------------------------------
# SRVGGNetCompact
# ---------------------------------------------------------------------------

def port_srvgg(sd: Mapping[str, Any], num_conv: int = 32) -> Dict:
    """SRVGGNetCompact state_dict -> srvgg.init-compatible pytree.

    torch layout: body.{even} convs, body.{odd} PReLU alphas, last conv
    at body.{2*num_conv+2}.
    """
    convs = []
    acts = []
    for i in range(num_conv + 1):
        convs.append(_conv(sd, f"body.{2 * i}"))
        alpha = _to_np(sd[f"body.{2 * i + 1}.weight"])
        acts.append({"alpha": alpha})
    last = _conv(sd, f"body.{2 * num_conv + 2}")
    return {"body": convs, "act": acts, "conv_last": last}


def port_nafnet(sd: Mapping[str, Any], enc_blocks=(2, 2, 4, 8),
                middle_blocks: int = 12, dec_blocks=(2, 2, 2, 2)) -> Dict:
    """Official NAFNet state_dict -> nafnet.init-compatible pytree.

    Key layout (megvii-research NAFNet / torch_ref.build_nafnet):
    intro, encoders.{i}.{j}.*, downs.{i}, middle_blks.{j}.*,
    ups.{i}.0 (conv of Sequential(conv, PixelShuffle)),
    decoders.{i}.{j}.*, ending; NAFBlock sca is Sequential -> sca.1.
    """
    def block(prefix: str) -> Dict:
        return {
            "norm1": {"gamma": _to_np(sd[f"{prefix}.norm1.weight"]),
                      "beta": _to_np(sd[f"{prefix}.norm1.bias"])},
            "conv1": _conv(sd, f"{prefix}.conv1"),
            "conv2": _conv(sd, f"{prefix}.conv2"),
            "conv3": _conv(sd, f"{prefix}.conv3"),
            "sca": _conv(sd, f"{prefix}.sca.1"),
            "norm2": {"gamma": _to_np(sd[f"{prefix}.norm2.weight"]),
                      "beta": _to_np(sd[f"{prefix}.norm2.bias"])},
            "conv4": _conv(sd, f"{prefix}.conv4"),
            "conv5": _conv(sd, f"{prefix}.conv5"),
            "beta": np.transpose(_to_np(sd[f"{prefix}.beta"]), (0, 2, 3, 1)),
            "gamma": np.transpose(_to_np(sd[f"{prefix}.gamma"]), (0, 2, 3, 1)),
        }

    return {
        "intro": _conv(sd, "intro"),
        "encoders": [[block(f"encoders.{i}.{j}") for j in range(nb)]
                     for i, nb in enumerate(enc_blocks)],
        "downs": [_conv(sd, f"downs.{i}") for i in range(len(enc_blocks))],
        "middles": [block(f"middle_blks.{j}") for j in range(middle_blocks)],
        "ups": [_conv(sd, f"ups.{i}.0", bias=False)
                for i in range(len(dec_blocks))],
        "decoders": [[block(f"decoders.{i}.{j}") for j in range(nb)]
                     for i, nb in enumerate(dec_blocks)],
        "ending": _conv(sd, "ending"),
    }


def port_restormer(sd: Mapping[str, Any], num_blocks=(4, 6, 6, 8),
                   num_refinement: int = 4) -> Dict:
    """Official Restormer state_dict -> restormer.init-compatible
    pytree (key layout: torch_ref.build_restormer / swz30 official)."""
    def block(prefix: str) -> Dict:
        return {
            "norm1": {"gamma": _to_np(sd[f"{prefix}.norm1.body.weight"])},
            "qkv": _conv(sd, f"{prefix}.attn.qkv", bias=False),
            "qkv_dw": _conv(sd, f"{prefix}.attn.qkv_dwconv", bias=False),
            "proj": _conv(sd, f"{prefix}.attn.project_out", bias=False),
            "temperature": _to_np(sd[f"{prefix}.attn.temperature"]),
            "norm2": {"gamma": _to_np(sd[f"{prefix}.norm2.body.weight"])},
            "ffn_in": _conv(sd, f"{prefix}.ffn.project_in", bias=False),
            "ffn_dw": _conv(sd, f"{prefix}.ffn.dwconv", bias=False),
            "ffn_out": _conv(sd, f"{prefix}.ffn.project_out", bias=False),
        }

    def blocks(prefix: str, n: int):
        return [block(f"{prefix}.{j}") for j in range(n)]

    return {
        "embed": _conv(sd, "patch_embed.proj", bias=False),
        "enc": [blocks("encoder_level1", num_blocks[0]),
                blocks("encoder_level2", num_blocks[1]),
                blocks("encoder_level3", num_blocks[2])],
        "down": [_conv(sd, "down1_2.body.0", bias=False), _conv(sd, "down2_3.body.0", bias=False),
                 _conv(sd, "down3_4.body.0", bias=False)],
        "latent": blocks("latent", num_blocks[3]),
        "up": [_conv(sd, "up4_3.body.0", bias=False), _conv(sd, "up3_2.body.0", bias=False),
               _conv(sd, "up2_1.body.0", bias=False)],
        "reduce": [_conv(sd, "reduce_chan_level3", bias=False),
                   _conv(sd, "reduce_chan_level2", bias=False), None],
        "dec": [blocks("decoder_level3", num_blocks[2]),
                blocks("decoder_level2", num_blocks[1]),
                blocks("decoder_level1", num_blocks[0])],
        "refine": blocks("refinement", num_refinement),
        "output": _conv(sd, "output", bias=False),
    }


def infer_lama_arch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Infer (ngf, n_down, n_blocks, ratio) from an official
    FFCResNetGenerator state dict — released checkpoints differ
    (LaMa-Fourier: 9 blocks; Big-LaMa: 18; both ratio 0.75)."""
    block_idx = sorted({
        int(m.group(1)) for k in sd
        for m in [re.match(r"model\.(\d+)\.conv1\.ffc\.", k)] if m})
    if not block_idx:
        raise ModelError("not an FFCResNetGenerator state dict "
                         "(no model.{i}.conv1.ffc keys)")
    n_down = block_idx[0] - 2
    n_blocks = len(block_idx)
    ngf = int(np.asarray(sd["model.1.ffc.convl2l.weight"]).shape[0])
    last_down = 1 + n_down
    cl = int(np.asarray(
        sd[f"model.{last_down}.ffc.convl2l.weight"]).shape[0])
    cg = int(np.asarray(
        sd[f"model.{last_down}.ffc.convl2g.weight"]).shape[0])
    return {"ngf": ngf, "n_down": n_down, "n_blocks": n_blocks,
            "ratio": cg / (cl + cg)}


def port_lama(sd: Mapping[str, Any], ngf: int = None, n_down: int = None,
              n_blocks: int = None, ratio: float = None) -> Dict:
    """Official LaMa FFCResNetGenerator state_dict -> lama.init pytree
    (key layout: torch_ref.build_lama / saic-mdal `model.{i}.*`).

    Layout notes: (1) the official FourierUnit conv operates on
    per-channel INTERLEAVED (real, imag) channels while ours stacks
    [all reals, all imags] — the port permutes conv rows/cols and BN
    params; (2) the last downsample is an FFC whose (convl2l, convl2g)
    outputs concatenate into our single down conv; (3) ConvTranspose2d
    kernels transpose to HWIO unflipped — layers.conv2d_transpose flips
    internally (same convention as port_ifnet). Dims not passed are
    inferred from the state dict (infer_lama_arch)."""
    if None in (ngf, n_down, n_blocks, ratio):
        arch = infer_lama_arch(sd)
        ngf = ngf if ngf is not None else arch["ngf"]
        n_down = n_down if n_down is not None else arch["n_down"]
        n_blocks = n_blocks if n_blocks is not None else arch["n_blocks"]
        ratio = ratio if ratio is not None else arch["ratio"]

    def bn(prefix):
        return {"gamma": _to_np(sd[f"{prefix}.weight"]),
                "beta": _to_np(sd[f"{prefix}.bias"]),
                "mean": _to_np(sd[f"{prefix}.running_mean"]),
                "var": _to_np(sd[f"{prefix}.running_var"])}

    def fu(prefix, c):
        # interleaved (r0,i0,r1,i1,...) -> concat ([reals..., imags...])
        perm = np.array([2 * j for j in range(c)]
                        + [2 * j + 1 for j in range(c)])
        w = _to_np(sd[f"{prefix}.conv_layer.weight"])[:, :, 0, 0]
        w_cat = w[np.ix_(perm, perm)]                  # (out_cat, in_cat)
        b = bn(f"{prefix}.bn")
        return {"conv": {"w": w_cat.T[None, None]},
                "bn": {k: v[perm] for k, v in b.items()}}

    def spectral(prefix, cout):
        mid = cout // 2
        return {"conv1": _conv(sd, f"{prefix}.conv1.0", bias=False),
                "bn1": bn(f"{prefix}.conv1.1"),
                "fu": fu(f"{prefix}.fu", mid),
                "conv2": _conv(sd, f"{prefix}.conv2", bias=False)}

    def ffc(prefix, ch):
        cg = int(ch * ratio)
        p = {"ll": _conv(sd, f"{prefix}.ffc.convl2l", bias=False),
             "lg": _conv(sd, f"{prefix}.ffc.convl2g", bias=False),
             "gl": _conv(sd, f"{prefix}.ffc.convg2l", bias=False),
             "gg": spectral(f"{prefix}.ffc.convg2g", cg),
             "bn_l": bn(f"{prefix}.bn_l"),
             "bn_g": bn(f"{prefix}.bn_g")}
        return p

    def convT(prefix):
        # layers.conv2d_transpose flips internally — store unflipped
        # HWIO, same convention as port_ifnet's lastconv
        wt = _to_np(sd[f"{prefix}.weight"])            # (in, out, 3, 3)
        return {"w": np.transpose(wt, (2, 3, 0, 1)),
                "b": _to_np(sd[f"{prefix}.bias"])}

    params: Dict = {
        "head": _conv(sd, "model.1.ffc.convl2l", bias=False),
        "head_bn": bn("model.1.bn_l"),
        "downs": [], "blocks": [], "ups": [],
    }
    ch = ngf
    for i in range(n_down):
        idx = 2 + i
        if i == n_down - 1:
            # transition FFC: concat (l2l, l2g) outputs + (bn_l, bn_g)
            wl = _conv(sd, f"model.{idx}.ffc.convl2l", bias=False)
            wg = _conv(sd, f"model.{idx}.ffc.convl2g", bias=False)
            bl, bg = bn(f"model.{idx}.bn_l"), bn(f"model.{idx}.bn_g")
            params["downs"].append({
                "conv": {"w": np.concatenate([wl["w"], wg["w"]], axis=-1)},
                "bn": {k: np.concatenate([bl[k], bg[k]]) for k in bl},
            })
        else:
            params["downs"].append({"conv": _conv(sd, f"model.{idx}.ffc.convl2l", bias=False),
                                    "bn": bn(f"model.{idx}.bn_l")})
        ch *= 2
    for j in range(n_blocks):
        idx = 2 + n_down + j
        params["blocks"].append({
            "ffc1": ffc(f"model.{idx}.conv1", ch),
            "ffc2": ffc(f"model.{idx}.conv2", ch),
        })
    u0 = 3 + n_down + n_blocks
    for i in range(n_down):
        params["ups"].append({"conv": convT(f"model.{u0 + 3 * i}"),
                              "bn": bn(f"model.{u0 + 3 * i + 1}")})
    params["tail"] = _conv(sd, f"model.{u0 + 3 * n_down + 1}")
    return params


def port_ifnet(sd: Mapping[str, Any], channels=(192, 128, 96, 64),
               num_res_convs: int = 8) -> Dict:
    """Practical-RIFE IFNet (v4.6 flownet) state_dict ->
    ifnet.init-compatible pytree. Student blocks only (block0..3);
    teacher keys (block_tea.*) carry no inference weight. conv() in the
    official arch is Sequential(Conv2d, PReLU) -> keys
    block{b}.conv0.{j}.0.weight / .1.weight (PReLU alpha);
    lastconv.0 is ConvTranspose2d(c, 24, 4, 2, 1)."""
    def cp(name):
        p = _conv(sd, f"{name}.0")
        p["alpha"] = _to_np(sd[f"{name}.1.weight"]).reshape(-1)
        return p

    blocks = []
    for b, c in enumerate(channels):
        conv0 = [cp(f"block{b}.conv0.0"), cp(f"block{b}.conv0.1")]
        convblock = [cp(f"block{b}.convblock.{i}")
                     for i in range(num_res_convs)]
        wt = _to_np(sd[f"block{b}.lastconv.0.weight"])   # (c, 24, 4, 4)
        head = {"w": np.transpose(wt, (2, 3, 0, 1)),
                "b": _to_np(sd[f"block{b}.lastconv.0.bias"])}
        blocks.append({"conv0": conv0, "convblock": convblock,
                       "head": head})
    return {"blocks": blocks}


def infer_srvgg_convs(sd: Mapping[str, Any]) -> int:
    idx = [int(m.group(1)) for k in sd for m in [re.match(r"body\.(\d+)\.weight", k)] if m]
    return (max(idx) - 2) // 2 if idx else 0




# ---------------------------------------------------------------------------
# GFPGAN (clean) port
# ---------------------------------------------------------------------------

def port_gfpgan(sd: Mapping[str, Any]) -> Dict:
    """GFPGANv1Clean state_dict -> gfpgan.init-compatible pytree."""

    def lin(prefix):
        return {"w": _to_np(sd[prefix + ".weight"]).T,
                "b": _to_np(sd[prefix + ".bias"])}

    def conv_nb(prefix):
        # basicsr ResBlock.skip is Conv2d(..., bias=False)
        w = _to_np(sd[prefix + ".weight"])
        return {"w": np.transpose(w, (2, 3, 1, 0)),
                "b": np.zeros(w.shape[0], w.dtype)}

    def modconv(prefix):
        w = _to_np(sd[prefix + ".weight"])          # (1, cout, cin, k, k)
        return {"weight": np.transpose(w[0], (2, 3, 1, 0)),
                "modulation": lin(prefix + ".modulation")}

    def styleconv(prefix):
        return {"modulated_conv": modconv(prefix + ".modulated_conv"),
                "noise_weight": _to_np(sd[prefix + ".weight"]).reshape(()),
                "bias": _to_np(sd[prefix + ".bias"]).reshape(-1)}

    def torgb(prefix):
        return {"modulated_conv": modconv(prefix + ".modulated_conv"),
                "bias": _to_np(sd[prefix + ".bias"]).reshape(-1)}

    out: Dict = {
        "conv_body_first": _conv(sd, "conv_body_first"),
        "final_conv": _conv(sd, "final_conv"),
        "final_linear": lin("final_linear"),
        "conv_body_down": [], "conv_body_up": [],
        "condition_scale": [], "condition_shift": [], "toRGB": [],
        "style_mlp": [],
    }
    def resblock(prefix):
        skip = (conv_nb(f"{prefix}.skip")
                if f"{prefix}.skip.bias" not in sd
                else _conv(sd, f"{prefix}.skip"))
        return {"conv1": _conv(sd, f"{prefix}.conv1"),
                "conv2": _conv(sd, f"{prefix}.conv2"),
                "skip": skip}

    i = 0
    while f"conv_body_down.{i}.conv1.weight" in sd:
        out["conv_body_down"].append(resblock(f"conv_body_down.{i}"))
        i += 1
    i = 0
    while f"conv_body_up.{i}.conv1.weight" in sd:
        out["conv_body_up"].append(resblock(f"conv_body_up.{i}"))
        # condition Sequentials: [conv, lrelu, conv]
        out["condition_scale"].append({
            "c1": _conv(sd, f"condition_scale.{i}.0"),
            "c2": _conv(sd, f"condition_scale.{i}.2"),
        })
        out["condition_shift"].append({
            "c1": _conv(sd, f"condition_shift.{i}.0"),
            "c2": _conv(sd, f"condition_shift.{i}.2"),
        })
        out["toRGB"].append(_conv(sd, f"toRGB.{i}"))
        i += 1
    # style MLP: the clean decoder's Sequential starts with NormStyleCode
    # (no params), so released checkpoints have Linears at odd indices
    # 1, 3, ..; freshly-exported dicts may start at 0 — accept both
    for i in range(0, 32):
        if f"stylegan_decoder.style_mlp.{i}.weight" in sd:
            out["style_mlp"].append(lin(f"stylegan_decoder.style_mlp.{i}"))
    sg = {
        "constant_input": np.transpose(
            _to_np(sd["stylegan_decoder.constant_input.weight"]), (0, 2, 3, 1)),
        "style_conv1": styleconv("stylegan_decoder.style_conv1"),
        "to_rgb1": torgb("stylegan_decoder.to_rgb1"),
        "style_convs": [], "to_rgbs": [],
    }
    i = 0
    while f"stylegan_decoder.style_convs.{i}.modulated_conv.weight" in sd:
        sg["style_convs"].append(styleconv(f"stylegan_decoder.style_convs.{i}"))
        i += 1
    i = 0
    while f"stylegan_decoder.to_rgbs.{i}.modulated_conv.weight" in sd:
        sg["to_rgbs"].append(torgb(f"stylegan_decoder.to_rgbs.{i}"))
        i += 1
    out["stylegan_decoder"] = sg
    return out


def port_basicvsr(sd: Mapping[str, Any], num_blocks: int = 30,
                  spynet_levels: int = 6) -> Dict:
    """mmediting BasicVSR state_dict -> models/vsr.py pytree.

    Accepts both ``generator.``-prefixed checkpoints and bare ones, and
    both SpyNet layer namings seen in the wild
    (``basic_module.{j}.conv`` ConvModule wrapping vs plain Sequential
    indices 0/2/4/6/8)."""
    if any(k.startswith("generator.") for k in sd):
        sd = {k[len("generator."):]: v for k, v in sd.items() if
              k.startswith("generator.")}

    def conv_any(*prefixes):
        for p in prefixes:
            if p + ".weight" in sd:
                return _conv(sd, p)
        raise ModelError(f"Missing conv (tried {prefixes}) while porting BasicVSR")

    spynet = []
    for lv in range(spynet_levels):
        mods = []
        for j in range(5):
            mods.append(conv_any(
                f"spynet.basic_module.{lv}.basic_module.{j}.conv",
                f"spynet.basic_module.{lv}.basic_module.{2 * j}",
                f"spynet.basic_module.{lv}.basic_module.{j}",
            ))
        spynet.append(mods)

    def trunk(prefix):
        c1w, c1b, c2w, c2b = [], [], [], []
        for i in range(num_blocks):
            b1 = _conv(sd, f"{prefix}.main.2.{i}.conv1")
            b2 = _conv(sd, f"{prefix}.main.2.{i}.conv2")
            c1w.append(b1["w"]); c1b.append(b1["b"])
            c2w.append(b2["w"]); c2b.append(b2["b"])
        return {
            "head": _conv(sd, f"{prefix}.main.0"),
            "conv1": {"w": np.stack(c1w), "b": np.stack(c1b)},
            "conv2": {"w": np.stack(c2w), "b": np.stack(c2b)},
        }

    return {
        "spynet": spynet,
        "backward": trunk("backward_resblocks"),
        "forward": trunk("forward_resblocks"),
        "fusion": _conv(sd, "fusion"),
        "upsample1": conv_any("upsample1.upsample_conv", "upsample1"),
        "upsample2": conv_any("upsample2.upsample_conv", "upsample2"),
        "conv_hr": _conv(sd, "conv_hr"),
        "conv_last": _conv(sd, "conv_last"),
    }


def _lin_t(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Linear (out,in) -> {w:(in,out), b}."""
    return {"w": np.transpose(_to_np(sd[prefix + ".weight"])),
            "b": _to_np(sd[prefix + ".bias"])}


def _ln_t(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"g": _to_np(sd[prefix + ".weight"]),
            "b": _to_np(sd[prefix + ".bias"])}


def port_hat(sd: Mapping[str, Any], depths=(6, 6, 6, 6, 6, 6),
             scale: int = 4) -> Dict:
    """Official HAT state_dict -> models/hat.py pytree. Key layout per
    the released HAT checkpoints (hat_upscaler backend in the
    reference): layers.{g}.residual_group.blocks.{b}.*,
    layers.{g}.overlap_attn.*, conv_first/conv_after_body/
    conv_before_upsample.0/upsample.{0,2}/conv_last."""
    if any(k.startswith("params_ema.") for k in sd):
        sd = {k[len("params_ema."):]: v for k, v in sd.items()}

    def attn(prefix):
        return {
            "qkv": _lin_t(sd, f"{prefix}.qkv"),
            "proj": _lin_t(sd, f"{prefix}.proj"),
            "rpb": _to_np(sd[f"{prefix}.relative_position_bias_table"]),
        }

    def conv1x1_as_lin(prefix):
        w = _to_np(sd[prefix + ".weight"])  # (O,I,1,1)
        return {"w": np.transpose(w[:, :, 0, 0]),
                "b": _to_np(sd[prefix + ".bias"])}

    def block(prefix):
        return {
            "norm1": _ln_t(sd, f"{prefix}.norm1"),
            "attn": attn(f"{prefix}.attn"),
            "cab": {
                "conv1": _conv(sd, f"{prefix}.conv_block.cab.0"),
                "conv2": _conv(sd, f"{prefix}.conv_block.cab.2"),
                "att_down": conv1x1_as_lin(f"{prefix}.conv_block.cab.3.attention.1"),
                "att_up": conv1x1_as_lin(f"{prefix}.conv_block.cab.3.attention.3"),
            },
            "norm2": _ln_t(sd, f"{prefix}.norm2"),
            "fc1": _lin_t(sd, f"{prefix}.mlp.fc1"),
            "fc2": _lin_t(sd, f"{prefix}.mlp.fc2"),
        }

    layers = []
    for g, depth in enumerate(depths):
        base = f"layers.{g}"
        oc = f"{base}.residual_group.overlap_attn"
        layers.append({
            "blocks": [block(f"{base}.residual_group.blocks.{b}")
                       for b in range(depth)],
            "ocab": {
                "norm1": _ln_t(sd, f"{oc}.norm1"),
                "attn": attn(oc),
                "norm2": _ln_t(sd, f"{oc}.norm2"),
                "fc1": _lin_t(sd, f"{oc}.mlp.fc1"),
                "fc2": _lin_t(sd, f"{oc}.mlp.fc2"),
            },
            "conv": _conv(sd, f"{base}.conv"),
        })
    return {
        "conv_first": _conv(sd, "conv_first"),
        "patch_norm": _ln_t(sd, "patch_embed.norm"),
        "norm": _ln_t(sd, "norm"),
        "layers": layers,
        "conv_after_body": _conv(sd, "conv_after_body"),
        "conv_before_upsample": _conv(sd, "conv_before_upsample.0"),
        "upsample": [_conv(sd, f"upsample.{i}")
                     for i in range(0, max(2, scale), 2)][: max(1, scale // 2)],
        "conv_last": _conv(sd, "conv_last"),
    }


def port_retinaface(sd: Mapping[str, Any]) -> Dict:
    """Pytorch_Retinaface mobilenet0.25 state dict -> models/retinaface
    pytree. BatchNorms fold into the preceding conv (inference only):
    w' = w * g/sqrt(v+eps), b' = beta - mean * g/sqrt(v+eps)."""
    eps = 1e-5

    def bn_fold(conv_w, bn_prefix):
        g = _to_np(sd[f"{bn_prefix}.weight"]).astype(np.float32)
        beta = _to_np(sd[f"{bn_prefix}.bias"]).astype(np.float32)
        mean = _to_np(sd[f"{bn_prefix}.running_mean"]).astype(np.float32)
        var = _to_np(sd[f"{bn_prefix}.running_var"]).astype(np.float32)
        scale = g / np.sqrt(var + eps)
        return conv_w * scale, beta - mean * scale

    def conv_bn(prefix, k1x1=False):
        w = _to_np(sd[f"{prefix}.0.weight"]).astype(np.float32)
        w = w.transpose(2, 3, 1, 0)            # OIHW -> HWIO
        w, b = bn_fold(w, f"{prefix}.1")
        return {"w": w, "b": b}

    def conv_dw(prefix):
        dw = _to_np(sd[f"{prefix}.0.weight"]).astype(np.float32)
        dw = dw.transpose(2, 3, 0, 1)          # (C,1,k,k) -> (k,k,C,1)
        # BN scale applies per output channel = per group = axis 2 here
        g = _to_np(sd[f"{prefix}.1.weight"]).astype(np.float32)
        beta = _to_np(sd[f"{prefix}.1.bias"]).astype(np.float32)
        mean = _to_np(sd[f"{prefix}.1.running_mean"]).astype(np.float32)
        var = _to_np(sd[f"{prefix}.1.running_var"]).astype(np.float32)
        sc = g / np.sqrt(var + eps)
        dw_f = dw * sc[None, None, :, None]
        dw_b = beta - mean * sc
        pw = _to_np(sd[f"{prefix}.3.weight"]).astype(np.float32)
        pw = pw.transpose(2, 3, 1, 0)
        pw_f, pw_b = bn_fold(pw, f"{prefix}.4")
        return {"dw": {"w": dw_f, "b": dw_b},
                "pw": {"w": pw_f, "b": pw_b}}

    def head(prefix):
        w = _to_np(sd[f"{prefix}.conv1x1.weight"]).astype(np.float32)
        return {"w": w.transpose(2, 3, 1, 0),
                "b": _to_np(sd[f"{prefix}.conv1x1.bias"]).astype(np.float32)}

    stage1 = [{"conv": conv_bn("body.stage1.0")}]
    stage1 += [conv_dw(f"body.stage1.{i}") for i in range(1, 6)]
    stage2 = [conv_dw(f"body.stage2.{i}") for i in range(6)]
    stage3 = [conv_dw(f"body.stage3.{i}") for i in range(2)]
    return {
        "stage1": stage1, "stage2": stage2, "stage3": stage3,
        "fpn_lat": [conv_bn(f"fpn.output{i}") for i in (1, 2, 3)],
        "fpn_merge": [conv_bn("fpn.merge1"), conv_bn("fpn.merge2")],
        "ssh": [{
            "conv3": conv_bn(f"ssh{i}.conv3X3"),
            "conv5_1": conv_bn(f"ssh{i}.conv5X5_1"),
            "conv5_2": conv_bn(f"ssh{i}.conv5X5_2"),
            "conv7_2": conv_bn(f"ssh{i}.conv7X7_2"),
            "conv7_3": conv_bn(f"ssh{i}.conv7x7_3"),
        } for i in (1, 2, 3)],
        "head_cls": [head(f"ClassHead.{i}") for i in range(3)],
        "head_box": [head(f"BboxHead.{i}") for i in range(3)],
        "head_ldm": [head(f"LandmarkHead.{i}") for i in range(3)],
    }


# ---------------------------------------------------------------------------
# RAFT (princeton-vl; raft-things.pth / raft-sintel.pth)
# ---------------------------------------------------------------------------

def port_raft(sd: Mapping[str, Any]) -> Dict:
    """princeton-vl RAFT state dict -> models/raft pytree.

    Checkpoints are saved from DataParallel, so keys carry a
    ``module.`` prefix (stripped here). The feature encoder's
    InstanceNorms are parameter-free; the context encoder's BatchNorms
    fold into their convs (eval-mode exact). ``norm3`` appears in the
    state dict both standalone and as ``downsample.1`` (the module is
    registered under two parents); the port reads the ``downsample.1``
    copy."""
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    eps = 1e-5

    def bn_fold(c: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
        g = _to_np(sd[prefix + ".weight"]).astype(np.float32)
        beta = _to_np(sd[prefix + ".bias"]).astype(np.float32)
        mean = _to_np(sd[prefix + ".running_mean"]).astype(np.float32)
        var = _to_np(sd[prefix + ".running_var"]).astype(np.float32)
        sc = g / np.sqrt(np.maximum(var, 0.0) + eps)
        return {"w": c["w"] * sc, "b": c["b"] * sc + beta - mean * sc}

    def conv(prefix: str, bn: str = "") -> Dict[str, np.ndarray]:
        c = _conv(sd, prefix)
        return bn_fold(c, bn) if bn else c

    def encoder(pre: str, batch: bool) -> Dict:
        def n(suffix):            # norm prefix iff the encoder has BN
            return f"{pre}.{suffix}" if batch else ""

        def unit(p: str, strided: bool) -> Dict:
            out = {"conv1": conv(f"{p}.conv1", n_unit(p, "norm1")),
                   "conv2": conv(f"{p}.conv2", n_unit(p, "norm2"))}
            if strided:
                out["down"] = conv(f"{p}.downsample.0",
                                   n_unit(p, "downsample.1"))
            return out

        def n_unit(p, suffix):
            return f"{p}.{suffix}" if batch else ""

        return {
            "conv1": conv(f"{pre}.conv1", n("norm1")),
            "layer1": [unit(f"{pre}.layer1.0", False),
                       unit(f"{pre}.layer1.1", False)],
            "layer2": [unit(f"{pre}.layer2.0", True),
                       unit(f"{pre}.layer2.1", False)],
            "layer3": [unit(f"{pre}.layer3.0", True),
                       unit(f"{pre}.layer3.1", False)],
            "conv2": conv(f"{pre}.conv2"),
        }

    u = "update_block"
    return {
        "fnet": encoder("fnet", batch=False),
        "cnet": encoder("cnet", batch=True),
        "update": {
            "convc1": conv(f"{u}.encoder.convc1"),
            "convc2": conv(f"{u}.encoder.convc2"),
            "convf1": conv(f"{u}.encoder.convf1"),
            "convf2": conv(f"{u}.encoder.convf2"),
            "conv": conv(f"{u}.encoder.conv"),
            "convz1": conv(f"{u}.gru.convz1"),
            "convr1": conv(f"{u}.gru.convr1"),
            "convq1": conv(f"{u}.gru.convq1"),
            "convz2": conv(f"{u}.gru.convz2"),
            "convr2": conv(f"{u}.gru.convr2"),
            "convq2": conv(f"{u}.gru.convq2"),
            "flow1": conv(f"{u}.flow_head.conv1"),
            "flow2": conv(f"{u}.flow_head.conv2"),
            "mask1": conv(f"{u}.mask.0"),
            "mask2": conv(f"{u}.mask.2"),
        },
    }


# ---------------------------------------------------------------------------
# CodeFormer (sczhou/CodeFormer codeformer.pth)
# ---------------------------------------------------------------------------

def port_codeformer(sd: Mapping[str, Any], cfg=None) -> Dict:
    """sczhou CodeFormer state dict -> models/codeformer pytree.

    Walks the SAME block-construction order as the model
    (codeformer._encoder_plan/_generator_plan mirror
    vqgan_arch.Encoder/Generator), so ``encoder.blocks.N`` numbering
    lines up. Linear weights transpose (out,in)->(in,out); the
    MultiheadAttention packed in_proj transposes to (d, 3d) with q|k|v
    column order."""
    from framewright_tpu.models import codeformer as cf

    cfg = cfg or cf.CodeFormerConfig()

    def lin(prefix, bias=True):
        p = {"w": _to_np(sd[prefix + ".weight"]).astype(np.float32).T}
        if bias:
            p["b"] = _to_np(sd[prefix + ".bias"]).astype(np.float32)
        return p

    def norm(prefix):
        return {"g": _to_np(sd[prefix + ".weight"]).astype(np.float32),
                "b": _to_np(sd[prefix + ".bias"]).astype(np.float32)}

    def resblock(prefix, cin, cout):
        p = {"norm1": norm(prefix + ".norm1"),
             "conv1": _conv(sd, prefix + ".conv1"),
             "norm2": norm(prefix + ".norm2"),
             "conv2": _conv(sd, prefix + ".conv2")}
        if cin != cout:
            p["conv_out"] = _conv(sd, prefix + ".conv_out")
        return p

    def attnblock(prefix):
        return {"norm": norm(prefix + ".norm"),
                "q": _conv(sd, prefix + ".q"),
                "k": _conv(sd, prefix + ".k"),
                "v": _conv(sd, prefix + ".v"),
                "proj": _conv(sd, prefix + ".proj_out")}

    def blocks(owner, plan):
        out = []
        for i, entry in enumerate(plan):
            kind, cin, cout = entry[0], entry[1], entry[2]
            pre = f"{owner}.blocks.{i}"
            if kind in ("conv_in", "conv_out"):
                out.append({"conv": _conv(sd, pre)})
            elif kind == "res":
                out.append(resblock(pre, cin, cout))
            elif kind == "attn":
                out.append(attnblock(pre))
            elif kind in ("down", "up"):
                out.append({"conv": _conv(sd, pre + ".conv")})
            elif kind == "norm":
                out.append({"norm": norm(pre)})
        return out

    def tf_layer(prefix):
        d = cfg.dim_embd
        in_w = _to_np(sd[prefix + ".self_attn.in_proj_weight"]).astype(np.float32)
        in_b = _to_np(sd[prefix + ".self_attn.in_proj_bias"]).astype(np.float32)
        return {
            "norm1": norm(prefix + ".norm1"),
            "norm2": norm(prefix + ".norm2"),
            "qkv": {"w": in_w.T, "b": in_b},
            "proj": lin(prefix + ".self_attn.out_proj"),
            "fc1": lin(prefix + ".linear1"),
            "fc2": lin(prefix + ".linear2"),
        }

    fuse = {}
    for res in cfg.connect:
        pre = f"fuse_convs_dict.{res}"
        ch_map = {cfg.img_size // 2 ** i: cfg.nf * m
                  for i, m in enumerate(cfg.ch_mult)}
        ch = ch_map[res]
        fuse[str(res)] = {
            "encode_enc": resblock(pre + ".encode_enc", 2 * ch, ch),
            "scale1": _conv(sd, pre + ".scale.0"),
            "scale2": _conv(sd, pre + ".scale.2"),
            "shift1": _conv(sd, pre + ".shift.0"),
            "shift2": _conv(sd, pre + ".shift.2"),
        }

    return {
        "encoder": blocks("encoder", cf._encoder_plan(cfg)),
        "generator": blocks("generator", cf._generator_plan(cfg)),
        "codebook": _to_np(sd["quantize.embedding.weight"]).astype(np.float32),
        "position_emb": _to_np(sd["position_emb"]).astype(np.float32),
        "feat_emb": lin("feat_emb"),
        "ft_layers": [tf_layer(f"ft_layers.{i}")
                      for i in range(cfg.n_layers)],
        "idx_norm": norm("idx_pred_layer.0"),
        "idx_pred": lin("idx_pred_layer.1", bias=False),
        "fuse": fuse,
    }


# ---------------------------------------------------------------------------
# Generic helpers
# ---------------------------------------------------------------------------

def export_npz(params: Dict, path: Path) -> None:
    """Flatten a pytree to .npz (torch-free weight distribution format)."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}.{i}")
        elif node is None:
            # optional leaves (e.g. diffusion skip=None): a zero-size
            # marker array — np.savez would otherwise pickle an object
            # array that import refuses to load
            flat[prefix + ".__none__"] = np.zeros((0,), np.int8)
        else:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # atomic publish: concurrent farm workers may export the same cache
    tmp = path.with_suffix(f".tmp{os.getpid()}.npz")
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, path)


def import_npz(path: Path) -> Dict:
    """Inverse of export_npz."""
    data = np.load(path)
    root: Dict = {}
    for key in data.files:
        none_leaf = key.endswith(".__none__")
        if none_leaf:
            key = key[: -len(".__none__")]
        node = root
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = None if none_leaf else data[key]

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(root)


def port_tvsr(sd: Mapping[str, Any], depth: int = 6) -> Dict:
    """TVSR twin state_dict (torch_ref.build_tvsr / manifests/
    TVSR_x4.json) -> models/tvsr.py pytree (pairs stacked for
    lax.scan)."""

    def lin(prefix):
        return {"w": _to_np(sd[prefix + ".weight"]).T,
                "b": _to_np(sd[prefix + ".bias"])}

    def block(prefix):
        return {
            "ln1_g": _to_np(sd[f"{prefix}.ln1.weight"]),
            "ln1_b": _to_np(sd[f"{prefix}.ln1.bias"]),
            "qkv": lin(f"{prefix}.qkv"),
            "proj": lin(f"{prefix}.proj"),
            "ln2_g": _to_np(sd[f"{prefix}.ln2.weight"]),
            "ln2_b": _to_np(sd[f"{prefix}.ln2.bias"]),
            "fc1": lin(f"{prefix}.fc1"),
            "fc2": lin(f"{prefix}.fc2"),
        }

    pairs = [{"a": block(f"pairs.{i}.a"), "b": block(f"pairs.{i}.b")}
             for i in range(depth // 2)]
    import jax

    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *pairs)
    return {
        "conv_first": _conv(sd, "conv_first"),
        "pairs": stacked,
        "conv_body": _conv(sd, "conv_body"),
        "up1": _conv(sd, "up1"),
        "up2": _conv(sd, "up2"),
        "conv_hr": _conv(sd, "conv_hr"),
        "conv_last": _conv(sd, "conv_last"),
    }
