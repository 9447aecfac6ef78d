#!/usr/bin/env python
"""Generate state-dict key/shape manifests for the released checkpoints
the weight ports target (reference utils/model_manager.py:38-946
downloads these files; this repo has no egress, so the inventories are
encoded from the published architectures).

Each manifest is JSON: {"_meta": {...}, "keys": {name: [shape...]},
"ignorable": [...]} where ignorable keys exist in the real file but
carry no ported information (e.g. StyleGAN noise buffers).

tests/test_manifests.py synthesizes state dicts from these and proves
every port function consumes the full inventory (no silent drops) and
produces pytrees whose shapes match the model's init() exactly.
"""

import json
from pathlib import Path

OUT = (Path(__file__).resolve().parent.parent / "framewright_tpu"
       / "models" / "manifests")


def _conv(keys, name, cout, cin, k, bias=True):
    keys[name + ".weight"] = [cout, cin, k, k]
    if bias:
        keys[name + ".bias"] = [cout]


def _linear(keys, name, cout, cin):
    keys[name + ".weight"] = [cout, cin]
    keys[name + ".bias"] = [cout]


# ---------------------------------------------------------------------------
# RRDBNet (Real-ESRGAN family; basicsr rrdbnet_arch)
# ---------------------------------------------------------------------------

def rrdb_manifest(num_block: int, in_ch: int) -> dict:
    keys = {}
    _conv(keys, "conv_first", 64, in_ch, 3)
    for i in range(num_block):
        for j in (1, 2, 3):
            p = f"body.{i}.rdb{j}"
            _conv(keys, f"{p}.conv1", 32, 64, 3)
            _conv(keys, f"{p}.conv2", 32, 96, 3)
            _conv(keys, f"{p}.conv3", 32, 128, 3)
            _conv(keys, f"{p}.conv4", 32, 160, 3)
            _conv(keys, f"{p}.conv5", 64, 192, 3)
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
        _conv(keys, name, 64, 64, 3)
    _conv(keys, "conv_last", 3, 64, 3)
    return keys


# ---------------------------------------------------------------------------
# SRVGGNetCompact (realesr-*; basicsr srvgg_arch; PReLU activations)
# ---------------------------------------------------------------------------

def srvgg_manifest(num_conv: int, upscale: int = 4) -> dict:
    keys = {}
    _conv(keys, "body.0", 64, 3, 3)
    keys["body.1.weight"] = [64]                    # PReLU alpha
    for i in range(1, num_conv + 1):
        _conv(keys, f"body.{2 * i}", 64, 64, 3)
        keys[f"body.{2 * i + 1}.weight"] = [64]
    _conv(keys, f"body.{2 * num_conv + 2}", 3 * upscale * upscale, 64, 3)
    return keys


# ---------------------------------------------------------------------------
# BasicVSR (mmediting basicvsr_net; SpyNet + bidirectional trunks)
# ---------------------------------------------------------------------------

def basicvsr_manifest(num_blocks: int = 30) -> dict:
    keys = {}
    spy = ((32, 8), (64, 32), (32, 64), (16, 32), (2, 16))
    for lv in range(6):
        for j, (cout, cin) in enumerate(spy):
            _conv(keys, f"spynet.basic_module.{lv}.basic_module.{j}.conv",
                  cout, cin, 7)
    for trunk in ("backward_resblocks", "forward_resblocks"):
        _conv(keys, f"{trunk}.main.0", 64, 67, 3)
        for i in range(num_blocks):
            _conv(keys, f"{trunk}.main.2.{i}.conv1", 64, 64, 3)
            _conv(keys, f"{trunk}.main.2.{i}.conv2", 64, 64, 3)
    keys["fusion.weight"] = [64, 128, 1, 1]
    keys["fusion.bias"] = [64]
    _conv(keys, "upsample1.upsample_conv", 256, 64, 3)
    _conv(keys, "upsample2.upsample_conv", 256, 64, 3)
    _conv(keys, "conv_hr", 64, 64, 3)
    _conv(keys, "conv_last", 3, 64, 3)
    return keys


# ---------------------------------------------------------------------------
# HAT (official HAT repo, HAT_SRx4: embed 180, 6x6 blocks, window 16)
# ---------------------------------------------------------------------------

def hat_manifest(embed=180, depths=(6,) * 6, window=16, overlap=0.5,
                 mlp_ratio=2.0, squeeze=30, scale=4) -> dict:
    keys = {}
    _conv(keys, "conv_first", embed, 3, 3)
    # patch_embed LayerNorm (patch_norm=True default) + the final norm
    # before conv_after_body — both present in released checkpoints
    keys["patch_embed.norm.weight"] = [embed]
    keys["patch_embed.norm.bias"] = [embed]
    keys["norm.weight"] = [embed]
    keys["norm.bias"] = [embed]
    rp = (2 * window - 1) ** 2
    wo = int(window * (1 + overlap)) + window - 1
    rp_ocab = wo * wo  # (win+wo-1)^2 with wo = win*(1+r): official table
    hidden = int(embed * mlp_ratio)
    for g, depth in enumerate(depths):
        base = f"layers.{g}"
        for b in range(depth):
            p = f"{base}.residual_group.blocks.{b}"
            keys[f"{p}.norm1.weight"] = [embed]
            keys[f"{p}.norm1.bias"] = [embed]
            _linear(keys, f"{p}.attn.qkv", embed * 3, embed)
            _linear(keys, f"{p}.attn.proj", embed, embed)
            keys[f"{p}.attn.relative_position_bias_table"] = [rp, 6]
            _conv(keys, f"{p}.conv_block.cab.0", embed // 3, embed, 3)
            _conv(keys, f"{p}.conv_block.cab.2", embed, embed // 3, 3)
            _conv(keys, f"{p}.conv_block.cab.3.attention.1",
                  embed // squeeze, embed, 1)
            _conv(keys, f"{p}.conv_block.cab.3.attention.3",
                  embed, embed // squeeze, 1)
            keys[f"{p}.norm2.weight"] = [embed]
            keys[f"{p}.norm2.bias"] = [embed]
            _linear(keys, f"{p}.mlp.fc1", hidden, embed)
            _linear(keys, f"{p}.mlp.fc2", embed, hidden)
        oc = f"{base}.residual_group.overlap_attn"
        keys[f"{oc}.norm1.weight"] = [embed]
        keys[f"{oc}.norm1.bias"] = [embed]
        _linear(keys, f"{oc}.qkv", embed * 3, embed)
        _linear(keys, f"{oc}.proj", embed, embed)
        keys[f"{oc}.relative_position_bias_table"] = [rp_ocab, 6]
        keys[f"{oc}.norm2.weight"] = [embed]
        keys[f"{oc}.norm2.bias"] = [embed]
        _linear(keys, f"{oc}.mlp.fc1", hidden, embed)
        _linear(keys, f"{oc}.mlp.fc2", embed, hidden)
        _conv(keys, f"{base}.conv", embed, embed, 3)
    _conv(keys, "conv_after_body", embed, embed, 3)
    _conv(keys, "conv_before_upsample.0", 64, embed, 3)
    for i in range(0, scale // 2):
        _conv(keys, f"upsample.{2 * i}", 256, 64, 3)
    _conv(keys, "conv_last", 3, 64, 3)
    return keys


# ---------------------------------------------------------------------------
# GFPGANv1Clean (basicsr gfpganv1_clean_arch, out_size 512, cm=2)
# ---------------------------------------------------------------------------

def gfpgan_manifest() -> dict:
    keys = {}
    ign = []
    ch = {4: 512, 8: 512, 16: 512, 32: 512, 64: 512, 128: 256,
          256: 128, 512: 64}
    log_size = 9
    keys["conv_body_first.weight"] = [64, 3, 1, 1]
    keys["conv_body_first.bias"] = [64]
    # down: 512px -> 4px, ResBlock(cin=ch[2^i], cout=ch[2^(i-1)])
    sizes_down = [2 ** i for i in range(log_size, 2, -1)]     # 512..8
    for n, s in enumerate(sizes_down):
        cin, cout = ch[s], ch[s // 2]
        _conv(keys, f"conv_body_down.{n}.conv1", cin, cin, 3)
        _conv(keys, f"conv_body_down.{n}.conv2", cout, cin, 3)
        keys[f"conv_body_down.{n}.skip.weight"] = [cout, cin, 1, 1]  # no bias
    _conv(keys, "final_conv", 512, 512, 3)
    # different_w=True: one w per layer
    num_latent = log_size * 2 - 2                              # 16
    _linear(keys, "final_linear", num_latent * 512, 512 * 4 * 4)
    # up: 4px -> 512px, ResUpBlock(ch[2^(i-1)] -> ch[2^i]) + SFT conds
    sizes_up = [2 ** i for i in range(3, log_size + 1)]        # 8..512
    for n, s in enumerate(sizes_up):
        cin, cout = ch[s // 2], ch[s]
        _conv(keys, f"conv_body_up.{n}.conv1", cin, cin, 3)
        _conv(keys, f"conv_body_up.{n}.conv2", cout, cin, 3)
        keys[f"conv_body_up.{n}.skip.weight"] = [cout, cin, 1, 1]
        sft = cout // 2                                        # sft_half
        _conv(keys, f"condition_scale.{n}.0", cout, cout, 3)
        _conv(keys, f"condition_scale.{n}.2", sft, cout, 3)
        _conv(keys, f"condition_shift.{n}.0", cout, cout, 3)
        _conv(keys, f"condition_shift.{n}.2", sft, cout, 3)
        keys[f"toRGB.{n}.weight"] = [3, cout, 1, 1]
        keys[f"toRGB.{n}.bias"] = [3]
    # stylegan decoder (clean): style_mlp = [NormStyleCode, (Linear, LReLU)*8]
    for i in range(8):
        _linear(keys, f"stylegan_decoder.style_mlp.{2 * i + 1}", 512, 512)
    keys["stylegan_decoder.constant_input.weight"] = [1, 512, 4, 4]
    def styleconv(prefix, cin, cout, k):
        keys[f"{prefix}.modulated_conv.weight"] = [1, cout, cin, k, k]
        _linear(keys, f"{prefix}.modulated_conv.modulation", cin, 512)
        keys[f"{prefix}.weight"] = [1]                        # noise gain
        keys[f"{prefix}.bias"] = [1, cout, 1, 1]
    def torgb(prefix, cin):
        keys[f"{prefix}.modulated_conv.weight"] = [1, 3, cin, 1, 1]
        _linear(keys, f"{prefix}.modulated_conv.modulation", cin, 512)
        keys[f"{prefix}.bias"] = [1, 3, 1, 1]
    styleconv("stylegan_decoder.style_conv1", 512, 512, 3)
    torgb("stylegan_decoder.to_rgb1", 512)
    n = 0
    prev = 512
    for s in sizes_up:                                         # 8..512
        cout = ch[s]
        styleconv(f"stylegan_decoder.style_convs.{n}", prev, cout, 3)
        styleconv(f"stylegan_decoder.style_convs.{n + 1}", cout, cout, 3)
        torgb(f"stylegan_decoder.to_rgbs.{n // 2}", cout)
        prev = cout
        n += 2
    # noise buffers exist in the file but carry no ported weights
    ign.append("stylegan_decoder.noises.noise0")
    keys["stylegan_decoder.noises.noise0"] = [1, 1, 4, 4]
    for i in range(1, (log_size - 2) * 2 + 1):
        size = 2 ** ((i + 5) // 2)
        keys[f"stylegan_decoder.noises.noise{i}"] = [1, 1, size, size]
        ign.append(f"stylegan_decoder.noises.noise{i}")
    return keys, ign


# ---------------------------------------------------------------------------
# RAFT basic (princeton-vl raft-things/raft-sintel; 'module.' DataParallel
# prefix stripped by the port)
# ---------------------------------------------------------------------------

def raft_manifest() -> tuple:
    keys = {}
    ignorable = []

    def bn(name, c, ignore=False):
        for suf in ("weight", "bias", "running_mean", "running_var"):
            keys[f"{name}.{suf}"] = [c]
        ignorable.append(f"{name}.num_batches_tracked")
        if ignore:
            # norm3 is registered BOTH standalone and as downsample.1
            # (one module, two parents) — the port reads downsample.1
            for suf in ("weight", "bias", "running_mean", "running_var"):
                ignorable.append(f"{name}.{suf}")

    def encoder(pre, batch, out_dim):
        _conv(keys, f"{pre}.conv1", 64, 3, 7)
        if batch:
            bn(f"{pre}.norm1", 64)
        plan = [("layer1.0", 64, 64, 1), ("layer1.1", 64, 64, 1),
                ("layer2.0", 64, 96, 2), ("layer2.1", 96, 96, 1),
                ("layer3.0", 96, 128, 2), ("layer3.1", 128, 128, 1)]
        for sub, ci, co, stride in plan:
            p = f"{pre}.{sub}"
            _conv(keys, f"{p}.conv1", co, ci, 3)
            _conv(keys, f"{p}.conv2", co, co, 3)
            if batch:
                bn(f"{p}.norm1", co)
                bn(f"{p}.norm2", co)
            if stride != 1:
                keys[f"{p}.downsample.0.weight"] = [co, ci, 1, 1]
                keys[f"{p}.downsample.0.bias"] = [co]
                if batch:
                    bn(f"{p}.norm3", co, ignore=True)
                    bn(f"{p}.downsample.1", co)
        _conv(keys, f"{pre}.conv2", out_dim, 128, 1)

    encoder("fnet", batch=False, out_dim=256)
    encoder("cnet", batch=True, out_dim=256)

    u = "update_block"
    _conv(keys, f"{u}.encoder.convc1", 256, 324, 1)
    _conv(keys, f"{u}.encoder.convc2", 192, 256, 3)
    _conv(keys, f"{u}.encoder.convf1", 128, 2, 7)
    _conv(keys, f"{u}.encoder.convf2", 64, 128, 3)
    _conv(keys, f"{u}.encoder.conv", 126, 256, 3)
    for g in ("convz1", "convr1", "convq1"):
        keys[f"{u}.gru.{g}.weight"] = [128, 384, 1, 5]
        keys[f"{u}.gru.{g}.bias"] = [128]
    for g in ("convz2", "convr2", "convq2"):
        keys[f"{u}.gru.{g}.weight"] = [128, 384, 5, 1]
        keys[f"{u}.gru.{g}.bias"] = [128]
    _conv(keys, f"{u}.flow_head.conv1", 256, 128, 3)
    _conv(keys, f"{u}.flow_head.conv2", 2, 256, 3)
    _conv(keys, f"{u}.mask.0", 256, 128, 3)
    _conv(keys, f"{u}.mask.2", 576, 256, 1)
    return keys, ignorable


# ---------------------------------------------------------------------------
# CodeFormer (sczhou/CodeFormer codeformer.pth; vqgan_arch + codeformer_arch)
# ---------------------------------------------------------------------------

def codeformer_manifest() -> tuple:
    keys = {}
    nf, ch_mult, res_blocks = 64, (1, 2, 2, 4, 4, 8), 2
    emb, book, d, n_layers = 256, 1024, 512, 9
    img, attn_res = 512, 16

    def gn(name, c):
        keys[f"{name}.weight"] = [c]
        keys[f"{name}.bias"] = [c]

    def resblock(pre, cin, cout):
        gn(f"{pre}.norm1", cin)
        _conv(keys, f"{pre}.conv1", cout, cin, 3)
        gn(f"{pre}.norm2", cout)
        _conv(keys, f"{pre}.conv2", cout, cout, 3)
        if cin != cout:
            _conv(keys, f"{pre}.conv_out", cout, cin, 1)

    def attnblock(pre, c):
        gn(f"{pre}.norm", c)
        for nm in ("q", "k", "v", "proj_out"):
            _conv(keys, f"{pre}.{nm}", c, c, 1)

    def encoder(owner):
        i = 0
        res = img
        in_mult = (1,) + ch_mult

        def emit(kind, cin, cout, c_res):
            nonlocal i
            pre = f"{owner}.blocks.{i}"
            if kind == "conv":
                _conv(keys, pre, cout, cin, 3)
            elif kind == "res":
                resblock(pre, cin, cout)
            elif kind == "attn":
                attnblock(pre, cin)
            elif kind in ("down", "up"):
                _conv(keys, f"{pre}.conv", cout, cin, 3)
            elif kind == "norm":
                gn(pre, cin)
            i += 1

        emit("conv", 3, nf, res)
        for s in range(len(ch_mult)):
            cin, cout = nf * in_mult[s], nf * ch_mult[s]
            for _ in range(res_blocks):
                emit("res", cin, cout, res)
                cin = cout
                if res == attn_res:
                    emit("attn", cout, cout, res)
            if s != len(ch_mult) - 1:
                emit("down", cout, cout, res)
                res //= 2
        c = nf * ch_mult[-1]
        emit("res", c, c, res)
        emit("attn", c, c, res)
        emit("res", c, c, res)
        emit("norm", c, c, res)
        emit("conv", c, emb, res)

    def generator(owner):
        i = 0
        res = img // 2 ** (len(ch_mult) - 1)
        c = nf * ch_mult[-1]

        def emit(kind, cin, cout):
            nonlocal i
            pre = f"{owner}.blocks.{i}"
            if kind == "conv":
                _conv(keys, pre, cout, cin, 3)
            elif kind == "res":
                resblock(pre, cin, cout)
            elif kind == "attn":
                attnblock(pre, cin)
            elif kind == "up":
                _conv(keys, f"{pre}.conv", cout, cin, 3)
            elif kind == "norm":
                gn(pre, cin)
            i += 1

        emit("conv", emb, c)
        emit("res", c, c)
        emit("attn", c, c)
        emit("res", c, c)
        for s in reversed(range(len(ch_mult))):
            cout = nf * ch_mult[s]
            for _ in range(res_blocks):
                emit("res", c, cout)
                c = cout
                if res == attn_res:
                    emit("attn", c, c)
            if s != 0:
                emit("up", c, c)
                res *= 2
        emit("norm", c, c)
        emit("conv", c, 3)

    encoder("encoder")
    generator("generator")
    keys["quantize.embedding.weight"] = [book, emb]
    keys["position_emb"] = [256, d]
    _linear(keys, "feat_emb", d, emb)
    for li in range(n_layers):
        pre = f"ft_layers.{li}"
        keys[f"{pre}.self_attn.in_proj_weight"] = [3 * d, d]
        keys[f"{pre}.self_attn.in_proj_bias"] = [3 * d]
        _linear(keys, f"{pre}.self_attn.out_proj", d, d)
        _linear(keys, f"{pre}.linear1", 2 * d, d)
        _linear(keys, f"{pre}.linear2", d, 2 * d)
        gn(f"{pre}.norm1", d)
        gn(f"{pre}.norm2", d)
    gn("idx_pred_layer.0", d)
    keys["idx_pred_layer.1.weight"] = [book, d]
    channels = {img // 2 ** s: nf * m for s, m in enumerate(ch_mult)}
    for res in (32, 64, 128, 256):
        ch = channels[res]
        pre = f"fuse_convs_dict.{res}"
        resblock(f"{pre}.encode_enc", 2 * ch, ch)
        for nm in ("scale", "shift"):
            _conv(keys, f"{pre}.{nm}.0", ch, ch, 3)
            _conv(keys, f"{pre}.{nm}.2", ch, ch, 3)
    return keys, []


def tvsr_manifest(dim=64, heads=4, window=8, depth=6, mlp_ratio=2,
                  scale=4) -> dict:
    """TVSR (original VRT-class arch, models/tvsr.py; twin layout
    torch_ref.build_tvsr). No released checkpoint exists — the manifest
    pins the state-dict contract for trained/exported weights."""
    keys = {}
    _conv(keys, "conv_first", dim, 3, 3)
    for i in range(depth // 2):
        for half in ("a", "b"):
            p = f"pairs.{i}.{half}"
            keys[f"{p}.ln1.weight"] = [dim]
            keys[f"{p}.ln1.bias"] = [dim]
            _linear(keys, f"{p}.qkv", 3 * dim, dim)
            _linear(keys, f"{p}.proj", dim, dim)
            keys[f"{p}.ln2.weight"] = [dim]
            keys[f"{p}.ln2.bias"] = [dim]
            _linear(keys, f"{p}.fc1", mlp_ratio * dim, dim)
            _linear(keys, f"{p}.fc2", dim, mlp_ratio * dim)
    _conv(keys, "conv_body", dim, dim, 3)
    _conv(keys, "up1", dim * 4, dim, 3)
    _conv(keys, "up2", dim * 4, dim, 3)
    _conv(keys, "conv_hr", dim, dim, 3)
    _conv(keys, "conv_last", 3, dim, 3)
    return keys


def ifnet_manifest(channels=(192, 128, 96, 64), num_res_convs=8):
    """Practical-RIFE v4.6 flownet (IFNet_HDv3), student blocks.

    conv() = Sequential(Conv2d, PReLU); lastconv.0 = ConvTranspose2d
    (c, 4*6, 4, 2, 1). Teacher keys (block_tea.*) exist in the real
    file but carry no inference weight — `models verify` reports them
    as unexpected without failing, and port_ifnet skips them."""
    keys = {}

    def conv_prelu(name, cout, cin, k):
        keys[name + ".0.weight"] = [cout, cin, k, k]
        keys[name + ".0.bias"] = [cout]
        keys[name + ".1.weight"] = [cout]

    for b, c in enumerate(channels):
        in_ch = 7 if b == 0 else 8 + 4
        conv_prelu(f"block{b}.conv0.0", c // 2, in_ch, 3)
        conv_prelu(f"block{b}.conv0.1", c, c // 2, 3)
        for i in range(num_res_convs):
            conv_prelu(f"block{b}.convblock.{i}", c, c, 3)
        keys[f"block{b}.lastconv.0.weight"] = [c, 24, 4, 4]
        keys[f"block{b}.lastconv.0.bias"] = [24]
    return keys


def lama_manifest():
    """Big-LaMa generator inventory, generated from the official-
    faithful torch twin (torch_ref.build_lama) at the paper's Big-LaMa
    dims (18 FFC blocks, ratio 0.75, ngf 64). BN bookkeeping scalars
    (num_batches_tracked) are ignorable."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
    from framewright_tpu.models import torch_ref

    tm = torch_ref.build_lama(ngf=64, n_down=3, n_blocks=18, ratio=0.75)
    keys = {}
    ignorable = []
    for k, v in tm.state_dict().items():
        keys[k] = list(v.shape)
        if "num_batches_tracked" in k:
            ignorable.append(k)
    return keys, ignorable


MANIFESTS = {
    "big-lama": (lama_manifest,
                 "saic-mdal Big-LaMa FFCResNetGenerator (18 blocks, "
                 "ratio 0.75; LaMa-Fourier files differ — port infers)"),
    "rife-v4.6": (ifnet_manifest,
                  "Practical-RIFE 4.6 flownet student blocks "
                  "(IFNet_HDv3; module. prefix stripped at load)"),
    "CodeFormer": (codeformer_manifest,
                   "sczhou CodeFormer v0.1.0 (512px, 1024x256 codebook, "
                   "9-layer transformer)"),
    "raft-things": (raft_manifest,
                    "princeton-vl RAFT basic (corr 4 levels, r=4)"),
    "RealESRGAN_x2plus": (lambda: rrdb_manifest(23, 12),
                          "realesrgan x2: pixel-unshuffle input (3*4 ch)"),
    "RealESRGAN_x4plus": (lambda: rrdb_manifest(23, 3), "realesrgan x4"),
    "RealESRGAN_x4plus_anime_6B": (lambda: rrdb_manifest(6, 3),
                                   "anime 6-block variant"),
    "realesr-animevideov3": (lambda: srvgg_manifest(16),
                             "SRVGG compact, 16 convs, PReLU"),
    "realesr-general-x4v3": (lambda: srvgg_manifest(32),
                             "SRVGG compact, 32 convs"),
    "basicvsr_reds4": (basicvsr_manifest, "mmediting BasicVSR generator"),
    "HAT_SRx4": (hat_manifest, "official HAT x4 (embed 180, 6x6)"),
    "TVSR_x4": (tvsr_manifest, "TVSR twin contract (original arch)"),
    "GFPGANv1.4": (gfpgan_manifest, "GFPGANv1Clean out512 cm2 sft_half"),
    "retinaface_mnet025": (lambda: retinaface_manifest(),
                           "Pytorch_Retinaface mobilenet0.25"),
}


# ---------------------------------------------------------------------------
# RetinaFace mobilenet0.25 (biubug6/Pytorch_Retinaface mobilenet0.25_Final)
# ---------------------------------------------------------------------------

def retinaface_manifest() -> tuple:
    keys = {}
    ignorable = []

    def bn(name, c):
        for suf in ("weight", "bias", "running_mean", "running_var"):
            keys[f"{name}.{suf}"] = [c]
        ignorable.append(f"{name}.num_batches_tracked")

    def conv_bn(name, ci, co, k=3):
        keys[f"{name}.0.weight"] = [co, ci, k, k]
        bn(f"{name}.1", co)

    def conv_dw(name, ci, co):
        keys[f"{name}.0.weight"] = [ci, 1, 3, 3]
        bn(f"{name}.1", ci)
        keys[f"{name}.3.weight"] = [co, ci, 1, 1]
        bn(f"{name}.4", co)

    stage1 = [(3, 8), (8, 16), (16, 32), (32, 32), (32, 64), (64, 64)]
    conv_bn("body.stage1.0", 3, 8)
    for i, (ci, co) in enumerate(stage1[1:], start=1):
        conv_dw(f"body.stage1.{i}", ci, co)
    stage2 = [(64, 128)] + [(128, 128)] * 5
    for i, (ci, co) in enumerate(stage2):
        conv_dw(f"body.stage2.{i}", ci, co)
    for i, (ci, co) in enumerate([(128, 256), (256, 256)]):
        conv_dw(f"body.stage3.{i}", ci, co)

    for i, c in enumerate((64, 128, 256), start=1):
        conv_bn(f"fpn.output{i}", c, 64, k=1)
    conv_bn("fpn.merge1", 64, 64)
    conv_bn("fpn.merge2", 64, 64)

    for i in (1, 2, 3):
        conv_bn(f"ssh{i}.conv3X3", 64, 32)
        conv_bn(f"ssh{i}.conv5X5_1", 64, 16)
        conv_bn(f"ssh{i}.conv5X5_2", 16, 16)
        conv_bn(f"ssh{i}.conv7X7_2", 16, 16)
        conv_bn(f"ssh{i}.conv7x7_3", 16, 16)

    for i in range(3):
        keys[f"ClassHead.{i}.conv1x1.weight"] = [4, 64, 1, 1]
        keys[f"ClassHead.{i}.conv1x1.bias"] = [4]
        keys[f"BboxHead.{i}.conv1x1.weight"] = [8, 64, 1, 1]
        keys[f"BboxHead.{i}.conv1x1.bias"] = [8]
        keys[f"LandmarkHead.{i}.conv1x1.weight"] = [20, 64, 1, 1]
        keys[f"LandmarkHead.{i}.conv1x1.bias"] = [20]
    return keys, ignorable


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, (fn, note) in MANIFESTS.items():
        result = fn()
        if isinstance(result, tuple):
            keys, ignorable = result
        else:
            keys, ignorable = result, []
        doc = {
            "_meta": {
                "note": note,
                "provenance": "encoded from the published architecture; "
                              "validate against a real .pth with "
                              "`framewright models verify`",
                "n_keys": len(keys),
            },
            "keys": keys,
            "ignorable": ignorable,
        }
        path = OUT / f"{name}.json"
        path.write_text(json.dumps(doc, indent=1))
        print(f"{name}: {len(keys)} keys -> {path}")


if __name__ == "__main__":
    main()
