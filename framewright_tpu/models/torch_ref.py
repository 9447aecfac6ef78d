"""PyTorch reference architectures for weight-port parity checks.

Independent re-statements of the PUBLISHED architecture specs
(Real-ESRGAN RRDBNet, SRVGGNetCompact) used two ways:

* tests/test_models.py asserts the JAX models match these numerically
  with shared random weights (implementation parity);
* ``framewright models verify <name> --path real.pth`` loads a REAL
  released checkpoint into BOTH implementations and measures the PSNR
  between outputs — the <=0.1 dB parity harness the reference's
  torch-backed processors imply (processors/pytorch_realesrgan.py:
  103-128).

torch imports are function-local: the module is importable (and the
rest of the framework runs) on hosts without torch.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def build_rrdbnet(scale: int = 4, nb: int = 23):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class RDB(nn.Module):
        def __init__(self, nf=64, gc=32):
            super().__init__()
            self.conv1 = nn.Conv2d(nf, gc, 3, 1, 1)
            self.conv2 = nn.Conv2d(nf + gc, gc, 3, 1, 1)
            self.conv3 = nn.Conv2d(nf + 2 * gc, gc, 3, 1, 1)
            self.conv4 = nn.Conv2d(nf + 3 * gc, gc, 3, 1, 1)
            self.conv5 = nn.Conv2d(nf + 4 * gc, nf, 3, 1, 1)
            self.act = nn.LeakyReLU(0.2, inplace=False)

        def forward(self, x):
            x1 = self.act(self.conv1(x))
            x2 = self.act(self.conv2(torch.cat([x, x1], 1)))
            x3 = self.act(self.conv3(torch.cat([x, x1, x2], 1)))
            x4 = self.act(self.conv4(torch.cat([x, x1, x2, x3], 1)))
            x5 = self.conv5(torch.cat([x, x1, x2, x3, x4], 1))
            return x5 * 0.2 + x

    class RRDB(nn.Module):
        def __init__(self, nf=64, gc=32):
            super().__init__()
            self.rdb1, self.rdb2, self.rdb3 = RDB(nf, gc), RDB(nf, gc), RDB(nf, gc)

        def forward(self, x):
            return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x

    def pixel_unshuffle(x, s):
        b, c, hh, hw = x.size()
        h, w = hh // s, hw // s
        return (x.view(b, c, h, s, w, s).permute(0, 1, 3, 5, 2, 4)
                .reshape(b, c * s * s, h, w))

    class RRDBNet(nn.Module):
        def __init__(self, num_in_ch=3, num_out_ch=3, nf=64, gc=32):
            super().__init__()
            self.scale = scale
            in_ch = num_in_ch * (4 if scale == 2 else 16 if scale == 1 else 1)
            self.conv_first = nn.Conv2d(in_ch, nf, 3, 1, 1)
            self.body = nn.Sequential(*[RRDB(nf, gc) for _ in range(nb)])
            self.conv_body = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up1 = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up2 = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_hr = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_last = nn.Conv2d(nf, num_out_ch, 3, 1, 1)
            self.act = nn.LeakyReLU(0.2, inplace=False)

        def forward(self, x):
            if self.scale == 2:
                feat = pixel_unshuffle(x, 2)
            elif self.scale == 1:
                feat = pixel_unshuffle(x, 4)
            else:
                feat = x
            feat = self.conv_first(feat)
            feat = feat + self.conv_body(self.body(feat))
            feat = self.act(self.conv_up1(
                F.interpolate(feat, scale_factor=2, mode="nearest")))
            feat = self.act(self.conv_up2(
                F.interpolate(feat, scale_factor=2, mode="nearest")))
            return self.conv_last(self.act(self.conv_hr(feat)))

    # state_dict keys must match basicsr: body.N.rdbM.convK
    return RRDBNet()


def build_srvgg(num_conv: int = 32, upscale: int = 4):
    import torch.nn as nn
    import torch.nn.functional as F

    class SRVGG(nn.Module):
        def __init__(self, num_in_ch=3, num_out_ch=3, nf=64):
            super().__init__()
            self.upscale = upscale
            self.body = nn.ModuleList()
            self.body.append(nn.Conv2d(num_in_ch, nf, 3, 1, 1))
            self.body.append(nn.PReLU(num_parameters=nf))
            for _ in range(num_conv):
                self.body.append(nn.Conv2d(nf, nf, 3, 1, 1))
                self.body.append(nn.PReLU(num_parameters=nf))
            self.body.append(
                nn.Conv2d(nf, num_out_ch * upscale * upscale, 3, 1, 1))
            self.upsampler = nn.PixelShuffle(upscale)

        def forward(self, x):
            out = x
            for m in self.body:
                out = m(out)
            out = self.upsampler(out)
            return out + F.interpolate(
                x, scale_factor=self.upscale, mode="nearest")

    return SRVGG()


def build_nafnet(width: int = 32, enc_blocks=(2, 2, 4, 8),
                 middle_blocks: int = 12, dec_blocks=(2, 2, 2, 2),
                 in_ch: int = 3):
    """Official NAFNet (megvii-research, ECCV22 "Simple Baselines")
    re-statement for full-model parity: LayerNorm2d NAFBlocks,
    conv2x2-stride2 downs, conv1x1+PixelShuffle ups with encoder skip
    adds, global input residual. State-dict keys mirror the official
    module names (intro/encoders/downs/middle_blks/ups/decoders/ending,
    sca as Sequential -> `sca.1`) so `torch_port.port_nafnet` doubles
    as the real-weight port. Ref capability slot: reference
    tap_denoise.py:156 (pretrained NAFNet backend)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class LayerNorm2d(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(c))
            self.bias = nn.Parameter(torch.zeros(c))

        def forward(self, x):
            y = x.permute(0, 2, 3, 1)
            # official megvii LayerNorm2d (and nafnet._ln) use eps=1e-6
            y = F.layer_norm(y, y.shape[-1:], self.weight, self.bias,
                             eps=1e-6)
            return y.permute(0, 3, 1, 2)

    class NAFBlock(nn.Module):
        def __init__(self, c):
            super().__init__()
            dw = 2 * c
            ffn = 2 * c
            self.norm1 = LayerNorm2d(c)
            self.conv1 = nn.Conv2d(c, dw, 1)
            self.conv2 = nn.Conv2d(dw, dw, 3, padding=1, groups=dw)
            self.conv3 = nn.Conv2d(dw // 2, c, 1)
            self.sca = nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                     nn.Conv2d(dw // 2, dw // 2, 1))
            self.norm2 = LayerNorm2d(c)
            self.conv4 = nn.Conv2d(c, ffn, 1)
            self.conv5 = nn.Conv2d(ffn // 2, c, 1)
            self.beta = nn.Parameter(torch.randn(1, c, 1, 1) * 0.1)
            self.gamma = nn.Parameter(torch.randn(1, c, 1, 1) * 0.1)

        @staticmethod
        def _sg(t):
            a, b = t.chunk(2, dim=1)
            return a * b

        def forward(self, x):
            y = self.conv2(self.conv1(self.norm1(x)))
            y = self._sg(y)
            y = y * self.sca(y)
            y = self.conv3(y)
            x = x + y * self.beta
            y = self.conv5(self._sg(self.conv4(self.norm2(x))))
            return x + y * self.gamma

    class NAFNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.intro = nn.Conv2d(in_ch, width, 3, padding=1)
            self.encoders = nn.ModuleList()
            self.downs = nn.ModuleList()
            ch = width
            for nb in enc_blocks:
                self.encoders.append(
                    nn.Sequential(*[NAFBlock(ch) for _ in range(nb)]))
                self.downs.append(nn.Conv2d(ch, 2 * ch, 2, stride=2))
                ch *= 2
            self.middle_blks = nn.Sequential(
                *[NAFBlock(ch) for _ in range(middle_blocks)])
            self.ups = nn.ModuleList()
            self.decoders = nn.ModuleList()
            for nb in dec_blocks:
                self.ups.append(nn.Sequential(
                    nn.Conv2d(ch, 2 * ch, 1, bias=False),
                    nn.PixelShuffle(2)))
                ch //= 2
                self.decoders.append(
                    nn.Sequential(*[NAFBlock(ch) for _ in range(nb)]))
            self.ending = nn.Conv2d(width, in_ch, 3, padding=1)

        def forward(self, x):
            inp = x
            y = self.intro(x)
            skips = []
            for enc, down in zip(self.encoders, self.downs):
                y = enc(y)
                skips.append(y)
                y = down(y)
            y = self.middle_blks(y)
            for up, dec, skip in zip(self.ups, self.decoders,
                                     reversed(skips)):
                y = up(y)
                y = y + skip
                y = dec(y)
            return inp + self.ending(y)

    return NAFNet()


def build_restormer(dim: int = 48, num_blocks=(4, 6, 6, 8),
                    heads=(1, 2, 4, 8), num_refinement: int = 4,
                    ffn_expansion: float = 2.66, in_ch: int = 3):
    """Official Restormer (swz30, CVPR22) re-statement for full-model
    parity: bias-free convs/LayerNorm, MDTA channel attention, GDFN,
    PixelUnshuffle downs / PixelShuffle ups, reduce_chan convs at
    levels 3/2 only, refinement at 2*dim. State-dict keys mirror the
    official module names so `torch_port.port_restormer` doubles as
    the real-weight port. Ref slot: reference tap_denoise.py:156."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class _LNBody(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(c))

        def forward(self, x):  # x: (B, HW, C)
            sigma = x.var(-1, keepdim=True, unbiased=False)
            return x / torch.sqrt(sigma + 1e-5) * self.weight

    class LayerNorm(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.body = _LNBody(c)

        def forward(self, x):  # (B, C, H, W)
            b, c, h, w = x.shape
            y = x.flatten(2).transpose(1, 2)        # to_3d
            y = self.body(y)
            return y.transpose(1, 2).reshape(b, c, h, w)

    class Attention(nn.Module):
        def __init__(self, c, nheads):
            super().__init__()
            self.num_heads = nheads
            self.temperature = nn.Parameter(torch.ones(nheads, 1, 1))
            self.qkv = nn.Conv2d(c, c * 3, 1, bias=False)
            self.qkv_dwconv = nn.Conv2d(c * 3, c * 3, 3, padding=1,
                                        groups=c * 3, bias=False)
            self.project_out = nn.Conv2d(c, c, 1, bias=False)

        def forward(self, x):
            b, c, h, w = x.shape
            qkv = self.qkv_dwconv(self.qkv(x))
            q, k, v = qkv.chunk(3, dim=1)
            hd = c // self.num_heads

            def rs(t):  # b (head c) h w -> b head c (h w)
                return t.reshape(b, self.num_heads, hd, h * w)

            q, k, v = rs(q), rs(k), rs(v)
            q = F.normalize(q, dim=-1)
            k = F.normalize(k, dim=-1)
            att = (q @ k.transpose(-2, -1)) * self.temperature
            att = att.softmax(dim=-1)
            out = (att @ v).reshape(b, c, h, w)
            return self.project_out(out)

    class FeedForward(nn.Module):
        def __init__(self, c, exp):
            super().__init__()
            hidden = int(c * exp)
            self.project_in = nn.Conv2d(c, hidden * 2, 1, bias=False)
            self.dwconv = nn.Conv2d(hidden * 2, hidden * 2, 3, padding=1,
                                    groups=hidden * 2, bias=False)
            self.project_out = nn.Conv2d(hidden, c, 1, bias=False)

        def forward(self, x):
            a, g = self.dwconv(self.project_in(x)).chunk(2, dim=1)
            return self.project_out(F.gelu(a) * g)

    class TransformerBlock(nn.Module):
        def __init__(self, c, nheads):
            super().__init__()
            self.norm1 = LayerNorm(c)
            self.attn = Attention(c, nheads)
            self.norm2 = LayerNorm(c)
            self.ffn = FeedForward(c, ffn_expansion)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.ffn(self.norm2(x))

    class _Body(nn.Module):
        """Official Downsample/Upsample wrap their Sequential in
        ``self.body`` — keys are down1_2.body.0.weight etc."""

        def __init__(self, *mods):
            super().__init__()
            self.body = nn.Sequential(*mods)

        def forward(self, x):
            return self.body(x)

    def down(c):
        return _Body(nn.Conv2d(c, c // 2, 3, padding=1, bias=False),
                     nn.PixelUnshuffle(2))

    def up(c):
        return _Body(nn.Conv2d(c, c * 2, 3, padding=1, bias=False),
                     nn.PixelShuffle(2))

    class PatchEmbed(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Conv2d(in_ch, dim, 3, padding=1, bias=False)

        def forward(self, x):
            return self.proj(x)

    class Restormer(nn.Module):
        def __init__(self):
            super().__init__()
            d = dim
            self.patch_embed = PatchEmbed()
            self.encoder_level1 = nn.Sequential(
                *[TransformerBlock(d, heads[0]) for _ in range(num_blocks[0])])
            self.down1_2 = down(d)
            self.encoder_level2 = nn.Sequential(
                *[TransformerBlock(d * 2, heads[1]) for _ in range(num_blocks[1])])
            self.down2_3 = down(d * 2)
            self.encoder_level3 = nn.Sequential(
                *[TransformerBlock(d * 4, heads[2]) for _ in range(num_blocks[2])])
            self.down3_4 = down(d * 4)
            self.latent = nn.Sequential(
                *[TransformerBlock(d * 8, heads[3]) for _ in range(num_blocks[3])])
            self.up4_3 = up(d * 8)
            self.reduce_chan_level3 = nn.Conv2d(d * 8, d * 4, 1, bias=False)
            self.decoder_level3 = nn.Sequential(
                *[TransformerBlock(d * 4, heads[2]) for _ in range(num_blocks[2])])
            self.up3_2 = up(d * 4)
            self.reduce_chan_level2 = nn.Conv2d(d * 4, d * 2, 1, bias=False)
            self.decoder_level2 = nn.Sequential(
                *[TransformerBlock(d * 2, heads[1]) for _ in range(num_blocks[1])])
            self.up2_1 = up(d * 2)
            self.decoder_level1 = nn.Sequential(
                *[TransformerBlock(d * 2, heads[0]) for _ in range(num_blocks[0])])
            self.refinement = nn.Sequential(
                *[TransformerBlock(d * 2, heads[0]) for _ in range(num_refinement)])
            self.output = nn.Conv2d(d * 2, in_ch, 3, padding=1, bias=False)

        def forward(self, x):
            e1 = self.encoder_level1(self.patch_embed(x))
            e2 = self.encoder_level2(self.down1_2(e1))
            e3 = self.encoder_level3(self.down2_3(e2))
            lat = self.latent(self.down3_4(e3))
            d3 = self.decoder_level3(self.reduce_chan_level3(
                torch.cat([self.up4_3(lat), e3], 1)))
            d2 = self.decoder_level2(self.reduce_chan_level2(
                torch.cat([self.up3_2(d3), e2], 1)))
            d1 = self.decoder_level1(torch.cat([self.up2_1(d2), e1], 1))
            return x + self.output(self.refinement(d1))

    return Restormer()


def build_lama(ngf: int = 64, n_down: int = 3, n_blocks: int = 9,
               ratio: float = 0.5, in_ch: int = 4):
    """Official LaMa FFCResNetGenerator (saic-mdal, WACV22) re-statement
    for full-model parity: ReflectionPad 7x7 head/tail, FFC_BN_ACT
    downsamples (ratio 0, last one transitions to the resnet ratio),
    FFCResnetBlocks, ConvTranspose2d upsamples, sigmoid out. State-dict
    keys mirror the official ``model.{i}.*`` Sequential layout so
    ``torch_port.port_lama`` doubles as the real-weight port
    (enable_lfu=False, the big-lama setting). Ref slot: reference
    watermark_removal.py:109 (simple-lama backend)."""
    import torch
    import torch.nn as nn

    class FourierUnit(nn.Module):
        def __init__(self, c_in, c_out):
            super().__init__()
            self.conv_layer = nn.Conv2d(c_in * 2, c_out * 2, 1, bias=False)
            self.bn = nn.BatchNorm2d(c_out * 2)
            self.relu = nn.ReLU(inplace=False)

        def forward(self, x):
            b, c, h, w = x.shape
            f = torch.fft.rfftn(x.float(), dim=(-2, -1), norm="ortho")
            f = torch.stack((f.real, f.imag), dim=-1)       # (B,C,H,Wf,2)
            f = f.permute(0, 1, 4, 2, 3).reshape(b, -1, h, w // 2 + 1)
            f = self.relu(self.bn(self.conv_layer(f)))
            f = f.reshape(b, -1, 2, h, w // 2 + 1).permute(0, 1, 3, 4, 2)
            f = torch.complex(f[..., 0], f[..., 1])
            return torch.fft.irfftn(f, s=(h, w), dim=(-2, -1), norm="ortho")

    class SpectralTransform(nn.Module):
        def __init__(self, c_in, c_out):
            super().__init__()
            mid = c_out // 2
            self.conv1 = nn.Sequential(nn.Conv2d(c_in, mid, 1, bias=False),
                                       nn.BatchNorm2d(mid),
                                       nn.ReLU(inplace=False))
            self.fu = FourierUnit(mid, mid)
            self.conv2 = nn.Conv2d(mid, c_out, 1, bias=False)

        def forward(self, x):
            x = self.conv1(x)
            return self.conv2(x + self.fu(x))

    class FFC(nn.Module):
        def __init__(self, c_in, c_out, k, gin, gout, stride=1, pad=0):
            super().__init__()
            in_cg = int(c_in * gin)
            in_cl = c_in - in_cg
            out_cg = int(c_out * gout)
            out_cl = c_out - out_cg
            self.global_in_num = in_cg

            def conv(ci, co):
                if ci == 0 or co == 0:
                    return nn.Identity()
                return nn.Conv2d(ci, co, k, stride, pad, bias=False)

            self.convl2l = conv(in_cl, out_cl)
            self.convl2g = conv(in_cl, out_cg)
            self.convg2l = conv(in_cg, out_cl)
            self.convg2g = (SpectralTransform(in_cg, out_cg)
                            if in_cg and out_cg else nn.Identity())
            self.out_cl, self.out_cg = out_cl, out_cg

        def forward(self, x):
            x_l, x_g = x if isinstance(x, tuple) else (x, 0)
            out_l, out_g = 0, 0
            if self.out_cl:
                out_l = self.convl2l(x_l) + (
                    self.convg2l(x_g) if torch.is_tensor(x_g) else 0)
            if self.out_cg:
                out_g = (self.convl2g(x_l)
                         if not isinstance(self.convl2g, nn.Identity) else 0)
                if torch.is_tensor(x_g):
                    out_g = out_g + self.convg2g(x_g)
            return out_l, out_g

    class FFC_BN_ACT(nn.Module):
        def __init__(self, c_in, c_out, k, gin, gout, stride=1, pad=0):
            super().__init__()
            self.ffc = FFC(c_in, c_out, k, gin, gout, stride, pad)
            out_cg = int(c_out * gout)
            out_cl = c_out - out_cg
            self.bn_l = nn.BatchNorm2d(out_cl) if out_cl else nn.Identity()
            self.bn_g = nn.BatchNorm2d(out_cg) if out_cg else nn.Identity()
            self.act_l = nn.ReLU(inplace=False)
            self.act_g = nn.ReLU(inplace=False)

        def forward(self, x):
            xl, xg = self.ffc(x)
            if torch.is_tensor(xl):
                xl = self.act_l(self.bn_l(xl))
            if torch.is_tensor(xg):
                xg = self.act_g(self.bn_g(xg))
            return xl, xg

    class FFCResnetBlock(nn.Module):
        def __init__(self, c, gin):
            super().__init__()
            self.conv1 = FFC_BN_ACT(c, c, 3, gin, gin, pad=1)
            self.conv2 = FFC_BN_ACT(c, c, 3, gin, gin, pad=1)

        def forward(self, x):
            idl, idg = x
            xl, xg = self.conv2(self.conv1(x))
            return idl + xl, idg + xg

    class ConcatTupleLayer(nn.Module):
        def forward(self, x):
            xl, xg = x
            return torch.cat([xl, xg], dim=1)

    layers = [nn.ReflectionPad2d(3),
              FFC_BN_ACT(in_ch, ngf, 7, 0, 0)]
    ch = ngf
    for i in range(n_down):
        gout = ratio if i == n_down - 1 else 0
        layers.append(FFC_BN_ACT(ch, ch * 2, 3, 0, gout, stride=2, pad=1))
        ch *= 2
    for _ in range(n_blocks):
        layers.append(FFCResnetBlock(ch, ratio))
    layers.append(ConcatTupleLayer())
    for _ in range(n_down):
        layers += [nn.ConvTranspose2d(ch, ch // 2, 3, stride=2, padding=1,
                                      output_padding=1),
                   nn.BatchNorm2d(ch // 2), nn.ReLU(inplace=False)]
        ch //= 2
    layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, 3, 7), nn.Sigmoid()]

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(*layers)

        def forward(self, x):
            return self.model(x)

    return Generator()


def parity_check(name: str, sd: dict, arch_config, family: str,
                 size: Tuple[int, int] = (64, 96)) -> dict:
    """Load a real state dict into BOTH implementations, run one frame,
    return {'psnr_db': ..., 'max_abs': ...}. Raises for families with
    no torch reference."""
    import torch

    import jax
    import jax.numpy as jnp

    from framewright_tpu.models import rrdb, srvgg, torch_port

    h, w = size
    rng = np.random.default_rng(0)
    x = rng.random((1, h, w, 3), dtype=np.float32)

    if family == "rrdb":
        nb = torch_port.infer_rrdb_blocks(sd)
        tm = build_rrdbnet(scale=arch_config.scale, nb=nb)
        params = torch_port.port_rrdb(sd, nb)
        cfg = rrdb.RRDBConfig(num_block=nb, scale=arch_config.scale)
        y_jax = np.asarray(rrdb.apply(
            rrdb.stack_body({k: v for k, v in params.items()}),
            jnp.asarray(x), cfg))
    elif family == "srvgg":
        nc = torch_port.infer_srvgg_convs(sd)
        tm = build_srvgg(num_conv=nc, upscale=arch_config.scale)
        params = torch_port.port_srvgg(sd, nc)
        cfg = arch_config
        y_jax = np.asarray(srvgg.apply(params, jnp.asarray(x), cfg))
    elif family == "hat":
        from framewright_tpu.models import hat

        tm = build_hat(embed=arch_config.embed_dim,
                       depths=arch_config.depths,
                       heads=arch_config.num_heads,
                       window=arch_config.window,
                       overlap=arch_config.overlap_ratio,
                       mlp_ratio=arch_config.mlp_ratio,
                       squeeze=arch_config.cab_squeeze,
                       scale=arch_config.scale,
                       img_range=arch_config.img_range)
        params = torch_port.port_hat(sd, depths=arch_config.depths,
                                     scale=arch_config.scale)
        y_jax = np.asarray(hat.apply(params, jnp.asarray(x), arch_config))
    elif family == "nafnet":
        from framewright_tpu.models import nafnet

        cfg = arch_config
        tm = build_nafnet(width=cfg.width, enc_blocks=cfg.enc_blocks,
                          middle_blocks=cfg.middle_blocks,
                          dec_blocks=cfg.dec_blocks, in_ch=cfg.in_ch)
        params = torch_port.port_nafnet(sd, enc_blocks=cfg.enc_blocks,
                                        middle_blocks=cfg.middle_blocks,
                                        dec_blocks=cfg.dec_blocks)
        y_jax = np.asarray(nafnet.apply_padded(
            jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x),
            cfg))
    elif family == "restormer":
        from framewright_tpu.models import restormer

        cfg = arch_config
        tm = build_restormer(dim=cfg.dim, num_blocks=cfg.num_blocks,
                             heads=cfg.heads,
                             num_refinement=cfg.num_refinement,
                             ffn_expansion=cfg.ffn_expansion,
                             in_ch=cfg.in_ch)
        params = torch_port.port_restormer(
            sd, num_blocks=cfg.num_blocks,
            num_refinement=cfg.num_refinement)
        params = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v) if v is not None else None, params,
            is_leaf=lambda v: v is None)
        y_jax = np.asarray(restormer.apply_padded(params, jnp.asarray(x),
                                                  cfg))
    elif family == "inpaint":
        from framewright_tpu.models import lama, torch_port as _tp

        arch = _tp.infer_lama_arch(sd)
        tm = build_lama(ngf=arch["ngf"], n_down=arch["n_down"],
                        n_blocks=arch["n_blocks"], ratio=arch["ratio"])
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_port.port_lama(sd))
        cfg = lama.config_from_params(params)
        img = jnp.asarray(x)
        msk = jnp.zeros((1, h, w, 1)).at[:, h // 4: h // 2,
                                         w // 4: w // 2].set(1.0)
        y_jax = np.asarray(lama.apply_padded(params, img, msk, cfg))
        # torch side consumes the masked-concat input; composite to
        # match lama.apply's output contract
        x = np.concatenate([x * (1.0 - np.asarray(msk)),
                            np.asarray(msk)], axis=-1)
        _lama_mask = np.asarray(msk)
    else:
        raise ValueError(f"no torch reference for family {family!r}")

    missing, unexpected = tm.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    if missing:
        raise ValueError(f"torch reference missing keys: {missing[:5]}")
    tm.eval()
    with torch.no_grad():
        y_t = tm(torch.as_tensor(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    y_torch = y_t.numpy().transpose(0, 2, 3, 1)
    if family == "inpaint":
        # lama.apply composites: image*(1-mask) + out*mask; x[..., :3]
        # already holds image*(1-mask)
        y_torch = x[..., :3] + y_torch * _lama_mask
    diff = y_jax.astype(np.float64) - y_torch.astype(np.float64)
    mse = float(np.mean(diff ** 2))
    return {
        "psnr_db": 10 * np.log10(1.0 / max(mse, 1e-20)),
        "max_abs": float(np.abs(diff).max()),
        "unexpected_keys": list(unexpected),
    }


def build_raft(iters: int = 4):
    """princeton-vl RAFT "basic" re-statement (arXiv:2003.12039) for
    port-parity checks: parameter names match the released state dict
    (fnet.*, cnet.*, update_block.*) so manifest-synthesized or real
    checkpoints load into both this and models/raft.py."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class ResidualBlock(nn.Module):
        def __init__(self, cin, cout, norm_fn, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, stride=stride)
            self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
            self.relu = nn.ReLU(inplace=True)
            mk = (nn.BatchNorm2d if norm_fn == "batch"
                  else lambda c: nn.InstanceNorm2d(c))
            self.norm1 = mk(cout)
            self.norm2 = mk(cout)
            if stride == 1:
                self.downsample = None
            else:
                self.norm3 = mk(cout)
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride=stride), self.norm3)

        def forward(self, x):
            y = self.relu(self.norm1(self.conv1(x)))
            y = self.relu(self.norm2(self.conv2(y)))
            if self.downsample is not None:
                x = self.downsample(x)
            return self.relu(x + y)

    class BasicEncoder(nn.Module):
        def __init__(self, out_dim, norm_fn):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
            self.norm1 = (nn.BatchNorm2d(64) if norm_fn == "batch"
                          else nn.InstanceNorm2d(64))
            self.relu1 = nn.ReLU(inplace=True)
            self.layer1 = nn.Sequential(
                ResidualBlock(64, 64, norm_fn),
                ResidualBlock(64, 64, norm_fn))
            self.layer2 = nn.Sequential(
                ResidualBlock(64, 96, norm_fn, stride=2),
                ResidualBlock(96, 96, norm_fn))
            self.layer3 = nn.Sequential(
                ResidualBlock(96, 128, norm_fn, stride=2),
                ResidualBlock(128, 128, norm_fn))
            self.conv2 = nn.Conv2d(128, out_dim, 1)

        def forward(self, x):
            x = self.relu1(self.norm1(self.conv1(x)))
            x = self.layer3(self.layer2(self.layer1(x)))
            return self.conv2(x)

    def coords_grid(b, h, w):
        ys, xs = torch.meshgrid(torch.arange(h).float(),
                                torch.arange(w).float(), indexing="ij")
        return torch.stack([xs, ys], dim=0)[None].repeat(b, 1, 1, 1)

    def bilinear_sampler(img, coords):
        H, W = img.shape[-2:]
        xg = 2 * coords[..., 0] / (W - 1) - 1
        yg = 2 * coords[..., 1] / (H - 1) - 1
        grid = torch.stack([xg, yg], dim=-1)
        return F.grid_sample(img, grid, align_corners=True)

    class CorrBlock:
        def __init__(self, f1, f2, levels=4, radius=4):
            self.radius = radius
            b, c, h, w = f1.shape
            corr = torch.einsum(
                "bchw,bcuv->bhwuv", f1, f2).reshape(b * h * w, 1, h, w)
            corr = corr / c ** 0.5
            self.pyr = [corr]
            for _ in range(levels - 1):
                corr = F.avg_pool2d(corr, 2, stride=2)
                self.pyr.append(corr)
            self.shape = (b, h, w)

        def __call__(self, coords):
            r = self.radius
            b, h, w = self.shape
            coords = coords.permute(0, 2, 3, 1)       # (B,H,W,2)
            out = []
            for lvl, corr in enumerate(self.pyr):
                d = torch.arange(-r, r + 1).float()
                dy, dx = torch.meshgrid(d, d, indexing="ij")
                delta = torch.stack([dx, dy], dim=-1)  # (2r+1,2r+1,2)
                centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** lvl
                win = centroid + delta[None]
                sampled = bilinear_sampler(corr, win)  # (BHW,1,2r+1,2r+1)
                out.append(sampled.reshape(b, h, w, -1))
            return torch.cat(out, dim=-1).permute(0, 3, 1, 2)

    class BasicMotionEncoder(nn.Module):
        def __init__(self, cor_planes):
            super().__init__()
            self.convc1 = nn.Conv2d(cor_planes, 256, 1)
            self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
            self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
            self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
            self.conv = nn.Conv2d(64 + 192, 128 - 2, 3, padding=1)

        def forward(self, flow, corr):
            c = F.relu(self.convc1(corr))
            c = F.relu(self.convc2(c))
            f = F.relu(self.convf1(flow))
            f = F.relu(self.convf2(f))
            out = F.relu(self.conv(torch.cat([c, f], dim=1)))
            return torch.cat([out, flow], dim=1)

    class SepConvGRU(nn.Module):
        def __init__(self, hidden=128, inp=256):
            super().__init__()
            self.convz1 = nn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
            self.convr1 = nn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
            self.convq1 = nn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
            self.convz2 = nn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))
            self.convr2 = nn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))
            self.convq2 = nn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))

        def forward(self, h, x):
            for z_c, r_c, q_c in ((self.convz1, self.convr1, self.convq1),
                                  (self.convz2, self.convr2, self.convq2)):
                hx = torch.cat([h, x], dim=1)
                z = torch.sigmoid(z_c(hx))
                r = torch.sigmoid(r_c(hx))
                q = torch.tanh(q_c(torch.cat([r * h, x], dim=1)))
                h = (1 - z) * h + z * q
            return h

    class FlowHead(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(128, 256, 3, padding=1)
            self.conv2 = nn.Conv2d(256, 2, 3, padding=1)

        def forward(self, x):
            return self.conv2(F.relu(self.conv1(x)))

    class BasicUpdateBlock(nn.Module):
        def __init__(self, cor_planes):
            super().__init__()
            self.encoder = BasicMotionEncoder(cor_planes)
            self.gru = SepConvGRU()
            self.flow_head = FlowHead()
            self.mask = nn.Sequential(
                nn.Conv2d(128, 256, 3, padding=1),
                nn.ReLU(inplace=True),
                nn.Conv2d(256, 64 * 9, 1))

        def forward(self, net, inp, corr, flow):
            m = self.encoder(flow, corr)
            net = self.gru(net, torch.cat([inp, m], dim=1))
            delta = self.flow_head(net)
            mask = 0.25 * self.mask(net)
            return net, mask, delta

    class RAFT(nn.Module):
        def __init__(self):
            super().__init__()
            cor_planes = 4 * (2 * 4 + 1) ** 2
            self.fnet = BasicEncoder(256, "instance")
            self.cnet = BasicEncoder(256, "batch")
            self.update_block = BasicUpdateBlock(cor_planes)

        @staticmethod
        def upsample_flow(flow, mask):
            n, _, h, w = flow.shape
            mask = mask.view(n, 1, 9, 8, 8, h, w)
            mask = torch.softmax(mask, dim=2)
            up = F.unfold(8 * flow, [3, 3], padding=1)
            up = up.view(n, 2, 9, 1, 1, h, w)
            up = torch.sum(mask * up, dim=2)
            up = up.permute(0, 1, 4, 2, 5, 3)
            return up.reshape(n, 2, 8 * h, 8 * w)

        def forward(self, img1, img2):
            # inputs in [0, 1] (caller normalizes like models/raft)
            x = torch.cat([img1, img2], dim=0) * 2 - 1
            fmaps = self.fnet(x)
            f1, f2 = fmaps.chunk(2, dim=0)
            ctx = self.cnet(img1 * 2 - 1)
            net = torch.tanh(ctx[:, :128])
            inp = torch.relu(ctx[:, 128:])
            corr_fn = CorrBlock(f1, f2)
            b, _, h8, w8 = f1.shape
            coords0 = coords_grid(b, h8, w8)
            coords1 = coords_grid(b, h8, w8)
            mask = None
            for _ in range(iters):
                corr = corr_fn(coords1)
                flow = coords1 - coords0
                net, mask, delta = self.update_block(net, inp, corr, flow)
                coords1 = coords1 + delta
            return self.upsample_flow(coords1 - coords0, mask)

    return RAFT()


def build_retinaface():
    """biubug6/Pytorch_Retinaface mobilenet0.25 re-statement for
    port-parity: parameter names match the released state dict
    (body.stage*.N..., fpn.*, ssh*, ClassHead/BboxHead/LandmarkHead).
    Forward returns RAW head outputs (cls logits, box deltas, landmark
    deltas) reshaped to anchors — compared against the JAX heads."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def conv_bn(inp, oup, stride=1, leaky=0.1):
        return nn.Sequential(
            nn.Conv2d(inp, oup, 3, stride, 1, bias=False),
            nn.BatchNorm2d(oup), nn.LeakyReLU(leaky, inplace=True))

    def conv_bn1x1(inp, oup, stride=1, leaky=0.1):
        return nn.Sequential(
            nn.Conv2d(inp, oup, 1, stride, 0, bias=False),
            nn.BatchNorm2d(oup), nn.LeakyReLU(leaky, inplace=True))

    def conv_bn_no_relu(inp, oup, stride=1):
        return nn.Sequential(
            nn.Conv2d(inp, oup, 3, stride, 1, bias=False),
            nn.BatchNorm2d(oup))

    def conv_dw(inp, oup, stride, leaky=0.1):
        return nn.Sequential(
            nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
            nn.BatchNorm2d(inp), nn.LeakyReLU(leaky, inplace=True),
            nn.Conv2d(inp, oup, 1, 1, 0, bias=False),
            nn.BatchNorm2d(oup), nn.LeakyReLU(leaky, inplace=True))

    class Body(nn.Module):
        def __init__(self):
            super().__init__()
            self.stage1 = nn.Sequential(
                conv_bn(3, 8, 2), conv_dw(8, 16, 1), conv_dw(16, 32, 2),
                conv_dw(32, 32, 1), conv_dw(32, 64, 2), conv_dw(64, 64, 1))
            self.stage2 = nn.Sequential(
                conv_dw(64, 128, 2), *[conv_dw(128, 128, 1)
                                       for _ in range(5)])
            self.stage3 = nn.Sequential(
                conv_dw(128, 256, 2), conv_dw(256, 256, 1))

    class SSH(nn.Module):
        def __init__(self, c=64):
            super().__init__()
            self.conv3X3 = conv_bn_no_relu(c, c // 2)
            self.conv5X5_1 = conv_bn(c, c // 4)
            self.conv5X5_2 = conv_bn_no_relu(c // 4, c // 4)
            self.conv7X7_2 = conv_bn(c // 4, c // 4)
            self.conv7x7_3 = conv_bn_no_relu(c // 4, c // 4)

        def forward(self, x):
            c3 = self.conv3X3(x)
            c51 = self.conv5X5_1(x)
            c5 = self.conv5X5_2(c51)
            c7 = self.conv7x7_3(self.conv7X7_2(c51))
            return F.relu(torch.cat([c3, c5, c7], dim=1))

    class Head(nn.Module):
        def __init__(self, out_per_anchor):
            super().__init__()
            self.conv1x1 = nn.Conv2d(64, 2 * out_per_anchor, 1)
            self.n = out_per_anchor

        def forward(self, x):
            y = self.conv1x1(x).permute(0, 2, 3, 1).contiguous()
            return y.view(y.shape[0], -1, self.n)

    class FPN(nn.Module):
        def __init__(self):
            super().__init__()
            self.output1 = conv_bn1x1(64, 64)
            self.output2 = conv_bn1x1(128, 64)
            self.output3 = conv_bn1x1(256, 64)
            self.merge1 = conv_bn(64, 64)
            self.merge2 = conv_bn(64, 64)

        def forward(self, f1, f2, f3):
            o1, o2, o3 = self.output1(f1), self.output2(f2), self.output3(f3)
            u3 = F.interpolate(o3, size=o2.shape[-2:], mode="nearest")
            o2 = self.merge2(o2 + u3)
            u2 = F.interpolate(o2, size=o1.shape[-2:], mode="nearest")
            o1 = self.merge1(o1 + u2)
            return o1, o2, o3

    class RetinaFace(nn.Module):
        def __init__(self):
            super().__init__()
            self.body = Body()
            self.fpn = FPN()
            self.ssh1, self.ssh2, self.ssh3 = SSH(), SSH(), SSH()
            self.ClassHead = nn.ModuleList([Head(2) for _ in range(3)])
            self.BboxHead = nn.ModuleList([Head(4) for _ in range(3)])
            self.LandmarkHead = nn.ModuleList([Head(10) for _ in range(3)])

        def forward(self, x):
            # x: BGR, mean-subtracted, (B,3,H,W)
            f1 = self.body.stage1(x)
            f2 = self.body.stage2(f1)
            f3 = self.body.stage3(f2)
            p1, p2, p3 = self.fpn(f1, f2, f3)
            feats = [self.ssh1(p1), self.ssh2(p2), self.ssh3(p3)]
            cls = torch.cat([h(f) for h, f in zip(self.ClassHead, feats)], 1)
            box = torch.cat([h(f) for h, f in zip(self.BboxHead, feats)], 1)
            ldm = torch.cat([h(f) for h, f in zip(self.LandmarkHead, feats)],
                            1)
            return cls, box, ldm

    return RetinaFace()


def build_codeformer():
    """sczhou/CodeFormer re-statement (vqgan_arch + codeformer_arch)
    for port parity: parameter names match codeformer.pth
    (encoder.blocks.N.*, generator.blocks.N.*, quantize.embedding,
    position_emb, feat_emb, ft_layers.N.*, idx_pred_layer.*,
    fuse_convs_dict.<res>.*). Forward takes (B,3,512,512) in [0,1] and
    a fidelity weight w; returns the restored crop in [0,1]."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def normalize(c):
        return nn.GroupNorm(32, c, eps=1e-6, affine=True)

    def swish(x):
        return x * torch.sigmoid(x)

    class ResBlock(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = normalize(cin)
            self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
            self.norm2 = normalize(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
            self.has_skip = cin != cout
            if self.has_skip:
                self.conv_out = nn.Conv2d(cin, cout, 1)

        def forward(self, x):
            y = self.conv1(swish(self.norm1(x)))
            y = self.conv2(swish(self.norm2(y)))
            if self.has_skip:
                x = self.conv_out(x)
            return x + y

    class AttnBlock(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = normalize(c)
            self.q = nn.Conv2d(c, c, 1)
            self.k = nn.Conv2d(c, c, 1)
            self.v = nn.Conv2d(c, c, 1)
            self.proj_out = nn.Conv2d(c, c, 1)

        def forward(self, x):
            h = self.norm(x)
            q, k, v = self.q(h), self.k(h), self.v(h)
            b, c, hh, ww = q.shape
            q = q.reshape(b, c, hh * ww).permute(0, 2, 1)
            k = k.reshape(b, c, hh * ww)
            att = torch.softmax(torch.bmm(q, k) / c ** 0.5, dim=2)
            v = v.reshape(b, c, hh * ww)
            out = torch.bmm(v, att.permute(0, 2, 1))
            return x + self.proj_out(out.reshape(b, c, hh, ww))

    class Downsample(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

        def forward(self, x):
            return self.conv(F.pad(x, (0, 1, 0, 1)))

    class Upsample(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, 1, 1)

        def forward(self, x):
            return self.conv(F.interpolate(x, scale_factor=2,
                                           mode="nearest"))

    nf, ch_mult, res_blocks = 64, (1, 2, 2, 4, 4, 8), 2
    emb, book = 256, 1024

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            blocks = [nn.Conv2d(3, nf, 3, 1, 1)]
            res = 512
            in_mult = (1,) + ch_mult
            for i in range(len(ch_mult)):
                cin, cout = nf * in_mult[i], nf * ch_mult[i]
                for _ in range(res_blocks):
                    blocks.append(ResBlock(cin, cout))
                    cin = cout
                    if res == 16:
                        blocks.append(AttnBlock(cout))
                if i != len(ch_mult) - 1:
                    blocks.append(Downsample(cout))
                    res //= 2
            c = nf * ch_mult[-1]
            blocks += [ResBlock(c, c), AttnBlock(c), ResBlock(c, c),
                       normalize(c), nn.Conv2d(c, emb, 3, 1, 1)]
            self.blocks = nn.ModuleList(blocks)

        def forward(self, x, taps):
            feats = {}
            for blk in self.blocks:
                x = blk(x)
                feats[x.shape[-1]] = x
            for r in taps:
                taps[r] = feats[r]
            return x

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            res = 16
            c = nf * ch_mult[-1]
            blocks = [nn.Conv2d(emb, c, 3, 1, 1), ResBlock(c, c),
                      AttnBlock(c), ResBlock(c, c)]
            self.fuse_at = {}
            for i in reversed(range(len(ch_mult))):
                cout = nf * ch_mult[i]
                for j in range(res_blocks):
                    blocks.append(ResBlock(c, cout))
                    if j == 0 and i != len(ch_mult) - 1:
                        self.fuse_at[len(blocks) - 1] = res
                    c = cout
                    if res == 16:
                        blocks.append(AttnBlock(c))
                if i != 0:
                    blocks.append(Upsample(c))
                    res *= 2
            blocks += [normalize(c), nn.Conv2d(c, 3, 3, 1, 1)]
            self.blocks = nn.ModuleList(blocks)

    class FuseSFT(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.encode_enc = ResBlock(2 * c, c)
            self.scale = nn.Sequential(
                nn.Conv2d(c, c, 3, 1, 1), nn.LeakyReLU(0.2, inplace=True),
                nn.Conv2d(c, c, 3, 1, 1))
            self.shift = nn.Sequential(
                nn.Conv2d(c, c, 3, 1, 1), nn.LeakyReLU(0.2, inplace=True),
                nn.Conv2d(c, c, 3, 1, 1))

        def forward(self, enc, dec, w):
            e = self.encode_enc(torch.cat([enc, dec], dim=1))
            return dec + w * (dec * self.scale(e) + self.shift(e))

    class TransformerSALayer(nn.Module):
        def __init__(self, d=512, nhead=8, mlp=1024):
            super().__init__()
            self.self_attn = nn.MultiheadAttention(d, nhead)
            self.linear1 = nn.Linear(d, mlp)
            self.linear2 = nn.Linear(mlp, d)
            self.norm1 = nn.LayerNorm(d)
            self.norm2 = nn.LayerNorm(d)

        def forward(self, tgt, pos):
            t2 = self.norm1(tgt)
            q = k = t2 + pos
            t2 = self.self_attn(q, k, value=t2)[0]
            tgt = tgt + t2
            t2 = self.norm2(tgt)
            return tgt + self.linear2(F.gelu(self.linear1(t2)))

    class CodeFormer(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.generator = Generator()
            self.quantize = nn.Module()
            self.quantize.embedding = nn.Embedding(book, emb)
            self.position_emb = nn.Parameter(torch.zeros(256, 512))
            self.feat_emb = nn.Linear(emb, 512)
            self.ft_layers = nn.ModuleList(
                [TransformerSALayer() for _ in range(9)])
            self.idx_pred_layer = nn.Sequential(
                nn.LayerNorm(512), nn.Linear(512, book, bias=False))
            channels = {512 // 2 ** i: nf * m
                        for i, m in enumerate(ch_mult)}
            self.fuse_convs_dict = nn.ModuleDict(
                {str(r): FuseSFT(channels[r]) for r in (32, 64, 128, 256)})

        def forward(self, x, w=0.5):
            x = x * 2 - 1
            taps = {32: None, 64: None, 128: None, 256: None}
            lq = self.encoder(x, taps)
            b = lq.shape[0]
            tok = self.feat_emb(lq.flatten(2).permute(2, 0, 1))  # (N,B,d)
            pos = self.position_emb.unsqueeze(1)
            for layer in self.ft_layers:
                tok = layer(tok, pos)
            logits = self.idx_pred_layer(tok).permute(1, 0, 2)   # (B,N,book)
            idx = logits.argmax(dim=-1)
            quant = self.quantize.embedding(idx)                  # (B,N,emb)
            h = quant.permute(0, 2, 1).reshape(b, emb, 16, 16)
            for i, blk in enumerate(self.generator.blocks):
                h = blk(h)
                r = self.generator.fuse_at.get(i)
                if r is not None and str(r) in self.fuse_convs_dict:
                    h = self.fuse_convs_dict[str(r)](taps[r], h, w)
            return torch.clamp((h + 1) / 2, 0, 1)

    return CodeFormer()


def build_basicvsr(num_blocks: int = 30, mid: int = 64):
    """mmediting BasicVSRNet re-statement for port parity: parameter
    names match basicvsr_reds4.pth (spynet.basic_module.N.basic_module
    .M.conv.*, backward_resblocks.main.*, fusion, upsample1/2
    .upsample_conv, conv_hr, conv_last). Forward: (N,T,3,H,W) in [0,1]
    -> (N,T,3,4H,4W); H, W multiples of 32."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def flow_warp(x, flow, padding_mode="zeros"):
        n, _, h, w = x.shape
        ys, xs = torch.meshgrid(torch.arange(h).float(),
                                torch.arange(w).float(), indexing="ij")
        gx = 2 * (xs[None] + flow[:, :, :, 0]) / max(w - 1, 1) - 1
        gy = 2 * (ys[None] + flow[:, :, :, 1]) / max(h - 1, 1) - 1
        grid = torch.stack([gx, gy], dim=-1)
        return F.grid_sample(x, grid, mode="bilinear",
                             padding_mode=padding_mode, align_corners=True)

    class SPyNetBasicModule(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
            mods = []
            for i, (ci, co) in enumerate(chans):
                m = nn.Module()
                m.conv = nn.Conv2d(ci, co, 7, 1, 3)
                mods.append(m)
            self.basic_module = nn.ModuleList(mods)

        def forward(self, x):
            for i, m in enumerate(self.basic_module):
                x = m.conv(x)
                if i < len(self.basic_module) - 1:
                    x = F.relu(x)
            return x

    class SPyNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.basic_module = nn.ModuleList(
                [SPyNetBasicModule() for _ in range(6)])
            self.register_buffer(
                "mean", torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1),
                persistent=False)
            self.register_buffer(
                "std", torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1),
                persistent=False)

        def forward(self, ref, supp):
            n, _, h, w = ref.shape
            refs = [(ref - self.mean) / self.std]
            supps = [(supp - self.mean) / self.std]
            for _ in range(5):
                refs.append(F.avg_pool2d(refs[-1], 2, 2))
                supps.append(F.avg_pool2d(supps[-1], 2, 2))
            refs, supps = refs[::-1], supps[::-1]
            flow = ref.new_zeros(n, 2, h // 32, w // 32)
            for level in range(len(refs)):
                if level == 0:
                    flow_up = flow
                else:
                    flow_up = F.interpolate(
                        flow, scale_factor=2, mode="bilinear",
                        align_corners=True) * 2.0
                warped = flow_warp(supps[level],
                                   flow_up.permute(0, 2, 3, 1),
                                   padding_mode="border")
                flow = flow_up + self.basic_module[level](
                    torch.cat([refs[level], warped, flow_up], dim=1))
            return flow

    class ResidualBlockNoBN(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(mid, mid, 3, 1, 1)
            self.conv2 = nn.Conv2d(mid, mid, 3, 1, 1)

        def forward(self, x):
            return x + self.conv2(F.relu(self.conv1(x)))

    class ResBlocksWithInputConv(nn.Module):
        def __init__(self, cin):
            super().__init__()
            # mmediting: make_layer wraps the blocks in ONE Sequential
            # at main.2 (keys main.2.{i}.conv1 ...)
            self.main = nn.Sequential(
                nn.Conv2d(cin, mid, 3, 1, 1),
                nn.LeakyReLU(0.1, inplace=True),
                nn.Sequential(*[ResidualBlockNoBN()
                                for _ in range(num_blocks)]))

        def forward(self, x):
            return self.main(x)

    class PixelShufflePack(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.upsample_conv = nn.Conv2d(cin, cout * 4, 3, 1, 1)

        def forward(self, x):
            return F.pixel_shuffle(self.upsample_conv(x), 2)

    class BasicVSRNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.spynet = SPyNet()
            self.backward_resblocks = ResBlocksWithInputConv(3 + mid)
            self.forward_resblocks = ResBlocksWithInputConv(3 + mid)
            self.fusion = nn.Conv2d(2 * mid, mid, 1, 1, 0)
            self.upsample1 = PixelShufflePack(mid, mid)
            self.upsample2 = PixelShufflePack(mid, 64)
            self.conv_hr = nn.Conv2d(64, 64, 3, 1, 1)
            self.conv_last = nn.Conv2d(64, 3, 3, 1, 1)
            self.lrelu = nn.LeakyReLU(0.1, inplace=True)

        def forward(self, lrs):
            n, t, c, h, w = lrs.shape
            lrs_1 = lrs[:, :-1].reshape(-1, c, h, w)
            lrs_2 = lrs[:, 1:].reshape(-1, c, h, w)
            flows_backward = self.spynet(lrs_1, lrs_2).view(n, t - 1, 2, h, w)
            flows_forward = self.spynet(lrs_2, lrs_1).view(n, t - 1, 2, h, w)

            outputs = []
            feat_prop = lrs.new_zeros(n, mid, h, w)
            for i in range(t - 1, -1, -1):
                if i < t - 1:
                    flow = flows_backward[:, i]
                    feat_prop = flow_warp(feat_prop,
                                          flow.permute(0, 2, 3, 1))
                feat_prop = torch.cat([lrs[:, i], feat_prop], dim=1)
                feat_prop = self.backward_resblocks(feat_prop)
                outputs.append(feat_prop)
            outputs = outputs[::-1]

            feat_prop = torch.zeros_like(feat_prop)
            final = []
            for i in range(t):
                lr_curr = lrs[:, i]
                if i > 0:
                    flow = flows_forward[:, i - 1]
                    feat_prop = flow_warp(feat_prop,
                                          flow.permute(0, 2, 3, 1))
                feat_prop = torch.cat([lr_curr, feat_prop], dim=1)
                feat_prop = self.forward_resblocks(feat_prop)
                out = torch.cat([outputs[i], feat_prop], dim=1)
                out = self.lrelu(self.fusion(out))
                out = self.lrelu(self.upsample1(out))
                out = self.lrelu(self.upsample2(out))
                out = self.lrelu(self.conv_hr(out))
                out = self.conv_last(out)
                base = F.interpolate(lr_curr, scale_factor=4,
                                     mode="bilinear", align_corners=False)
                final.append(out + base)
            return torch.stack(final, dim=1)

    return BasicVSRNet()


def build_ifnet(channels=(192, 128, 96, 64), scales=(8, 4, 2, 1),
                num_res_convs=8):
    """Practical-RIFE IFNet (v4.6 block structure) re-statement for
    implementation parity with models/ifnet.py: stride-2 conv+PReLU
    downs, one residual skip around the conv chain, ConvTranspose2d
    (c, 24, 4, 2, 1) + PixelShuffle(2) head, coarse-to-fine pyramid
    with bilinear flow rescaling and backward warping."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def conv(cin, cout, stride=1):
        return nn.Sequential(nn.Conv2d(cin, cout, 3, stride, 1),
                             nn.PReLU(cout))

    def warp(x, flow):
        n, _, h, w = x.shape
        ys, xs = torch.meshgrid(torch.arange(h).float(),
                                torch.arange(w).float(), indexing="ij")
        gx = 2 * (xs[None] + flow[:, 0]) / max(w - 1, 1) - 1
        gy = 2 * (ys[None] + flow[:, 1]) / max(h - 1, 1) - 1
        grid = torch.stack([gx, gy], dim=-1)
        return F.grid_sample(x, grid, mode="bilinear",
                             padding_mode="border", align_corners=True)

    class IFBlock(nn.Module):
        def __init__(self, in_planes, c):
            super().__init__()
            self.conv0 = nn.Sequential(conv(in_planes, c // 2, 2),
                                       conv(c // 2, c, 2))
            self.convblock = nn.Sequential(
                *[conv(c, c) for _ in range(num_res_convs)])
            self.lastconv = nn.Sequential(
                nn.ConvTranspose2d(c, 24, 4, 2, 1), nn.PixelShuffle(2))

        def forward(self, x):
            feat = self.conv0(x)
            feat = self.convblock(feat) + feat
            return self.lastconv(feat)

    class IFNet(nn.Module):
        def __init__(self):
            super().__init__()
            blocks = []
            for b, c in enumerate(channels):
                in_ch = 7 if b == 0 else 12
                blocks.append(IFBlock(in_ch, c))
            self.blocks = nn.ModuleList(blocks)

        def forward(self, img0, img1, timestep=0.5):
            n, _, h, w = img0.shape
            flow = img0.new_zeros(n, 4, h, w)
            mask = img0.new_zeros(n, 1, h, w)
            warped0, warped1 = img0, img1
            tmap = img0.new_full((n, 1, h, w), timestep)
            for bi, (blk, scale) in enumerate(zip(self.blocks, scales)):
                sh, sw = h // scale, w // scale
                if bi == 0:
                    x = torch.cat([img0, img1, tmap], dim=1)
                else:
                    x = torch.cat([warped0, warped1, tmap, mask, flow],
                                  dim=1)
                xs = F.interpolate(x, size=(sh, sw), mode="bilinear",
                                   align_corners=False)
                if bi > 0:
                    xs = torch.cat([xs[:, :-4],
                                    xs[:, -4:] / scale], dim=1)
                out = blk(xs)
                out = F.interpolate(out, size=(h, w), mode="bilinear",
                                    align_corners=False)
                flow = flow + out[:, :4] * scale
                mask = out[:, 4:5]
                warped0 = warp(img0, flow[:, 0:2])
                warped1 = warp(img1, flow[:, 2:4])
            m = torch.sigmoid(mask)
            return torch.clamp(warped0 * m + warped1 * (1 - m), 0, 1)

    return IFNet()


def build_gfpgan(out_size: int = 64, num_style_feat: int = 64,
                 channel_multiplier: int = 1, num_mlp: int = 2,
                 narrow: float = 0.25):
    """basicsr GFPGANv1Clean re-statement (gfpganv1_clean_arch +
    stylegan2_clean_arch, the torch-free "clean" ops) for port parity.
    Defaults match the tiny test config of models/gfpgan.py; pass the
    512/512/2/8/1 plan for the released GFPGANv1.4 layout."""
    import math

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    channels = {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow), 64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
    }
    log_size = int(math.log2(out_size))

    class NormStyleCode(nn.Module):
        def forward(self, x):
            return x * torch.rsqrt(torch.mean(x ** 2, dim=1,
                                              keepdim=True) + 1e-8)

    class ModulatedConv2d(nn.Module):
        def __init__(self, cin, cout, k, demodulate=True, sample_mode=None):
            super().__init__()
            self.demodulate = demodulate
            self.sample_mode = sample_mode
            self.kernel_size = k
            self.modulation = nn.Linear(num_style_feat, cin, bias=True)
            self.weight = nn.Parameter(
                torch.randn(1, cout, cin, k, k)
                / math.sqrt(cin * k ** 2))

        def forward(self, x, style):
            b, c, h, w = x.shape
            style = self.modulation(style).view(b, 1, c, 1, 1)
            weight = self.weight * style
            if self.demodulate:
                demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
                weight = weight * demod.view(b, -1, 1, 1, 1)
            weight = weight.view(-1, c, self.kernel_size, self.kernel_size)
            if self.sample_mode == "upsample":
                x = F.interpolate(x, scale_factor=2, mode="bilinear",
                                  align_corners=False)
            b, c, h, w = x.shape
            x = x.view(1, b * c, h, w)
            out = F.conv2d(x, weight, padding=self.kernel_size // 2,
                           groups=b)
            return out.view(b, -1, h, w)

    class StyleConv(nn.Module):
        def __init__(self, cin, cout, k, sample_mode=None):
            super().__init__()
            self.modulated_conv = ModulatedConv2d(
                cin, cout, k, sample_mode=sample_mode)
            self.weight = nn.Parameter(torch.zeros(1))     # noise weight
            self.bias = nn.Parameter(torch.zeros(1, cout, 1, 1))
            self.activate = nn.LeakyReLU(negative_slope=0.2, inplace=True)

        def forward(self, x, style, noise=None):
            out = self.modulated_conv(x, style) * 2 ** 0.5  # for conversion
            if noise is not None:
                out = out + self.weight * noise
            out = out + self.bias
            return self.activate(out)

    class ToRGB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.modulated_conv = ModulatedConv2d(cin, 3, 1,
                                                  demodulate=False)
            self.bias = nn.Parameter(torch.zeros(1, 3, 1, 1))

        def forward(self, x, style, skip=None):
            out = self.modulated_conv(x, style) + self.bias
            if skip is not None:
                skip = F.interpolate(skip, scale_factor=2, mode="bilinear",
                                     align_corners=False)
                out = out + skip
            return out

    class StyleGAN2GeneratorCSFT(nn.Module):
        def __init__(self, sft_half=True):
            super().__init__()
            self.sft_half = sft_half
            mlp = [NormStyleCode()]
            for _ in range(num_mlp):
                mlp += [nn.Linear(num_style_feat, num_style_feat),
                        nn.LeakyReLU(0.2, True)]
            self.style_mlp = nn.Sequential(*mlp)

            class ConstantInput(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.weight = nn.Parameter(
                        torch.randn(1, channels[4], 4, 4))

            self.constant_input = ConstantInput()
            self.style_conv1 = StyleConv(channels[4], channels[4], 3)
            self.to_rgb1 = ToRGB(channels[4])
            self.style_convs = nn.ModuleList()
            self.to_rgbs = nn.ModuleList()
            cin = channels[4]
            for i in range(3, log_size + 1):
                cout = channels[2 ** i]
                self.style_convs.append(
                    StyleConv(cin, cout, 3, sample_mode="upsample"))
                self.style_convs.append(StyleConv(cout, cout, 3))
                self.to_rgbs.append(ToRGB(cout))
                cin = cout

        def forward(self, latent, conditions):
            # latent: (b, n_latents, nsf), input_is_latent=True,
            # noise disabled (None) for parity determinism
            out = self.constant_input.weight.repeat(
                latent.shape[0], 1, 1, 1)
            out = self.style_conv1(out, latent[:, 0])
            skip = self.to_rgb1(out, latent[:, 1])
            i = 1
            for conv1, conv2, to_rgb in zip(self.style_convs[::2],
                                            self.style_convs[1::2],
                                            self.to_rgbs):
                out = conv1(out, latent[:, i])
                if i < len(conditions):
                    if self.sft_half:
                        out_same, out_sft = torch.split(
                            out, out.size(1) // 2, dim=1)
                        out_sft = out_sft * conditions[i - 1] \
                            + conditions[i]
                        out = torch.cat([out_same, out_sft], dim=1)
                    else:
                        out = out * conditions[i - 1] + conditions[i]
                out = conv2(out, latent[:, i + 1])
                skip = to_rgb(out, latent[:, i + 2], skip)
                i += 2
            return skip

    class ResBlock(nn.Module):
        def __init__(self, cin, cout, mode):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cin, 3, 1, 1)
            self.conv2 = nn.Conv2d(cin, cout, 3, 1, 1)
            self.skip = nn.Conv2d(cin, cout, 1, bias=False)
            self.scale_factor = 0.5 if mode == "down" else 2

        def forward(self, x):
            out = F.leaky_relu(self.conv1(x), 0.2)
            out = F.interpolate(out, scale_factor=self.scale_factor,
                                mode="bilinear", align_corners=False)
            out = F.leaky_relu(self.conv2(out), 0.2)
            x = F.interpolate(x, scale_factor=self.scale_factor,
                              mode="bilinear", align_corners=False)
            return out + self.skip(x)

    class GFPGANv1Clean(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_body_first = nn.Conv2d(3, channels[out_size], 1)
            self.conv_body_down = nn.ModuleList()
            res = out_size
            while res > 4:
                self.conv_body_down.append(
                    ResBlock(channels[res], channels[res // 2], "down"))
                res //= 2
            self.final_conv = nn.Conv2d(channels[4], channels[4], 3, 1, 1)
            n_latents = log_size * 2 - 2
            self.final_linear = nn.Linear(channels[4] * 16,
                                          n_latents * num_style_feat)
            self.conv_body_up = nn.ModuleList()
            self.condition_scale = nn.ModuleList()
            self.condition_shift = nn.ModuleList()
            self.toRGB = nn.ModuleList()
            res = 4
            while res < out_size:
                cin, cout = channels[res], channels[res * 2]
                self.conv_body_up.append(ResBlock(cin, cout, "up"))
                sft = cout // 2
                self.condition_scale.append(nn.Sequential(
                    nn.Conv2d(cout, cout, 3, 1, 1),
                    nn.LeakyReLU(0.2, True),
                    nn.Conv2d(cout, sft, 3, 1, 1)))
                self.condition_shift.append(nn.Sequential(
                    nn.Conv2d(cout, cout, 3, 1, 1),
                    nn.LeakyReLU(0.2, True),
                    nn.Conv2d(cout, sft, 3, 1, 1)))
                self.toRGB.append(nn.Conv2d(cout, 3, 1))
                res *= 2
            self.stylegan_decoder = StyleGAN2GeneratorCSFT()

        def forward(self, x):
            feat = F.leaky_relu(self.conv_body_first(x), 0.2)
            skips = []
            for blk in self.conv_body_down:
                feat = blk(feat)
                skips.insert(0, feat)
            feat = F.leaky_relu(self.final_conv(feat), 0.2)
            code = self.final_linear(feat.flatten(1))
            code = code.view(code.shape[0], -1, num_style_feat)
            conditions = []
            for i, blk in enumerate(self.conv_body_up):
                feat = feat + skips[i]
                feat = blk(feat)
                conditions.append(self.condition_scale[i](feat))
                conditions.append(self.condition_shift[i](feat))
            return self.stylegan_decoder(code, conditions)

    return GFPGANv1Clean()


def build_hat(embed: int = 180, depths=(6,) * 6, heads: int = 6,
              window: int = 16, overlap: float = 0.5, mlp_ratio: float = 2.0,
              compress: int = 3, squeeze: int = 30, scale: int = 4,
              img_range: float = 1.0):
    """Official HAT (Chen et al. CVPR 2023, XPixelGroup/HAT hat_arch.py;
    reference processors/hat_upscaler.py:120 loads these checkpoints):
    full model — conv_first, patch_embed LayerNorm, RHAG groups (HAB
    blocks + OCAB + conv), final norm, conv_after_body residual,
    pixelshuffle upsampler, rgb-mean/img_range wrapper. State-dict keys
    match the released HAT_SRx4.pth layout (the manifest)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    win = window
    kv_win = int(win * (1 + overlap))
    hidden = int(embed * mlp_ratio)
    head_dim = embed // heads

    def win_part(x, w):
        b, h, ww, c = x.shape
        x = x.view(b, h // w, w, ww // w, w, c)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)

    def win_merge(x, w, b, h, ww):
        c = x.shape[-1]
        x = x.view(b, h // w, ww // w, w, w, c)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, ww, c)

    def rpi_sa():
        coords = torch.stack(torch.meshgrid(
            torch.arange(win), torch.arange(win), indexing="ij")).flatten(1)
        rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
        rel = rel + win - 1
        return rel[:, :, 0] * (2 * win - 1) + rel[:, :, 1]

    def rpi_oca():
        cq = torch.stack(torch.meshgrid(
            torch.arange(win), torch.arange(win), indexing="ij")).flatten(1)
        ck = torch.stack(torch.meshgrid(
            torch.arange(kv_win), torch.arange(kv_win),
            indexing="ij")).flatten(1)
        rel = (cq[:, :, None] - ck[:, None, :]).permute(1, 2, 0) + kv_win - 1
        return rel[:, :, 0] * (win + kv_win - 1) + rel[:, :, 1]

    class ChannelAttention(nn.Module):
        def __init__(self):
            super().__init__()
            self.attention = nn.Sequential(
                nn.AdaptiveAvgPool2d(1),
                nn.Conv2d(embed, embed // squeeze, 1), nn.ReLU(True),
                nn.Conv2d(embed // squeeze, embed, 1), nn.Sigmoid())

        def forward(self, x):
            return x * self.attention(x)

    class CAB(nn.Module):
        def __init__(self):
            super().__init__()
            self.cab = nn.Sequential(
                nn.Conv2d(embed, embed // compress, 3, 1, 1), nn.GELU(),
                nn.Conv2d(embed // compress, embed, 3, 1, 1),
                ChannelAttention())

        def forward(self, x):
            return self.cab(x)

    class WindowAttention(nn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = nn.Linear(embed, embed * 3)
            self.proj = nn.Linear(embed, embed)
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros((2 * win - 1) ** 2, heads))

        def forward(self, x, rpi, mask=None):
            b_, n, c = x.shape
            qkv = self.qkv(x).reshape(b_, n, 3, heads, head_dim) \
                .permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            q = q * head_dim ** -0.5
            attn = q @ k.transpose(-2, -1)
            bias = self.relative_position_bias_table[rpi.view(-1)] \
                .view(n, n, -1).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(b_ // nw, nw, heads, n, n) \
                    + mask.unsqueeze(1).unsqueeze(0)
                attn = attn.view(-1, heads, n, n)
            attn = torch.softmax(attn, dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(embed, hidden)
            self.fc2 = nn.Linear(hidden, embed)

        def forward(self, x):
            return self.fc2(F.gelu(self.fc1(x)))

    class HAB(nn.Module):
        def __init__(self, shift):
            super().__init__()
            self.shift = shift
            self.norm1 = nn.LayerNorm(embed)
            self.attn = WindowAttention()
            self.conv_block = CAB()
            self.norm2 = nn.LayerNorm(embed)
            self.mlp = Mlp()

        def forward(self, x, x_size, rpi, mask):
            h, w = x_size
            b, _, c = x.shape
            shortcut = x
            x = self.norm1(x).view(b, h, w, c)
            conv_x = self.conv_block(x.permute(0, 3, 1, 2))
            conv_x = conv_x.permute(0, 2, 3, 1).reshape(b, h * w, c)
            if self.shift:
                sx = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
                m = mask
            else:
                sx, m = x, None
            tok = win_part(sx, win)
            att = self.attn(tok, rpi, m)
            att = win_merge(att, win, b, h, w)
            if self.shift:
                att = torch.roll(att, (self.shift, self.shift), dims=(1, 2))
            att = att.reshape(b, h * w, c)
            x = shortcut + att + conv_x * 0.01
            return x + self.mlp(self.norm2(x))

    class OCAB(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(embed)
            self.qkv = nn.Linear(embed, embed * 3)
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros((win + kv_win - 1) ** 2, heads))
            self.proj = nn.Linear(embed, embed)
            self.norm2 = nn.LayerNorm(embed)
            self.mlp = Mlp()
            self.unfold = nn.Unfold(kernel_size=(kv_win, kv_win),
                                    stride=win, padding=(kv_win - win) // 2)

        def forward(self, x, x_size, rpi):
            h, w = x_size
            b, _, c = x.shape
            shortcut = x
            x = self.norm1(x).view(b, h, w, c)
            qkv = self.qkv(x).reshape(b, h, w, 3, c).permute(3, 0, 4, 1, 2)
            q = qkv[0].permute(0, 2, 3, 1)                 # (b, h, w, c)
            kv = torch.cat([qkv[1], qkv[2]], dim=1)        # (b, 2c, h, w)
            q_tok = win_part(q, win)                       # (nw*b, win², c)
            kv_tok = self.unfold(kv)                       # (b, 2c·kv², nW)
            kv_tok = kv_tok.view(
                b, 2 * c, kv_win * kv_win, -1).permute(0, 3, 2, 1)
            kv_tok = kv_tok.reshape(-1, kv_win * kv_win, 2 * c)
            k_tok, v_tok = kv_tok[:, :, :c], kv_tok[:, :, c:]

            b_, nq, _ = q_tok.shape
            qh = q_tok.reshape(b_, nq, heads, head_dim).permute(0, 2, 1, 3)
            kh = k_tok.reshape(b_, -1, heads, head_dim).permute(0, 2, 1, 3)
            vh = v_tok.reshape(b_, -1, heads, head_dim).permute(0, 2, 1, 3)
            qh = qh * head_dim ** -0.5
            attn = qh @ kh.transpose(-2, -1)
            bias = self.relative_position_bias_table[rpi.view(-1)] \
                .view(nq, kv_win * kv_win, -1).permute(2, 0, 1)
            attn = torch.softmax(attn + bias.unsqueeze(0), dim=-1)
            out = (attn @ vh).transpose(1, 2).reshape(b_, nq, c)
            out = win_merge(self.proj(out), win, b, h, w).reshape(b, h * w, c)
            x = shortcut + out
            return x + self.mlp(self.norm2(x))

    class AttenBlocks(nn.Module):
        def __init__(self, depth):
            super().__init__()
            self.blocks = nn.ModuleList(
                [HAB(0 if i % 2 == 0 else win // 2) for i in range(depth)])
            self.overlap_attn = OCAB()

        def forward(self, x, x_size, params):
            for blk in self.blocks:
                x = blk(x, x_size, params["rpi_sa"], params["attn_mask"])
            return self.overlap_attn(x, x_size, params["rpi_oca"])

    class RHAG(nn.Module):
        def __init__(self, depth):
            super().__init__()
            self.residual_group = AttenBlocks(depth)
            self.conv = nn.Conv2d(embed, embed, 3, 1, 1)

        def forward(self, x, x_size, params):
            h, w = x_size
            y = self.residual_group(x, x_size, params)
            b, _, c = y.shape
            y = y.transpose(1, 2).view(b, c, h, w)
            y = self.conv(y).flatten(2).transpose(1, 2)
            return y + x

    class HAT(nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer(
                "mean",
                torch.tensor([0.4488, 0.4371, 0.4040]).view(1, 3, 1, 1),
                persistent=False)
            self.conv_first = nn.Conv2d(3, embed, 3, 1, 1)
            self.patch_embed = nn.Module()
            self.patch_embed.norm = nn.LayerNorm(embed)
            self.layers = nn.ModuleList([RHAG(d) for d in depths])
            self.norm = nn.LayerNorm(embed)
            self.conv_after_body = nn.Conv2d(embed, embed, 3, 1, 1)
            self.conv_before_upsample = nn.Sequential(
                nn.Conv2d(embed, 64, 3, 1, 1), nn.LeakyReLU(inplace=True))
            ups = []
            for _ in range(scale // 2):
                ups += [nn.Conv2d(64, 256, 3, 1, 1), nn.PixelShuffle(2)]
            self.upsample = nn.Sequential(*ups)
            self.conv_last = nn.Conv2d(64, 3, 3, 1, 1)
            self.register_buffer("rpi_sa_buf", rpi_sa(), persistent=False)
            self.register_buffer("rpi_oca_buf", rpi_oca(), persistent=False)

        def calculate_mask(self, x_size):
            h, w = x_size
            shift = win // 2
            img = torch.zeros(1, h, w, 1)
            cnt = 0
            for hs in (slice(0, -win), slice(-win, -shift),
                       slice(-shift, None)):
                for ws in (slice(0, -win), slice(-win, -shift),
                           slice(-shift, None)):
                    img[:, hs, ws, :] = cnt
                    cnt += 1
            tok = win_part(img, win).view(-1, win * win)
            diff = tok.unsqueeze(1) - tok.unsqueeze(2)
            return diff.masked_fill(diff != 0, -100.0) \
                .masked_fill(diff == 0, 0.0)

        def forward(self, x):
            h0, w0 = x.shape[2:]
            x = (x - self.mean) * img_range
            ph, pw = (-h0) % win, (-w0) % win
            if ph or pw:
                x = F.pad(x, (0, pw, 0, ph), mode="reflect")
            h, w = x.shape[2:]
            params = {
                "attn_mask": self.calculate_mask((h, w)).to(x.device),
                "rpi_sa": self.rpi_sa_buf,
                "rpi_oca": self.rpi_oca_buf,
            }
            feat = self.conv_first(x)
            b, c = feat.shape[0], feat.shape[1]
            tok = self.patch_embed.norm(feat.flatten(2).transpose(1, 2))
            for layer in self.layers:
                tok = layer(tok, (h, w), params)
            tok = self.norm(tok)
            body = tok.transpose(1, 2).view(b, c, h, w)
            feat = feat + self.conv_after_body(body)
            y = self.conv_before_upsample(feat)
            y = self.conv_last(self.upsample(y))
            y = y / img_range + self.mean
            return y[:, :, : h0 * scale, : w0 * scale]

    return HAT()


def build_tvsr(dim: int = 64, heads: int = 4, window: int = 8,
               depth: int = 6, mlp_ratio: int = 2, scale: int = 4):
    """Torch restatement of models/tvsr.py (VRT-class TMSA VSR — the
    reference's VRTProcessor slot, advanced_models.py:768). TVSR is an
    original architecture, so the twin exists to pin the JAX
    implementation's window/shift/mask algebra against an independent
    torch implementation (same role as the GFPGAN/CodeFormer twins).
    State-dict layout == manifests/TVSR_x4.json."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    win = window
    shift = win // 2
    head_dim = dim // heads

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = nn.LayerNorm(dim)
            self.qkv = nn.Linear(dim, 3 * dim)
            self.proj = nn.Linear(dim, dim)
            self.ln2 = nn.LayerNorm(dim)
            self.fc1 = nn.Linear(dim, mlp_ratio * dim)
            self.fc2 = nn.Linear(mlp_ratio * dim, dim)

        def tmsa(self, x, sh, mask):
            b, t, h, w, c = x.shape
            if sh:
                x = torch.roll(x, (-sh, -sh), dims=(2, 3))
            nh, nw = h // win, w // win
            tok = x.view(b, t, nh, win, nw, win, c)
            tok = tok.permute(0, 2, 4, 1, 3, 5, 6).reshape(
                b * nh * nw, t * win * win, c)
            q, k, v = self.qkv(self.ln1(tok)).chunk(3, dim=-1)
            L = t * win * win

            def split(z):
                return z.view(-1, L, heads, head_dim).transpose(1, 2)

            q, k, v = split(q), split(k), split(v)
            att = (q @ k.transpose(-2, -1)) * head_dim ** -0.5
            if sh and mask is not None:
                att = att.view(b, nh * nw, heads, L, L) + \
                    mask[None, :, None]
                att = att.view(b * nh * nw, heads, L, L)
            att = torch.softmax(att, dim=-1)
            out = (att @ v).transpose(1, 2).reshape(-1, L, c)
            out = self.proj(out)
            out = out.view(b, nh, nw, t, win, win, c)
            out = out.permute(0, 3, 1, 4, 2, 5, 6).reshape(b, t, h, w, c)
            if sh:
                out = torch.roll(out, (sh, sh), dims=(2, 3))
            return out

        def mlp(self, x):
            # tanh-approximate GELU on both sides: this original arch's
            # contract is the TPU-fast jax.nn.gelu default
            return self.fc2(
                F.gelu(self.fc1(self.ln2(x)), approximate="tanh"))

    class Pair(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = Block()
            self.b = Block()

    class TVSR(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_first = nn.Conv2d(3, dim, 3, 1, 1)
            self.pairs = nn.ModuleList(
                [Pair() for _ in range(depth // 2)])
            self.conv_body = nn.Conv2d(dim, dim, 3, 1, 1)
            self.up1 = nn.Conv2d(dim, dim * 4, 3, 1, 1)
            self.up2 = nn.Conv2d(dim, dim * 4, 3, 1, 1)
            self.conv_hr = nn.Conv2d(dim, dim, 3, 1, 1)
            self.conv_last = nn.Conv2d(dim, 3, 3, 1, 1)

        def forward(self, frames, mask, base=None):
            # frames: (b, t, h, w, 3) in [0,1]; mask: (nW, L, L);
            # base: optional precomputed bicubic upsample (b*t, 3, sH, sW)
            # — jax and torch bicubic kernels differ (a=-0.5 vs -0.75),
            # parity tests inject the jax one
            b, t, h, w, _ = frames.shape
            flat = frames.reshape(b * t, h, w, 3).permute(0, 3, 1, 2)
            x = self.conv_first(flat)
            x0 = x
            x = x.permute(0, 2, 3, 1).view(b, t, h, w, dim)
            for pair in self.pairs:
                x = x + pair.a.tmsa(x, 0, None)
                x = x + pair.a.mlp(x)
                x = x + pair.b.tmsa(x, shift, mask)
                x = x + pair.b.mlp(x)
            feat = x.reshape(b * t, h, w, dim).permute(0, 3, 1, 2)
            feat = self.conv_body(feat) + x0
            y = F.leaky_relu(
                F.pixel_shuffle(self.up1(feat), 2), 0.1)
            if scale == 4:
                y = F.leaky_relu(
                    F.pixel_shuffle(self.up2(y), 2), 0.1)
            y = self.conv_last(F.leaky_relu(self.conv_hr(y), 0.1))
            if base is None:
                base = F.interpolate(flat, scale_factor=scale,
                                     mode="bicubic", align_corners=False)
            out = base + y
            return out.permute(0, 2, 3, 1).view(
                b, t, h * scale, w * scale, 3)

    return TVSR()


def build_ddcolor(dims=(96, 192, 384, 768), depths=(3, 3, 9, 3),
                  num_queries: int = 100, embed_dim: int = 256,
                  pixel_dim: int = 64, heads: int = 8,
                  dec_layers_per_scale: int = 3):
    """Torch restatement of models/ddcolor.py at large_config() dims
    (DDColor-class query colorization — reference restoration/
    colorization.py:248-569 DDColorBackend). Pins the JAX
    implementation numerically: ConvNeXt encoder (dwconv7x7 + LN(1e-6)
    + MLP + layer scale), FPN pixel decoder, query cross-attention
    color decoder, correlation volume + tanh ab head. GELU is tanh-
    approximate on both sides (the TPU-fast variant is the contract
    for this original-arch model)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    gelu = nn.GELU(approximate="tanh")
    n_scales = len(dims)

    class Block(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dw = nn.Conv2d(dim, dim, 7, 1, 3, groups=dim)
            self.ln = nn.LayerNorm(dim, eps=1e-6)
            self.fc1 = nn.Linear(dim, dim * 4)
            self.fc2 = nn.Linear(dim * 4, dim)
            self.gamma = nn.Parameter(torch.full((dim,), 1e-2))

        def forward(self, x):        # x: (B,H,W,C)
            y = self.dw(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            y = self.ln(y)
            y = self.fc2(gelu(self.fc1(y)))
            return x + self.gamma * y

    class Down(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.ln = nn.LayerNorm(cin, eps=1e-6)
            self.conv = nn.Conv2d(cin, cout, 2, 2, 0)

        def forward(self, x):
            return self.conv(self.ln(x).permute(0, 3, 1, 2)) \
                .permute(0, 2, 3, 1)

    class Dec(nn.Module):
        def __init__(self):
            super().__init__()
            d = embed_dim
            self.q = nn.Linear(d, d)
            self.k = nn.Linear(d, d)
            self.v = nn.Linear(d, d)
            self.o = nn.Linear(d, d)
            self.ln1 = nn.LayerNorm(d, eps=1e-6)
            self.ffn1 = nn.Linear(d, d * 2)
            self.ffn2 = nn.Linear(d * 2, d)
            self.ln2 = nn.LayerNorm(d, eps=1e-6)

        def forward(self, q, kv):
            b, kq, d = q.shape
            hd = d // heads

            def split(t):
                return t.view(b, -1, heads, hd).transpose(1, 2)

            att = torch.softmax(
                split(self.q(q)) @ split(self.k(kv)).transpose(-2, -1)
                / hd ** 0.5, dim=-1)
            o = (att @ split(self.v(kv))).transpose(1, 2).reshape(b, kq, d)
            q = self.ln1(q + self.o(o))
            return self.ln2(q + self.ffn2(gelu(self.ffn1(q))))

    class DDColor(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Conv2d(1, dims[0], 4, 4, 0)
            self.stages = nn.ModuleList(
                [nn.ModuleList([Block(d) for _ in range(depths[i])])
                 for i, d in enumerate(dims)])
            self.downs = nn.ModuleList(
                [Down(dims[i], dims[i + 1]) for i in range(n_scales - 1)])
            self.lateral = nn.ModuleList(
                [nn.Conv2d(d, pixel_dim, 1) for d in dims])
            self.fpn_out = nn.ModuleList(
                [nn.Conv2d(pixel_dim, pixel_dim, 3, 1, 1) for _ in dims])
            self.pix_up = nn.Conv2d(pixel_dim, pixel_dim, 3, 1, 1)
            self.queries = nn.Parameter(torch.zeros(num_queries, embed_dim))
            self.feat_proj = nn.ModuleList(
                [nn.Linear(d, embed_dim) for d in dims[1:]])
            self.dec = nn.ModuleList(
                [Dec() for _ in range(3 * dec_layers_per_scale)])
            self.q_final = nn.Linear(embed_dim, pixel_dim)
            self.out = nn.Conv2d(num_queries, 2, 1)

        def forward(self, l_channel):   # (B,H,W,1) in [0,100]
            b, h, w, _ = l_channel.shape
            x = l_channel / 100.0 - 0.5
            feats = []
            hx = self.stem(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            for si in range(n_scales):
                for blk in self.stages[si]:
                    hx = blk(hx)
                feats.append(hx)
                if si + 1 < n_scales:
                    hx = self.downs[si](hx)
            pix = self.lateral[-1](feats[-1].permute(0, 3, 1, 2))
            for si in range(n_scales - 2, -1, -1):
                lat = self.lateral[si](feats[si].permute(0, 3, 1, 2))
                pix = lat + F.interpolate(
                    pix, size=lat.shape[2:], mode="bilinear",
                    align_corners=False)
                pix = self.fpn_out[si](pix)
            pix = F.interpolate(pix, size=(h, w), mode="bilinear",
                                align_corners=False)
            pix = self.pix_up(pix).permute(0, 2, 3, 1)

            q = self.queries.unsqueeze(0).expand(b, -1, -1)
            li = 0
            for scale_idx in (2, 1, 0):
                feat = feats[scale_idx + 1]
                kv = self.feat_proj[scale_idx](
                    feat.reshape(b, -1, feat.shape[-1]))
                for _ in range(dec_layers_per_scale):
                    q = self.dec[li](q, kv)
                    li += 1
            qp = self.q_final(q)
            vol = torch.einsum("bhwd,bkd->bhwk", pix, qp)
            ab = self.out(vol.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return torch.tanh(ab) * 110.0

    return DDColor()
