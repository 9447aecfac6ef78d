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


def parity_check(name: str, sd: dict, arch_config, family: str,
                 size: Tuple[int, int] = (64, 96)) -> dict:
    """Load a real state dict into BOTH implementations, run one frame,
    return {'psnr_db': ..., 'max_abs': ...}. Raises for families with
    no torch reference."""
    import torch

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
    else:
        raise ValueError(f"no torch reference for family {family!r}")

    missing, unexpected = tm.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    if missing:
        raise ValueError(f"torch reference missing keys: {missing[:5]}")
    tm.eval()
    with torch.no_grad():
        y_t = tm(torch.as_tensor(x.transpose(0, 3, 1, 2)))
    y_torch = y_t.numpy().transpose(0, 2, 3, 1)
    diff = y_jax.astype(np.float64) - y_torch.astype(np.float64)
    mse = float(np.mean(diff ** 2))
    return {
        "psnr_db": 10 * np.log10(1.0 / max(mse, 1e-20)),
        "max_abs": float(np.abs(diff).max()),
        "unexpected_keys": list(unexpected),
    }
