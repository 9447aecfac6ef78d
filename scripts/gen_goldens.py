#!/usr/bin/env python
"""Generate golden regression fixtures for the model zoo.

Each fixture (tests/goldens/<name>.npz) holds a tiny deterministic
input and the model's fp32 output at the CURRENT twin-verified state
of the implementation. tests/test_goldens.py replays them; any silent
numeric drift (a kernel rewrite, a port change, an op-semantics bug)
trips the comparison without needing torch installed.

Regenerate deliberately (after an intentional numeric change verified
against the torch twins): python scripts/gen_goldens.py
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU
# through the config before any jax op (goldens must be CPU-fp32)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens"


def cases():
    """name -> (apply_fn, params, input) builders, all tiny + seeded."""
    import jax
    import jax.numpy as jnp

    from framewright_tpu.models import (
        ddcolor, hat, ifnet, nafnet, restormer, rrdb, srvgg, tvsr,
    )

    rng = np.random.default_rng(42)

    def img(shape):
        return jnp.asarray(rng.random(shape, dtype=np.float32))

    out = {}

    cfg = rrdb.RRDBConfig(num_block=2, scale=2)
    p = rrdb.stack_body(rrdb.init(jax.random.PRNGKey(0), cfg))
    x = img((1, 24, 32, 3))
    out["rrdb_x2_2b"] = (lambda: rrdb.apply(p, x, cfg), x)

    scfg = srvgg.SRVGGConfig(num_conv=4, scale=4)
    sp = srvgg.init(jax.random.PRNGKey(1), scfg)
    sx = img((1, 16, 16, 3))
    out["srvgg_4c"] = (lambda: srvgg.apply(sp, sx, scfg), sx)

    hcfg = hat.HATConfig(embed_dim=48, depths=(2,), num_heads=4,
                         window=8, scale=4)
    hp = hat.init(jax.random.PRNGKey(2), hcfg)
    hx = img((1, 16, 16, 3))
    out["hat_tiny"] = (lambda: hat.apply(hp, hx, hcfg), hx)

    tcfg = tvsr.TVSRConfig(dim=32, depth=2, window=8, scale=4)
    tp = tvsr.init(jax.random.PRNGKey(3), tcfg)
    tx = img((1, 2, 16, 16, 3))
    out["tvsr_tiny"] = (lambda: tvsr.apply(tp, tx, tcfg), tx)

    dcfg = ddcolor.DDColorConfig()
    dp = ddcolor.init(jax.random.PRNGKey(4), dcfg)
    dx = img((1, 32, 32, 1)) * 100.0
    out["ddcolor_small"] = (lambda: ddcolor.apply(dp, dx, dcfg), dx)

    ncfg = nafnet.NAFNetConfig(width=8, enc_blocks=(1, 1),
                               middle_blocks=1, dec_blocks=(1, 1))
    npp = nafnet.init(jax.random.PRNGKey(5), ncfg)
    nx = img((1, 32, 32, 3))
    out["nafnet_tiny"] = (lambda: nafnet.apply(npp, nx, ncfg), nx)

    rcfg = restormer.RestormerConfig(dim=8, num_blocks=(1, 1, 1, 1),
                                     heads=(1, 1, 2, 2), num_refinement=1)
    rp = restormer.init(jax.random.PRNGKey(6), rcfg)
    rx = img((1, 32, 32, 3))
    out["restormer_tiny"] = (lambda: restormer.apply(rp, rx, rcfg), rx)

    icfg = ifnet.IFNetConfig()
    ip = ifnet.init(jax.random.PRNGKey(7), icfg)
    i0 = img((1, 32, 32, 3))
    i1 = img((1, 32, 32, 3))
    out["ifnet"] = (
        lambda: ifnet.apply(ip, i0, i1, 0.5, icfg),
        jnp.stack([i0, i1]))

    from framewright_tpu.models import (
        codeformer, gfpgan, lama, raft, retinaface, vsr,
    )

    gcfg = gfpgan.GFPGANConfig(out_size=64, num_style_feat=64,
                               channel_multiplier=1, num_mlp=2, narrow=0.25)
    gp = gfpgan.init(jax.random.PRNGKey(8), gcfg)
    gx = img((1, 64, 64, 3)) * 2.0 - 1.0
    out["gfpgan_tiny"] = (lambda: gfpgan.apply(gp, gx, gcfg), gx)

    ccfg = codeformer.CodeFormerConfig(
        img_size=64, nf=8, ch_mult=(1, 2, 4), res_blocks=1,
        attn_resolution=16, emb_dim=16, codebook_size=32, dim_embd=32,
        n_head=4, n_layers=2, connect=(32,))
    cp = codeformer.init(jax.random.PRNGKey(9), ccfg)
    cx = img((1, 64, 64, 3))
    out["codeformer_tiny"] = (lambda: codeformer.apply(cp, cx, ccfg), cx)

    fcfg = raft.RAFTConfig(iters=4)
    fp = raft.init(jax.random.PRNGKey(10), fcfg)
    f0 = img((1, 32, 40, 3))
    f1 = img((1, 32, 40, 3))
    out["raft_tiny"] = (
        lambda: raft.apply(fp, f0, f1, fcfg), jnp.stack([f0, f1]))

    vcfg = vsr.BasicVSRConfig(mid_channels=8, num_blocks=2,
                              spynet_levels=3)
    vp = vsr.init(jax.random.PRNGKey(11), vcfg)
    vx = img((1, 2, 16, 16, 3))
    out["basicvsr_tiny"] = (lambda: vsr.apply(vp, vx, vcfg), vx)

    # retinaface: golden pins the anchor SCORES head (backbone + FPN +
    # SSH + heads); box/landmark decode is pure anchor algebra covered
    # by tests/test_retinaface.py
    rfcfg = retinaface.RetinaFaceConfig()
    rfp = retinaface.init(jax.random.PRNGKey(12), rfcfg)
    rfx = img((1, 32, 32, 3))
    out["retinaface_tiny"] = (
        lambda: retinaface.apply(rfp, rfx, rfcfg), rfx)

    lcfg = lama.LamaConfig(ngf=8, n_down=2, n_blocks=2)
    lp = lama.init(jax.random.PRNGKey(13), lcfg)
    limg = img((1, 16, 16, 3))
    lmask = jnp.zeros((1, 16, 16, 1)).at[:, 4:10, 5:12].set(1.0)
    out["lama_tiny"] = (
        lambda: lama.apply(lp, limg, lmask, lcfg),
        jnp.concatenate([limg, lmask], axis=-1))

    return out


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, (fn, x) in cases().items():
        y = fn()
        if isinstance(y, (tuple, list)):
            y = y[0]
        y = np.asarray(y, np.float32)
        np.savez_compressed(OUT / f"{name}.npz",
                            x=np.asarray(x, np.float32), y=y)
        print(f"{name}: in {np.asarray(x).shape} -> out {y.shape} "
              f"[{y.min():.4f}, {y.max():.4f}]")


if __name__ == "__main__":
    main()
