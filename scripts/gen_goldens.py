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
