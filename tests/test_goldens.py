"""Golden regression fixtures: replay tests/goldens/*.npz (PARITY.md).

Each fixture pins a model's fp32 forward output at its twin-verified
state. Any silent numeric drift — a kernel rewrite, a port change, an
op-semantics regression — fails here without torch installed.
Regenerate deliberately with scripts/gen_goldens.py after re-verifying
against the torch twins.
"""

from pathlib import Path

import numpy as np
import pytest

GOLDENS = Path(__file__).parent / "goldens"

_TOL = {
    # accumulation-order differences across XLA versions stay well
    # under these; real bugs (wrong op, wrong index) blow far past
    "default": 2e-4,
    "ddcolor_small": 5e-4,   # correlation volume amplifies
    "hat_tiny": 5e-4,
    # 12 GRU iterations of correlation-pyramid reductions: CPU thread
    # partitioning makes accumulation order load-dependent (~5e-3
    # drift observed between identical runs); flow magnitude ~8 px
    "raft_tiny": 2e-2,
}


def _cases():
    if not GOLDENS.exists():
        return []
    return sorted(p.stem for p in GOLDENS.glob("*.npz"))


@pytest.mark.slow
@pytest.mark.parametrize("name", _cases())
def test_golden(name):
    import jax
    import jax.numpy as jnp

    from framewright_tpu.models import (  # noqa: F401
        codeformer,
        ddcolor,
        gfpgan,
        hat,
        ifnet,
        lama,
        nafnet,
        raft,
        restormer,
        retinaface,
        rrdb,
        srvgg,
        tvsr,
        vsr,
    )

    with np.load(GOLDENS / f"{name}.npz") as z:
        x = z["x"]
        want = z["y"]

    if name == "rrdb_x2_2b":
        cfg = rrdb.RRDBConfig(num_block=2, scale=2)
        p = rrdb.stack_body(rrdb.init(jax.random.PRNGKey(0), cfg))
        got = rrdb.apply(p, jnp.asarray(x), cfg)
    elif name == "srvgg_4c":
        cfg = srvgg.SRVGGConfig(num_conv=4, scale=4)
        p = srvgg.init(jax.random.PRNGKey(1), cfg)
        got = srvgg.apply(p, jnp.asarray(x), cfg)
    elif name == "hat_tiny":
        cfg = hat.HATConfig(embed_dim=48, depths=(2,), num_heads=4,
                            window=8, scale=4)
        p = hat.init(jax.random.PRNGKey(2), cfg)
        got = hat.apply(p, jnp.asarray(x), cfg)
    elif name == "tvsr_tiny":
        cfg = tvsr.TVSRConfig(dim=32, depth=2, window=8, scale=4)
        p = tvsr.init(jax.random.PRNGKey(3), cfg)
        got = tvsr.apply(p, jnp.asarray(x), cfg)
    elif name == "ddcolor_small":
        cfg = ddcolor.DDColorConfig()
        p = ddcolor.init(jax.random.PRNGKey(4), cfg)
        got = ddcolor.apply(p, jnp.asarray(x), cfg)
    elif name == "nafnet_tiny":
        cfg = nafnet.NAFNetConfig(width=8, enc_blocks=(1, 1),
                                  middle_blocks=1, dec_blocks=(1, 1))
        p = nafnet.init(jax.random.PRNGKey(5), cfg)
        got = nafnet.apply(p, jnp.asarray(x), cfg)
    elif name == "restormer_tiny":
        cfg = restormer.RestormerConfig(dim=8, num_blocks=(1, 1, 1, 1),
                                        heads=(1, 1, 2, 2),
                                        num_refinement=1)
        p = restormer.init(jax.random.PRNGKey(6), cfg)
        got = restormer.apply(p, jnp.asarray(x), cfg)
    elif name == "ifnet":
        cfg = ifnet.IFNetConfig()
        p = ifnet.init(jax.random.PRNGKey(7), cfg)
        got = ifnet.apply(p, jnp.asarray(x[0]), jnp.asarray(x[1]), 0.5, cfg)
        if isinstance(got, (tuple, list)):
            got = got[0]
    elif name == "gfpgan_tiny":
        cfg = gfpgan.GFPGANConfig(out_size=64, num_style_feat=64,
                                  channel_multiplier=1, num_mlp=2,
                                  narrow=0.25)
        p = gfpgan.init(jax.random.PRNGKey(8), cfg)
        got = gfpgan.apply(p, jnp.asarray(x), cfg)
        if isinstance(got, (tuple, list)):
            got = got[0]
    elif name == "codeformer_tiny":
        cfg = codeformer.CodeFormerConfig(
            img_size=64, nf=8, ch_mult=(1, 2, 4), res_blocks=1,
            attn_resolution=16, emb_dim=16, codebook_size=32, dim_embd=32,
            n_head=4, n_layers=2, connect=(32,))
        p = codeformer.init(jax.random.PRNGKey(9), cfg)
        got = codeformer.apply(p, jnp.asarray(x), cfg)
    elif name == "raft_tiny":
        cfg = raft.RAFTConfig(iters=4)
        p = raft.init(jax.random.PRNGKey(10), cfg)
        got = raft.apply(p, jnp.asarray(x[0]), jnp.asarray(x[1]), cfg)
    elif name == "basicvsr_tiny":
        cfg = vsr.BasicVSRConfig(mid_channels=8, num_blocks=2,
                                 spynet_levels=3)
        p = vsr.init(jax.random.PRNGKey(11), cfg)
        got = vsr.apply(p, jnp.asarray(x), cfg)
    elif name == "retinaface_tiny":
        cfg = retinaface.RetinaFaceConfig()
        p = retinaface.init(jax.random.PRNGKey(12), cfg)
        got = retinaface.apply(p, jnp.asarray(x), cfg)[0]  # scores head
    elif name == "lama_tiny":
        cfg = lama.LamaConfig(ngf=8, n_down=2, n_blocks=2)
        p = lama.init(jax.random.PRNGKey(13), cfg)
        got = lama.apply(p, jnp.asarray(x[..., :3]),
                         jnp.asarray(x[..., 3:]), cfg)
    else:
        pytest.fail(f"no replay recipe for fixture {name!r}")
    got = np.asarray(got, np.float32)
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    tol = _TOL.get(name, _TOL["default"])
    assert err < tol, f"{name}: max abs drift {err:.2e} (tol {tol})"
    if name == "raft_tiny":
        # the loose max-abs above absorbs sparse thread-order outliers;
        # a real numeric bug shifts the WHOLE field — bound the mean
        mean_err = np.abs(got - want).mean()
        assert mean_err < 1e-3, f"raft_tiny: mean drift {mean_err:.2e}"
