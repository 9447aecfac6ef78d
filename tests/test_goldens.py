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
        ddcolor, hat, ifnet, nafnet, restormer, rrdb, srvgg, tvsr,
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
    else:
        pytest.fail(f"no replay recipe for fixture {name!r}")
    got = np.asarray(got, np.float32)
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    tol = _TOL.get(name, _TOL["default"])
    assert err < tol, f"{name}: max abs drift {err:.2e} (tol {tol})"
