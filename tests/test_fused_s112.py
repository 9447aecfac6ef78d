"""Cross-S numerics: the production block size (S=112) must match the
plain XLA body exactly, same as the S=64 test tier (the kernel is
S-parametric; this guards the production geometry). Runs in a
subprocess so the module constant can differ from the test tier's."""

import json
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_s112_body_matches_reference():
    code = r"""
import os
os.environ["FW_RDB_S"] = "112"
os.environ["JAX_PLATFORMS"] = "cpu"
import json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from framewright_tpu.models import rrdb
from framewright_tpu.ops import fused_rrdb
assert fused_rrdb.S == 112
cfg = rrdb.RRDBConfig(num_block=1, scale=4)
params = rrdb.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
fast = rrdb.make_fast_params(params)
rng = np.random.default_rng(0)
feat = jnp.asarray(rng.standard_normal((1, 40, 48, 64)).astype(np.float32) * 0.5).astype(jnp.bfloat16)
got = np.asarray(fused_rrdb.rrdb_body_fast(feat, fast, interpret=True), np.float32)
stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params["body"])
def block(h, bp):
    return rrdb._rrdb_forward(jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), bp), h), None
ref, _ = jax.lax.scan(block, feat, stacked)
ref = np.asarray(ref, np.float32)
err = float(np.abs(got - ref).max())
print(json.dumps({"max_err": err}))
assert err < 0.02, err
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["max_err"] < 0.02
