"""Driver-faithful tests for __graft_entry__.

The round-1/2 failures happened because the driver imports
__graft_entry__ in a process with NO CPU-forcing env and calls
``dryrun_multichip(8)`` directly; any jax initialization in that parent
grabs the (version-skewed) TPU plugin.  These tests reproduce the
driver's exact call pattern: a fresh subprocess, env NOT prepared.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """An env like the driver's: no JAX_PLATFORMS, no device-count flag,
    no sentinel."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "_FW_DRYRUN_CPU", "FW_RDB_S")
    }
    return env


@pytest.mark.slow
def test_dryrun_multichip_like_driver():
    code = "import __graft_entry__ as g; g.dryrun_multichip(8); print('OUTER_OK')"
    result = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "OUTER_OK" in result.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_entry_touched_jax():
    """Even if entry() (or anything else) initialized jax first in the
    parent, the dryrun must still pass — it never uses the parent's
    jax."""
    code = (
        # config-level CPU force: the axon plugin ignores the
        # JAX_PLATFORMS env var, and with a wedged dev tunnel an
        # env-only parent hangs in backend init (PERF.md ops note) —
        # which is a tunnel artifact, not the property under test
        # (parent jax state must not leak into the dryrun child)
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "jax.devices()\n"              # parent jax initialized, 1 device
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('OUTER_OK')\n"
    )
    result = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "OUTER_OK" in result.stdout


def test_parent_never_imports_jax(monkeypatch):
    """The parent-side path of dryrun_multichip must not import jax at
    all (importing it is what binds the broken TPU plugin)."""
    import __graft_entry__ as g

    monkeypatch.delenv("_FW_DRYRUN_CPU", raising=False)
    calls = {}

    def fake_run(cmd, **kw):
        calls["env"] = kw["env"]
        calls["cmd"] = cmd

        class R:
            returncode = 0
            stdout = "DRYRUN_MULTICHIP_OK\n"
            stderr = ""

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    g.dryrun_multichip(8)
    env = calls["env"]
    assert env["_FW_DRYRUN_CPU"] == "1"
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    # stale device-count flags must have been dropped, ours kept
    assert env["XLA_FLAGS"].count("xla_force_host_platform_device_count") == 1
