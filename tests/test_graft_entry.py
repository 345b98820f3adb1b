"""Guard tests for the driver entry points (__graft_entry__) so API
changes in the trainer/task surface are caught by the suite."""
import jax
import jax.numpy as jnp
import pytest


def test_entry_compiles_small(monkeypatch):
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    obs, reward, value = out
    assert obs.shape[0] == reward.shape[0] == value.shape[0]
    assert bool(jnp.all(jnp.isfinite(reward)))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_dryrun_multichip_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_dryrun_multichip_without_env_forcing():
    """Driver-environment guard: dryrun_multichip must succeed in a process
    where conftest's JAX_PLATFORMS/XLA_FLAGS forcing is ABSENT (a 1-device
    default backend).  It must bootstrap its own virtual CPU mesh."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    # Make absolutely sure the child cannot contend for real TPU hardware
    # from inside the test suite (the nested dryrun child forces cpu anyway).
    env["JAX_PLATFORMS"] = ""

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(4)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK on 4 devices" in proc.stdout
