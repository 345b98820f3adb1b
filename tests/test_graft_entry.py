"""Guard tests for the driver entry points (__graft_entry__) so API
changes in the trainer/task surface are caught by the suite.

The subprocess tests replicate the DRIVER's environments, not the
conftest's: rounds 1 and 2 both shipped a green suite with a red
MULTICHIP artifact because the suite only exercised dryrun_multichip
under conftest's forced 8-device CPU backend.  The failure mode was a
guard/body backend mismatch — the guard counted ``jax.devices("cpu")``
(8, from XLA_FLAGS forcing) while the body built on ``jax.devices()``
(1 axon TPU chip).  ``test_dryrun_multichip_driver_env`` reproduces the
driver's exact env (device-count flag PRESENT + default platform NOT
forced to cpu) and fails on that bug.
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles_small(monkeypatch):
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    obs, reward, value = out
    assert obs.shape[0] == reward.shape[0] == value.shape[0]
    assert bool(jnp.all(jnp.isfinite(reward)))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_dryrun_multichip_4_inline():
    """Under conftest the default backend IS an 8-device CPU backend, so
    the inline path must be taken and succeed.  processes=0 skips the
    multi-process check (covered by test_multiproc.py and the driver-env
    test below)."""
    import __graft_entry__ as ge

    assert ge._inline_cpu_devices(4) is not None
    ge.dryrun_multichip(4, processes=0)


def _run_dryrun_subprocess(env, n=4, processes=0, timeout=900):
    code = (f"import __graft_entry__ as ge; "
            f"ge.dryrun_multichip({n}, processes={processes})")
    return subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


def test_dryrun_multichip_driver_env():
    """THE driver environment: XLA_FLAGS carries
    --xla_force_host_platform_device_count=8 and the default platform is
    NOT forced to cpu (whatever plugin the host registers — here the
    axon TPU — is the default backend).  A CPU backend with 8 devices
    exists but is not default; dryrun_multichip must not run the body on
    the default backend just because the CPU backend looks big enough.

    This is exactly MULTICHIP_r01/r02's rc=1 configuration; it also
    exercises the multi-process jax.distributed line the driver sees.
    """
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)

    proc = _run_dryrun_subprocess(env, n=8, processes=2)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK on 8 devices" in proc.stdout, proc.stdout
    assert ("dryrun_multichip planning (vision, frame-dedup) OK on 8 "
            "devices") in proc.stdout, proc.stdout
    assert "dryrun_multiproc OK on 2 processes" in proc.stdout, proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_without_env_forcing():
    """Driver-environment variant: no device-count flag at all (a 1-device
    default backend).  dryrun_multichip must bootstrap its own virtual
    CPU mesh in a subprocess."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    # Make absolutely sure the child cannot contend for real TPU hardware
    # from inside the test suite (the nested dryrun child forces cpu anyway).
    env["JAX_PLATFORMS"] = ""

    proc = _run_dryrun_subprocess(env, n=4, processes=0)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK on 4 devices" in proc.stdout
