"""Chip-contention probe for TPU-gated subprocess tests (ADVICE r4 #1).

When a TPU parity child times out, the cause is EITHER another process
owning the single tunneled chip (environment — the test should skip) OR a
genuine kernel hang/deadlock (a real failure that must not present as a
skip). Disambiguate by running a trivial device op in a fresh child: if
even `sum(ones(8,8))` stalls, the chip is owned elsewhere; if it
completes promptly, the chip is free and the original hang is real.
"""
import os
import subprocess
import sys

PROBE_CODE = (
    "import jax, jax.numpy as jnp\n"
    "print('PROBE', float(jnp.sum(jnp.ones((8, 8)))))\n"
)


def chip_contended(env, cwd, timeout: float = 180.0) -> bool:
    """True iff a trivial device op ALSO stalls or cannot init the
    backend (=> contention / environment, caller skips); False when the
    probe completes (=> chip free, the caller's hang is a real failure).
    """
    try:
        p = subprocess.run([sys.executable, "-c", PROBE_CODE], env=env,
                           cwd=cwd, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        return True
    # a crashing probe (tunnel/plugin init failure) is an environment
    # problem, not evidence about the kernel under test
    return p.returncode != 0 or "PROBE" not in p.stdout


def run_tpu_child(code: str, token: str, timeout: float = 1500.0):
    """Run a TPU-gated parity child WITHOUT conftest's CPU forcing.

    Shared harness for the on-chip parity family (scripts/preflight_tpu
    PARITY_TESTS): skips when the host has no TPU backend, skips on
    timeout ONLY after proving chip contention with a trivial-op probe
    (a kernel hang with a free chip fails loudly), asserts the child
    printed ``token``. The child must print NO_TPU and exit 0 when
    jax.default_backend() != 'tpu'.
    """
    import pytest

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              cwd=repo, capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        if chip_contended(env, repo):
            pytest.skip(f"TPU busy: parity child starved past {timeout}s "
                        "and a trivial-op probe also stalled (counted "
                        "coverage: bench.py onchip_parity)")
        pytest.fail("parity child timed out while a trivial-op probe ran "
                    "fine — kernel hang, not chip contention")
    if "NO_TPU" in proc.stdout:
        pytest.skip("no TPU backend on this host")
    assert proc.returncode == 0, (proc.stdout[-2000:]
                                  + proc.stderr[-3000:])
    assert token in proc.stdout, proc.stdout
    return proc


TPU_GATE = (
    "import jax, jax.numpy as jnp, numpy as np\n"
    "try:\n"
    "    ok = jax.default_backend() == 'tpu'\n"
    "except Exception:\n"       # tunneled plugin init crash = environment
    "    ok = False\n"
    "if not ok:\n"
    "    print('NO_TPU'); raise SystemExit(0)\n"
)
