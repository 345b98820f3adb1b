"""Chip-contention probe for TPU-gated subprocess tests (ADVICE r4 #1).

When a TPU parity child times out, the cause is EITHER another process
owning the single tunneled chip (environment — the test should skip) OR a
genuine kernel hang/deadlock (a real failure that must not present as a
skip). Disambiguate by running a trivial device op in a fresh child: if
even `sum(ones(8,8))` stalls, the chip is owned elsewhere; if it
completes promptly, the chip is free and the original hang is real.
"""
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
