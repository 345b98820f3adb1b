"""Multi-process (multi-host/DCN) validation: a real 2-process
jax.distributed job over CPU, running one sharded PPO train epoch.

This is the test the reference never had for its NCCL DDP path
(a2c_base.py:109-316 was guarded only by env vars and needed a cluster);
here the coordinator/worker wiring, the global mesh over processes, the
SPMD gradient reduction, and the rank-0 gating are all exercised without
hardware.
"""
import os
import re
import socket

import pytest
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_epoch():
    """slow: spawns two fresh jax.distributed processes (~60 s). The
    fast tier keeps this surface covered via test_graft_entry, whose
    driver-env dryrun runs the same 2-process check."""
    port = _free_port()
    env = dict(os.environ)
    # children force their own backend config; strip the suite's forcing
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))

    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
        assert "MULTIPROC OK" in out, out

    # rank-0 gate fired exactly once across the job
    rank0 = sum(o.count("RANK0_ONLY") for _, o, _ in outs)
    assert rank0 == 1, outs

    # both processes observed the SAME replicated metrics (the SPMD
    # all-reduce produced one consistent global result)
    kls = [re.search(r"kl=([0-9.eE+-]+)", o).group(1) for _, o, _ in outs]
    rews = [re.search(r"reward=([0-9.eE+-]+)", o).group(1)
            for _, o, _ in outs]
    assert kls[0] == kls[1], kls
    assert rews[0] == rews[1], rews
