"""Loopback tests for the runtime action/state stream — the rospy-bridge
analogue (reference hovering.py:149-156,362-366; VERDICT r4 next #9)."""
import json
import socket
import time

import jax
import jax.numpy as jnp
import numpy as np

import airgym_tpu.envs as envs
from airgym_tpu.rl import ppo as ppo_mod
from airgym_tpu.utils.action_stream import (ActionStreamServer,
                                            make_retargetable_step,
                                            run_bridged_play)


def _recv_lines(sock, want, timeout=10.0):
    sock.settimeout(timeout)
    buf = b""
    lines = []
    t0 = time.monotonic()
    while len(lines) < want and time.monotonic() - t0 < timeout:
        try:
            data = sock.recv(65536)
        except socket.timeout:
            break
        if not data:
            break
        buf += data
        while b"\n" in buf:
            line, buf = buf.split(b"\n", 1)
            if line.strip():
                lines.append(json.loads(line))
    return lines


def test_bridged_play_publishes_and_retargets():
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=4,
                          obs_noise=False)
    tr = ppo_mod.PPO(task, ppo_mod.PPOConfig(horizon=4, minibatch_size=8))
    ts = tr.init(jax.random.PRNGKey(0))

    server = ActionStreamServer()
    client = socket.create_connection(server.address)
    try:
        # phase 1: stream a few steps, collect published messages
        state, out = run_bridged_play(task, tr.model, ts, server, steps=5,
                                      seed=3)
        msgs = _recv_lines(client, want=5)
        assert len(msgs) == 5
        assert [m["step"] for m in msgs] == list(range(5))
        assert all(len(m["action"]) == task.cfg.num_actions for m in msgs)
        assert all(len(m["root_state"]) == 13 for m in msgs)
        assert all(np.isfinite(m["root_state"]).all() for m in msgs)

        # phase 2: inject a target override, then step again — the env-0
        # obs must become relative to the NEW target (the reference
        # callback repeats the incoming target over all envs)
        # stay inside the survival envelope (dist > 4 m kills,
        # hovering.py die rules) so no env resets during the check
        new_target = [1., 0., 0., 0., 1., 0., 0., 0., 1.,
                      1., -0.5, 0.5, 0., 0., 0., 0., 0., 0.]
        client.sendall((json.dumps({"target_state": new_target})
                        + "\n").encode())
        time.sleep(0.2)
        state, out = run_bridged_play(task, tr.model, ts, server, steps=3,
                                      seed=3)
        # the obs is state_obs18 - target (obs_noise off): its position
        # block must now be relative to the OVERRIDDEN target position
        # (obs uses the pre-reset root, so only check non-reset envs)
        alive = ~np.asarray(out.reset)
        assert alive.any()
        pos = np.asarray(state.core.root[:, 0:3])[alive]
        np.testing.assert_allclose(np.asarray(out.obs[:, 9:12])[alive],
                                   pos - np.asarray([1.0, -0.5, 0.5]),
                                   atol=1e-5)
    finally:
        client.close()
        server.close()


def test_retargetable_step_restores_task_attrs():
    task = envs.make_task("hovering", ctl_mode="rate", num_envs=2,
                          obs_noise=False)
    before = task.target
    step_fn = make_retargetable_step(task)
    st = task.initial_state(jax.random.PRNGKey(0))
    tgt = jnp.zeros_like(task.target).at[:, 0].set(1.0) \
        .at[:, 4].set(1.0).at[:, 8].set(1.0).at[:, 11].set(7.0)
    step_fn(st, jnp.zeros((2, 4)), tgt)
    assert task.target is before          # trace-time swap restored


def test_server_survives_client_disconnect():
    server = ActionStreamServer()
    c = socket.create_connection(server.address)
    server.publish({"step": 0})
    c.close()
    for i in range(1, 4):
        server.publish({"step": i})       # must not raise
    assert server.poll() == []
    server.close()
