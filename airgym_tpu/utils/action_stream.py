"""Host-side runtime action/state stream — the TPU-native analogue of the
reference's optional rospy bridge (reference hovering.py:149-156: publish
``/action`` per step, subscribe ``/target_state`` to re-target the task
mid-rollout; :362-366 builds the env-0 action message each reward pass).

A TPU host has no ROS, so the transport is a plain localhost TCP socket
with newline-delimited JSON — anything (a ROS relay node, AirGym-Real's
onboard stack, netcat) can consume it. Everything here runs OUTSIDE jit
at control rate, exactly like the reference's hooks run outside the GPU
step; the jitted compute path is untouched.

Protocol (one JSON object per line, either direction):
  out: {"step": int, "action": [4], "root_state": [13]}   (env 0)
  in:  {"target_state": [18]}   -> re-targets ALL envs (the reference
        callback repeats the incoming target over num_envs,
        hovering.py:154-156)
"""
from __future__ import annotations

import json
import socket
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ActionStreamServer:
    """Non-blocking localhost pub/sub endpoint. ``port=0`` picks an
    ephemeral port (read it back from ``.address``)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.create_server((host, port))
        self._srv.setblocking(False)
        self.address = self._srv.getsockname()
        self._clients: List[socket.socket] = []
        self._rxbuf: Dict[socket.socket, bytes] = {}

    def _accept(self) -> None:
        while True:
            try:
                c, _ = self._srv.accept()
            except BlockingIOError:
                return
            c.setblocking(False)
            self._clients.append(c)
            self._rxbuf[c] = b""

    def _drop(self, c: socket.socket) -> None:
        self._clients.remove(c)
        self._rxbuf.pop(c, None)
        try:
            c.close()
        except OSError:
            pass

    def publish(self, msg: Dict[str, Any]) -> None:
        """Best-effort broadcast; a slow/dead client is dropped rather
        than stalling the control loop (the reference's rospy publisher
        queue drops too, queue_size=10)."""
        self._accept()
        line = (json.dumps(msg) + "\n").encode()
        for c in list(self._clients):
            try:
                c.sendall(line)
            except (BlockingIOError, InterruptedError):
                pass                      # transient backpressure: skip
            except OSError:
                self._drop(c)

    def poll(self) -> List[Dict[str, Any]]:
        """Drain complete JSON lines received from any client."""
        self._accept()
        out: List[Dict[str, Any]] = []
        for c in list(self._clients):
            try:
                data = c.recv(65536)
            except (BlockingIOError, InterruptedError):
                continue
            except OSError:
                self._drop(c)
                continue
            if not data:                  # orderly shutdown
                self._drop(c)
                continue
            self._rxbuf[c] += data
            while b"\n" in self._rxbuf[c]:
                line, self._rxbuf[c] = self._rxbuf[c].split(b"\n", 1)
                if line.strip():
                    try:
                        out.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass              # garbage line: ignore
        return out

    def close(self) -> None:
        for c in list(self._clients):
            self._drop(c)
        self._srv.close()


def make_retargetable_step(task):
    """Jitted (policy-less) step with the TARGET as a runtime input.

    Hovering bakes ``task.target`` into the jitted step as a constant;
    the bridge needs to change it between steps without recompiling, so
    this traces ``task.step`` with the attribute temporarily pointing at
    a traced argument. One compile, target swaps are free.
    """
    from airgym_tpu.math import rotations as rot

    def step_fn(state, actions, target):
        old = (task.target, task.target_pos, task.target_yaw)
        try:
            task.target = target
            task.target_pos = target[:, 9:12]
            tmat = target[:, 0:9].reshape(-1, 3, 3)
            task.target_yaw = rot.matrix_to_euler_xyz(tmat)[..., 2]
            return task.step(state, actions)
        finally:
            task.target, task.target_pos, task.target_yaw = old

    return jax.jit(step_fn)


def run_bridged_play(task, model, ts, server: ActionStreamServer,
                     steps: int, seed: int = 0, env_index: int = 0,
                     realtime_hz: Optional[float] = None):
    """Deterministic play loop with the stream attached: one device step
    per control tick, env-``env_index`` action/state published after each
    step, pending ``target_state`` messages applied before the next.

    ``realtime_hz`` paces the loop (e.g. 100.0 to match the reference's
    dt=0.01 control rate); None runs as fast as the host roundtrip
    allows. Returns the last (state, out) pair.
    """
    n = task.cfg.num_envs
    step_fn = make_retargetable_step(task)

    @jax.jit
    def policy(obs):
        mu, _, _ = model.apply(ts.params, obs, ts.obs_rms)
        return jnp.clip(mu, -1.0, 1.0)

    @jax.jit
    def boot(k):
        st = task.initial_state(k)
        return task.step(st, jnp.zeros((n, task.cfg.num_actions)))

    state, out = boot(jax.random.PRNGKey(seed))
    target = task.target
    t_next = time.monotonic()
    for t in range(steps):
        action = policy(out.obs)
        state, out = step_fn(state, action, target)
        a0 = np.asarray(action[env_index], np.float64)
        root0 = np.asarray(state.core.root[env_index], np.float64)
        server.publish({"step": t, "action": a0.tolist(),
                        "root_state": root0.tolist()})
        for msg in server.poll():
            if "target_state" in msg:
                tgt = np.asarray(msg["target_state"], np.float32)
                if tgt.shape != (task.target.shape[1],):
                    continue              # malformed: ignore, keep flying
                target = jnp.broadcast_to(
                    jnp.asarray(tgt), task.target.shape)
        if realtime_hz:
            t_next += 1.0 / realtime_hz
            delay = t_next - time.monotonic()
            if delay > 0:
                time.sleep(delay)
    return state, out
