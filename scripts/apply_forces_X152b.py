#!/usr/bin/env python3
"""Physics probe (reference: airgym/scripts/apply_forces_X152b.py — raw
force/torque API demo on one env): applies hand-picked rotor commands to
the bare dynamics core and prints the state evolution, bypassing tasks
and controller."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu.math import rotations as rot
from airgym_tpu.physics import quadrotor as qd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--mode", default="hover",
                   choices=["hover", "climb", "roll", "yaw"])
    args = p.parse_args()

    params = qd.x152b_params()
    hover = qd.hover_command(params)
    cmds = {
        "hover": [hover] * 4,
        "climb": [hover * 1.3] * 4,
        "roll": [hover * 0.9, hover * 1.1, hover * 1.1, hover * 0.9],
        "yaw": [hover * 1.05, hover * 1.05, hover * 0.95, hover * 0.95],
    }[args.mode]
    cmd = jnp.array([cmds])

    s = jnp.zeros((1, 13)).at[:, 6].set(1.0)
    step = jax.jit(lambda s: qd.step(params, s, cmd))
    print(f"mode={args.mode} rotor cmds={np.round(np.asarray(cmd[0]), 4)} "
          f"(hover={hover:.4f})")
    for i in range(args.steps):
        s = step(s)
        if i % max(1, args.steps // 10) == 0:
            e = np.degrees(np.asarray(rot.quat_to_euler_xyz(s[:, 3:7])[0]))
            print(f"t={i * params.dt:5.2f}s pos={np.round(np.asarray(s[0, :3]), 3)} "
                  f"euler_deg={np.round(e, 1)} "
                  f"w={np.round(np.asarray(s[0, 10:13]), 2)}")


if __name__ == "__main__":
    main()
