#!/usr/bin/env python3
"""Visual inspection of a single asset variant (reference:
airgym/scripts/asset_display.py — loads one URDF into the IsaacGym
viewer). Headless TPU analogue: place one variant of a family at the
origin and render a contact sheet of depth views from orbiting cameras.

    python scripts/asset_display.py --family cubes --variant 5 \
        --out cube5.png
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv:
    # force the CPU backend before jax initializes (the env var alone
    # does not displace an installed TPU plugin)
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu import assets
from airgym_tpu.math import rotations as rot
from airgym_tpu.physics import scene as sc
from airgym_tpu.render import depth as dr


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="cubes",
                   help="asset family (thin/vtrees/trees/cubes/flags/"
                        "objects/balls)")
    p.add_argument("--variant", type=int, default=0)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--dist", type=float, default=4.0)
    p.add_argument("--height", type=float, default=1.2)
    p.add_argument("--out", default="asset_display.png")
    p.add_argument("--cpu", action="store_true",
                   help="render on the CPU backend (handled pre-init)")
    args = p.parse_args()

    nv = assets.num_variants(args.family)
    if not 0 <= args.variant < nv:
        raise SystemExit(f"{args.family} has {nv} variants")

    v = args.views
    idx = jnp.full((v, 1), args.variant, jnp.int32)
    placed = assets.place_group(args.family, idx, jnp.zeros((v, 1, 2)),
                                jnp.zeros((v, 1)))
    scene = dr.SceneForRender(cylinders=placed.cylinders,
                              spheres=placed.spheres, boxes=placed.boxes,
                              annuli=placed.annuli, ground=True)

    # orbit: camera at angle 2*pi*k/v, looking at the origin
    ang = jnp.arange(v) * (2 * np.pi / v)
    pos = jnp.stack([-args.dist * jnp.cos(ang),
                     -args.dist * jnp.sin(ang),
                     jnp.full((v,), args.height)], axis=-1)
    euler = jnp.stack([jnp.zeros(v), jnp.zeros(v), ang], axis=-1)
    quat = rot.quat_from_euler_xyz(euler)          # yaw toward origin
    root = jnp.zeros((v, 13)).at[:, 0:3].set(pos).at[:, 3:7].set(quat)

    cam = dr.CameraCfg()
    depth = dr.render_depth(cam, root, scene)      # [v, W, H]
    depth = jnp.minimum(depth, cam.far_plane)
    sheet = np.concatenate(
        [np.asarray(depth[k]).T for k in range(v)], axis=1)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.figure(figsize=(3 * v, 3))
    plt.imshow(sheet, cmap="viridis", origin="upper")
    plt.axis("off")
    plt.title(f"{args.family}[{args.variant}] — {v} orbit views "
              f"(depth, far {cam.far_plane} m)")
    plt.tight_layout()
    plt.savefig(args.out, dpi=110)
    print(f"{args.family} variant {args.variant}: "
          f"depth range {float(depth.min()):.2f}..{float(depth.max()):.2f}, "
          f"sheet saved to {args.out}")


if __name__ == "__main__":
    main()
