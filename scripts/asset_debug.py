#!/usr/bin/env python3
"""Asset/scene debug tool (reference: airgym/scripts/asset_debug.py +
asset_display.py — visual inspection of loaded assets; here: print the
registry, sample a scene, and save a rendered depth image)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from airgym_tpu import assets
from airgym_tpu.assets.manager import AssetConfig, AssetManager
from airgym_tpu.render import depth as dr


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trees", type=int, default=12)
    p.add_argument("--out", default="asset_debug_depth.png")
    args = p.parse_args()

    print("registered assets:")
    for name in assets.registry.names():
        spec = assets.registry.get_asset(name)
        print(f"  {name:18s} type={spec.asset_type:8s} "
              f"geom={spec.geometry:14s} semantic={spec.semantic_id}")

    tbl = assets.thin_tree_table()
    print(f"\nthin-tree table: {tbl.shape[0]} variants, radius "
          f"{tbl[:, 0].min():.3f}..{tbl[:, 0].max():.3f} m, length "
          f"{tbl[:, 1].min():.2f}..{tbl[:, 1].max():.2f} m")

    cfg = AssetConfig.from_dicts(
        include_single_asset={"balls/ball": {"num_assets": 1}},
        include_group_asset={"thin": {"num_assets": args.trees}},
        placement_x=6.0, placement_y=3.0)
    mgr = AssetManager(cfg, num_envs=1)
    scene, states = mgr.sample_scene(jax.random.PRNGKey(0))
    print(f"\nsampled scene: {mgr.get_env_actor_count()} actors, "
          f"asset states {states.shape}")

    root = jnp.zeros((1, 13)).at[:, 6].set(1.0).at[:, 2].set(1.5)
    root = root.at[:, 0].set(-6.0)
    cam = dr.CameraCfg()
    depth = np.array(dr.render_depth_auto(cam, root, scene))[0]
    depth = np.clip(depth, 0, cam.depth_clamp) / cam.depth_clamp
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(6, 4))
        plt.imshow(depth.T, cmap="plasma", origin="upper")
        plt.colorbar(label="normalized depth")
        plt.title("asset_debug: depth render")
        plt.savefig(args.out, dpi=100, bbox_inches="tight")
        print(f"depth image saved to {args.out}")
    except ImportError:
        np.save(args.out.replace(".png", ".npy"), depth)
        print("matplotlib unavailable; saved .npy instead")


if __name__ == "__main__":
    main()
