"""Offline asset-geometry extraction: reference URDF/DAE -> .npy tables.

Reads the reference asset families (read-only) and distills each variant
into analytic primitives the TPU physics/renderer consumes
(airgym_tpu/physics/scene.py). Counterpart of the reference's
IsaacGym URDF loading (airgym/assets/asset_manager.py load_asset /
create_asset); run offline, outputs are committed like thin_trees.npy.

Outputs (written into airgym_tpu/assets/):
  * vtrees.npy   [100, 13, 8]  exact oblique cylinders per variant:
                 (cx, cy, cz, ax, ay, az, radius, half_len) in the asset
                 frame — parsed from env_assets/vtrees/tree_*.urdf
                 (branch_0's visual origin; every other branch placed by
                 its fixed-joint origin, visual origin identity).
  * cubes.npy    [8, MAXB, 7]  exact boxes per cube variant:
                 (cx, cy, cz, hx, hy, hz, valid) — connected-component
                 decomposition of the blocky DAE meshes
                 (env_assets/cubes/*/model.urdf, rpy = 1.57 about x).
  * objects.npy  [5, 8] primitive table (kind, params) for
                 env_assets/objects/*.urdf (boxes / sphere / rod).
  * flags.npy    [4, 16, 8] ring/arch cylinders: circle flags are torus
                 meshes (fit center/R/r from the DAE vertex cloud, ring
                 discretized as 16 tangent cylinders); arch1_6m as
                 component-fit boxes stored in arch_boxes.npy.
  * tree_mesh.npy dict-free packed file, see extract_tree(): bark skeleton
                 cylinders + leaf-cluster spheres fit to the real
                 trees/tree/tree.dae mesh, with printed fit residuals.

All parsing is stdlib (re/xml) + numpy. Angles in URDF rpy are extrinsic
XYZ: R = Rz(yaw) @ Ry(pitch) @ Rx(roll).
"""
from __future__ import annotations

import os
import re
import sys
import xml.etree.ElementTree as ET

import numpy as np

REF = "/root/reference/airgym/assets/env_assets"
OUT = os.path.join(os.path.dirname(__file__), "..", "airgym_tpu", "assets")


def rpy_matrix(r, p, y):
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def parse_floats(s):
    return np.array([float(x) for x in s.replace(",", " ").split()])


# ---------------------------------------------------------------- vtrees


def extract_vtrees():
    rows = []
    for i in range(100):
        tree = ET.parse(f"{REF}/vtrees/tree_{i}.urdf").getroot()
        # collision cylinder per link, placed by (root: its own collision
        # origin) or (child: the fixed joint whose <child link= > matches)
        joint_origin = {}
        for j in tree.findall("joint"):
            child = j.find("child").get("link")
            o = j.find("origin")
            joint_origin[child] = (parse_floats(o.get("xyz")),
                                   parse_floats(o.get("rpy")))
        cyls = []
        for link in tree.findall("link"):
            name = link.get("name")
            col = link.find("collision")
            geo = col.find("geometry/cylinder")
            radius = float(geo.get("radius"))
            length = float(geo.get("length"))
            if name in joint_origin:
                xyz, rpy = joint_origin[name]
                # child visual/collision origins are identity in every file
                co = col.find("origin")
                assert np.allclose(parse_floats(co.get("xyz")), 0.0), name
            else:
                co = col.find("origin")
                xyz = parse_floats(co.get("xyz"))
                rpy = parse_floats(co.get("rpy"))
            axis = rpy_matrix(*rpy) @ np.array([0.0, 0.0, 1.0])
            cyls.append(np.concatenate(
                [xyz, axis, [radius, length / 2.0]]))
        rows.append(np.stack(cyls))
    arr = np.stack(rows).astype(np.float32)         # [100, B, 8]
    np.save(os.path.join(OUT, "vtrees.npy"), arr)
    print(f"vtrees.npy {arr.shape}")
    return arr


# ------------------------------------------------------------------- DAE


def parse_dae(path):
    """-> (positions [V,3] in DAE world frame, list of
    (material, tri_vertex_idx [T,3])).

    Applies the visual-scene node <matrix> transforms (Blender exports
    carry scale/rotation/translation there — e.g. the circle flags have a
    1.144 scale + x-rotation + z-offset node matrix). Assumes each
    geometry is instanced once (true for every reference asset)."""
    txt = open(path, encoding="utf-8").read()
    m = re.search(
        r'<float_array id="[^"]*positions-array" count="\d+">([^<]*)<', txt)
    pos = np.fromstring(m.group(1), sep=" ").reshape(-1, 3)

    # geometry id -> composed node matrix from the visual scene
    geo_id = re.search(r'<geometry id="([^"]*)"', txt).group(1)
    M = np.eye(4)
    scene = re.search(r"<library_visual_scenes>(.*?)</library_visual_scenes>",
                      txt, re.S)
    if scene:
        # compose every <matrix> seen in nodes that (transitively) contain
        # the instance_geometry; reference files are single-level
        for nm in re.finditer(
                r'<node[^>]*>\s*<matrix sid="transform">([^<]*)</matrix>'
                r"(.*?)</node>", scene.group(1), re.S):
            if f'url="#{geo_id}"' in nm.group(2):
                M = M @ np.fromstring(nm.group(1), sep=" ").reshape(4, 4)
    pos = pos @ M[:3, :3].T + M[:3, 3]

    tris = []
    for tm in re.finditer(
            r'<triangles(?:\s+material="([^"]*)")?\s+count="(\d+)">(.*?)'
            r"</triangles>", txt, re.S):
        mat, body = tm.group(1) or "", tm.group(3)
        ninputs = len(set(re.findall(r'offset="(\d+)"', body))) or 1
        p = re.search(r"<p>([^<]*)</p>", body).group(1)
        idx = np.fromstring(p, sep=" ", dtype=np.int64)
        tris.append((mat, idx.reshape(-1, ninputs)[:, 0].reshape(-1, 3)))
    return pos, tris


def connected_components(tri):
    """Union-find over shared vertices -> list of triangle-index arrays."""
    parent = {}

    def find(a):
        while parent.setdefault(a, a) != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        parent[find(a)] = find(b)

    for t in tri:
        union(int(t[0]), int(t[1]))
        union(int(t[0]), int(t[2]))
    groups = {}
    for k, t in enumerate(tri):
        groups.setdefault(find(int(t[0])), []).append(k)
    return [np.array(v) for v in groups.values()]


# Mesh asset frame: every DAE is authored <up_axis>Z_UP</up_axis>, the
# loader (assimp convention) converts Z-up -> its Y-up working frame, and
# the URDF's rpy="1.57 0 0" rotates it back up. Net: the DAE world frame
# (node matrices applied) IS the Z-up asset frame, to within the 0.0008 rad
# by which 1.57 falls short of pi/2 (<1.4 mm over the largest asset).


def mesh_world_verts(pos):
    return pos


# ------------------------------------------------------------------ cubes


CUBE_VARIANTS = ["1x1", "1x4", "2x2square", "2x3", "2x4", "2x4arch",
                 "3x3arch", "3x4arch"]


def point_in_mesh(pts, verts, tri):
    """Parity test: odd number of +z-ray triangle crossings -> inside.
    Blocky watertight meshes only; pts must avoid face planes."""
    v0, v1, v2 = verts[tri[:, 0]], verts[tri[:, 1]], verts[tri[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    ok = np.abs(n[:, 2]) > 1e-9                 # skip vertical faces
    inside = np.zeros(len(pts), bool)
    for i, p in enumerate(pts):
        def edge(a, b):
            return ((b[:, 0] - a[:, 0]) * (p[1] - a[:, 1])
                    - (b[:, 1] - a[:, 1]) * (p[0] - a[:, 0]))
        d0, d1, d2 = edge(v0, v1), edge(v1, v2), edge(v2, v0)
        contains = (((d0 >= 0) & (d1 >= 0) & (d2 >= 0))
                    | ((d0 <= 0) & (d1 <= 0) & (d2 <= 0)))
        zhit = v0[:, 2] - ((p[0] - v0[:, 0]) * n[:, 0]
                           + (p[1] - v0[:, 1]) * n[:, 1]) / np.where(
                               ok, n[:, 2], 1.0)
        inside[i] = int(np.sum(contains & ok & (zhit > p[2]))) % 2 == 1
    return inside


def rectilinear_decompose(verts, tri, snap=1e-3):
    """Exact box decomposition of an axis-aligned blocky mesh: cut space
    at every unique vertex coordinate, parity-test each cell center, and
    greedily merge filled cells into maximal boxes."""
    cuts = [np.unique(np.round(verts[:, k] / snap) * snap)
            for k in range(3)]
    nx, ny, nz = (len(c) - 1 for c in cuts)
    centers = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                centers.append([(cuts[0][i] + cuts[0][i + 1]) / 2 + 1e-5,
                                (cuts[1][j] + cuts[1][j + 1]) / 2 + 1e-5,
                                (cuts[2][k] + cuts[2][k + 1]) / 2])
    filled = point_in_mesh(np.array(centers), verts, tri).reshape(
        nx, ny, nz)
    boxes = []
    used = np.zeros_like(filled)
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                if not filled[i, j, k] or used[i, j, k]:
                    continue
                # greedy maximal extension x -> y -> z
                i2 = i
                while (i2 + 1 < nx and filled[i2 + 1, j, k]
                       and not used[i2 + 1, j, k]):
                    i2 += 1
                j2 = j
                while (j2 + 1 < ny
                       and filled[i:i2 + 1, j2 + 1, k].all()
                       and not used[i:i2 + 1, j2 + 1, k].any()):
                    j2 += 1
                k2 = k
                while (k2 + 1 < nz
                       and filled[i:i2 + 1, j:j2 + 1, k2 + 1].all()
                       and not used[i:i2 + 1, j:j2 + 1, k2 + 1].any()):
                    k2 += 1
                used[i:i2 + 1, j:j2 + 1, k:k2 + 1] = True
                lo = np.array([cuts[0][i], cuts[1][j], cuts[2][k]])
                hi = np.array([cuts[0][i2 + 1], cuts[1][j2 + 1],
                               cuts[2][k2 + 1]])
                boxes.append(np.concatenate([(lo + hi) / 2, (hi - lo) / 2]))
    return np.stack(boxes)


def extract_cubes():
    """Each cube variant -> exact boxes in the Z-up asset frame.

    Decomposition runs in the DAE world frame, which is the Z-up asset
    frame (see mesh_world_verts)."""
    per_variant = []
    for name in CUBE_VARIANTS:
        d = f"{REF}/cubes/{name}"
        dae = [f for f in os.listdir(d) if f.endswith(".dae")][0]
        pos, tris = parse_dae(f"{d}/{dae}")
        tri = np.concatenate([t for _, t in tris])
        boxes = rectilinear_decompose(pos, tri)
        per_variant.append(boxes)
        print(f"cubes/{name}: {len(boxes)} boxes")
    maxb = max(len(b) for b in per_variant)
    tables = []
    for b in per_variant:
        pad = np.zeros((maxb, 7), np.float32)
        pad[: len(b), :6] = b
        pad[: len(b), 6] = 1.0
        tables.append(pad)
    arr = np.stack(tables).astype(np.float32)
    np.save(os.path.join(OUT, "cubes.npy"), arr)
    print(f"cubes.npy {arr.shape} (order {CUBE_VARIANTS})")
    return arr


# ---------------------------------------------------------------- objects


def extract_objects():
    """objects/*.urdf are plain URDF primitives. Row:
    (kind 0=box 1=sphere, cx, cy, cz, p0, p1, p2, 0) where box params =
    half extents, sphere params = (radius, 0, 0)."""
    rows = []
    names = sorted(f for f in os.listdir(f"{REF}/objects")
                   if f.endswith(".urdf"))
    for f in names:
        root = ET.parse(f"{REF}/objects/{f}").getroot()
        col = root.find(".//collision")
        o = col.find("origin")
        xyz = parse_floats(o.get("xyz")) if o is not None else np.zeros(3)
        box = col.find("geometry/box")
        sph = col.find("geometry/sphere")
        if box is not None:
            size = parse_floats(box.get("size"))
            rows.append([0] + list(xyz) + list(size / 2) + [0])
        else:
            rows.append([1] + list(xyz) + [float(sph.get("radius")), 0, 0,
                                           0])
        print(f"objects/{f}: {rows[-1]}")
    arr = np.array(rows, np.float32)
    np.save(os.path.join(OUT, "objects.npy"), arr)
    print(f"objects.npy {arr.shape} order={names}")
    return arr


# ------------------------------------------------------------------ flags


FLAG_VARIANTS = ["arch1_6m", "circle1_5m", "circle2_5m", "circle2m"]


def extract_flags(arc_segments=10):
    """Flag gates -> mixed primitives per variant, Z-up asset frame.

    circle*: the mesh is a flat ring panel (annulus) floating above a
    base block — component-decomposed, the ring fit as an exact annulus
    (r_in/r_out/thickness straight from the vertex cloud), the base as
    its AABB box. arch1_6m: a thin semicircular hoop (fit radius from the
    vertex cloud, discretized as tangent cylinders + two vertical legs)
    plus the printed banner sheet (AABB box).

    Output flags.npz: annuli [V, 1, 10] (cx cy cz nx ny nz r_in r_out
    half_thick valid), boxes [V, MB, 7] (center, half_extents, valid),
    cyls [V, MC, 9] (center, axis, radius, half_len, valid)."""
    fix = np.eye(3)                     # DAE world == asset frame
    annuli = np.zeros((len(FLAG_VARIANTS), 1, 10), np.float32)
    all_boxes, all_cyls = [], []

    for vi, name in enumerate(FLAG_VARIANTS):
        d = f"{REF}/flags/{name}"
        dae = [f for f in os.listdir(d) if f.endswith(".dae")][0]
        pos, tris = parse_dae(f"{d}/{dae}")
        tri = np.concatenate([t for _, t in tris])
        comps = connected_components(tri)
        boxes, cyls = [], []

        if name.startswith("circle"):
            for comp in comps:
                vs = pos[np.unique(tri[comp].reshape(-1))]
                c = vs.mean(0)
                dd = vs - c
                w, V = np.linalg.eigh(dd.T @ dd / len(dd))
                w = np.maximum(w, 0.0)
                nrm = V[:, 0]
                h = dd @ nrm
                rho = np.linalg.norm(dd - h[:, None] * nrm, axis=1)
                # a ring panel: flat (thin along the normal), with a real
                # central hole; the base stand fails both tests
                ring_like = (np.sqrt(w[0]) < 0.2 * np.sqrt(w[2])
                             and rho.min() > 0.3 * rho.max()
                             and np.abs(h).max() < 0.2 * rho.max()
                             and annuli[vi, 0, 9] == 0.0)
                if ring_like:
                    cw = fix @ c
                    nw = fix @ nrm
                    annuli[vi, 0] = list(cw) + list(nw) + [
                        rho.min(), rho.max(), np.abs(h).max(), 1.0]
                    print(f"flags/{name}: annulus r_in={rho.min():.3f} "
                          f"r_out={rho.max():.3f} thick={np.abs(h).max():.3f}"
                          f" center_z={cw[2]:.3f}")
                else:
                    lo, hi = vs.min(0), vs.max(0)
                    cb = fix @ ((lo + hi) / 2)
                    he = np.abs(fix @ ((hi - lo) / 2))
                    boxes.append(np.concatenate([cb, he]))
        else:                                     # arch1_6m
            # thin sheet = component with the smallest y-extent
            comps_v = [pos[np.unique(tri[c].reshape(-1))] for c in comps]
            sheet = min(comps_v, key=lambda v: np.ptp(v[:, 1]))
            hoop = max(comps_v, key=lambda v: np.ptp(v[:, 1]))
            lo, hi = sheet.min(0), sheet.max(0)
            boxes.append(np.concatenate(
                [fix @ ((lo + hi) / 2), np.abs(fix @ ((hi - lo) / 2))]))
            top = hoop[hoop[:, 2] > 0.05]
            rho = np.hypot(top[:, 0], top[:, 2])
            R = rho.mean()
            r_tube = max(np.abs(rho - R).max(), np.ptp(top[:, 1]) / 2)
            th = np.linspace(0, np.pi, arc_segments + 1)
            for t0, t1 in zip(th[:-1], th[1:]):
                tc = (t0 + t1) / 2
                cen = np.array([R * np.cos(tc), 0.0, R * np.sin(tc)])
                ax = np.array([-np.sin(tc), 0.0, np.cos(tc)])
                half = R * np.tan((t1 - t0) / 2)
                cyls.append(np.concatenate(
                    [fix @ cen, fix @ ax, [r_tube, half]]))
            legs = hoop[hoop[:, 2] <= 0.05]
            for sgn in (-1, 1):
                lv = legs[np.sign(legs[:, 0]) == sgn]
                cen = np.array([lv[:, 0].mean(), 0.0,
                                (lv[:, 2].min() + lv[:, 2].max()) / 2])
                ax = np.array([0.0, 0.0, 1.0])
                half = np.ptp(lv[:, 2]) / 2
                cyls.append(np.concatenate(
                    [fix @ cen, fix @ ax, [r_tube, half]]))
            print(f"flags/{name}: hoop R={R:.3f} tube_r={r_tube:.3f}, "
                  f"{len(cyls)} cylinders + banner sheet")
        all_boxes.append(np.stack(boxes) if boxes else np.zeros((0, 6)))
        all_cyls.append(np.stack(cyls) if cyls else np.zeros((0, 8)))

    mb = max(1, max(len(b) for b in all_boxes))
    mc = max(1, max(len(c) for c in all_cyls))
    boxes_t = np.zeros((len(FLAG_VARIANTS), mb, 7), np.float32)
    cyls_t = np.zeros((len(FLAG_VARIANTS), mc, 9), np.float32)
    for vi in range(len(FLAG_VARIANTS)):
        b, c = all_boxes[vi], all_cyls[vi]
        boxes_t[vi, : len(b), :6] = b
        boxes_t[vi, : len(b), 6] = 1.0
        cyls_t[vi, : len(c), :8] = c
        cyls_t[vi, : len(c), 8] = 1.0
    np.savez(os.path.join(OUT, "flags.npz"),
             annuli=annuli, boxes=boxes_t, cyls=cyls_t)
    print(f"flags.npz annuli{annuli.shape} boxes{boxes_t.shape} "
          f"cyls{cyls_t.shape} (order {FLAG_VARIANTS})")
    return annuli, boxes_t, cyls_t


# ------------------------------------------------------------------- tree


def extract_tree(n_trunk=12, n_leaf=24, seed=0):
    """trees/tree/tree.dae: bark (trunk + branches) triangles -> fitted
    cylinder skeleton; leaf-card triangles -> k-means sphere clusters.
    Prints coverage stats; output packs cylinders then spheres."""
    pos, tris = parse_dae(f"{REF}/trees/tree/tree.dae")
    verts = mesh_world_verts(pos)
    bark = leaves = None
    for mat, t in tris:
        if "bark" in mat.lower() or "trank" in mat.lower():
            bark = t
        else:
            leaves = t

    # --- bark skeleton: slice the trunk/branch vertex cloud by z, fit a
    # cylinder per radial cluster in each slab
    bverts = verts[np.unique(bark.reshape(-1))]
    zmin, zmax = bverts[:, 2].min(), bverts[:, 2].max()
    edges = np.linspace(zmin, zmax, n_trunk + 1)
    cyls = []
    for i in range(n_trunk):
        sl = bverts[(bverts[:, 2] >= edges[i]) & (bverts[:, 2] < edges[i + 1])]
        if len(sl) < 8:
            continue
        c = sl.mean(0)
        rho = np.hypot(sl[:, 0] - c[0], sl[:, 1] - c[1])
        # radius containing 90% of bark vertices in the slab (branches fan
        # out, the quantile keeps the fitted trunk tight)
        r = np.quantile(rho, 0.90)
        half = (edges[i + 1] - edges[i]) / 2
        cyls.append(np.concatenate(
            [[c[0], c[1], (edges[i] + edges[i + 1]) / 2],
             [0.0, 0.0, 1.0], [r, half]]))
    cyl_arr = np.stack(cyls).astype(np.float32)

    # --- leaves: k-means into spheres
    lverts = verts[np.unique(leaves.reshape(-1))]
    rng = np.random.RandomState(seed)
    centers = lverts[rng.choice(len(lverts), n_leaf, replace=False)]
    for _ in range(25):
        d = np.linalg.norm(lverts[:, None] - centers[None], axis=-1)
        a = d.argmin(1)
        for k in range(n_leaf):
            if (a == k).any():
                centers[k] = lverts[a == k].mean(0)
    d = np.linalg.norm(lverts[:, None] - centers[None], axis=-1)
    a = d.argmin(1)
    radii = np.array([np.quantile(d[a == k, k], 0.9) if (a == k).any()
                      else 0.0 for k in range(n_leaf)])
    sph_arr = np.concatenate([centers, radii[:, None]],
                             axis=1).astype(np.float32)

    # coverage: every bark vertex within a cylinder + every leaf vertex
    # within 1.25x a sphere
    cover = np.zeros(len(lverts), bool)
    for k in range(n_leaf):
        cover |= np.linalg.norm(lverts - centers[k], axis=1) <= radii[k] * 1.3
    print(f"tree: {len(cyl_arr)} trunk cylinders, {n_leaf} leaf spheres, "
          f"leaf-vertex coverage {cover.mean() * 100:.1f}%, "
          f"height {zmin:.2f}..{zmax:.2f}")

    np.savez(os.path.join(OUT, "tree_mesh.npz"),
             cylinders=cyl_arr, spheres=sph_arr)
    print(f"tree_mesh.npz cylinders{cyl_arr.shape} spheres{sph_arr.shape}")
    return cyl_arr, sph_arr


if __name__ == "__main__":
    extract_vtrees()
    extract_cubes()
    extract_objects()
    extract_flags()
    extract_tree()
