"""Checkpoint / resume / map export.

Reference parity (SURVEY.md section 5.4):
* LIO-SAM save_map service (srv/save_map.srv; mapOptmization.cpp:486-573)
  writes trajectory + corner/surf/global PCDs -> `export_pcd` + `save_state`;
* S-FAST_LIO relocalization (laserMapping_re.cpp: loads a prior map PCD into
  the ikd-Tree at startup and seeds the pose from init_pos/init_rot params)
  -> `relocalize_state` builds an EngineState with prebuilt hashed maps and
  a seed pose.

States are arbitrary engine pytrees (EngineState / LioState / SlamState);
serialization is a flat npz keyed by tree path — no pickle, no schema drift.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_keys(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_state(path: str, state: Any) -> None:
    """Serialize any engine-state pytree to one .npz file."""
    arrays, _ = _flatten_keys(state)
    np.savez_compressed(path, **arrays)


def load_state(path: str, template: Any) -> Any:
    """Restore a pytree saved by save_state; `template` supplies the structure
    (e.g. `init_state(cfg)` with matching config)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = "/".join(str(x) for x in p)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {key!r} shape {arr.shape} != template {np.shape(leaf)}"
            )
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def map_to_points(m) -> np.ndarray:
    """Extract occupied map points (N,3) from a HashVoxelMap (host-side)."""
    pts = np.asarray(m.points[:-1]).reshape(-1, 3)
    occ = np.asarray(m.occ[:-1]).reshape(-1)
    return pts[occ]


def export_pcd(path: str, points: np.ndarray) -> None:
    """Write an ASCII PCD v0.7 file (the reference's pcl::io::savePCDFile
    output format; readable by pcl/CloudCompare/open3d)."""
    points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    n = points.shape[0]
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA ascii\n"
    )
    with open(path, "w") as f:
        f.write(header)
        np.savetxt(f, points, fmt="%.5f")


def read_pcd(path: str) -> np.ndarray:
    """Read an ASCII x/y/z PCD (enough for reloading our own exports and the
    reference's saved maps)."""
    pts = []
    with open(path) as f:
        in_data = False
        for line in f:
            if in_data:
                vals = line.split()
                if len(vals) >= 3:
                    pts.append([float(v) for v in vals[:3]])
            elif line.startswith("DATA"):
                if "ascii" not in line:
                    raise ValueError("only ascii PCD supported")
                in_data = True
    return np.asarray(pts, dtype=np.float32)


def save_map_bundle(out_dir: str, state, trajectory: np.ndarray | None = None) -> None:
    """LIO-SAM saveMapService analog: write corner/surf/global PCDs (+ the
    trajectory) from an EngineState-like object with corner_map/surf_map."""
    os.makedirs(out_dir, exist_ok=True)
    corner = map_to_points(state.corner_map)
    surf = map_to_points(state.surf_map)
    export_pcd(os.path.join(out_dir, "CornerMap.pcd"), corner)
    export_pcd(os.path.join(out_dir, "SurfMap.pcd"), surf)
    export_pcd(os.path.join(out_dir, "GlobalMap.pcd"),
               np.concatenate([corner, surf], axis=0))
    if trajectory is not None:
        export_pcd(os.path.join(out_dir, "trajectory.pcd"), trajectory)


def relocalize_state(cfg, corner_points: np.ndarray, surf_points: np.ndarray,
                     init_pose=None):
    """Build an EngineState whose maps are prefilled from a prior map and whose
    pose is seeded (S-FAST_LIO laserMapping_re.cpp:350,541-589)."""
    from ..geometry import se3
    from ..map.hash_map import insert
    from ..runtime.pipeline import init_state

    state = init_state(cfg)
    cmap = insert(state.corner_map, jnp.asarray(corner_points),
                  jnp.ones(len(corner_points), dtype=bool), cfg.corner_map)
    smap = insert(state.surf_map, jnp.asarray(surf_points),
                  jnp.ones(len(surf_points), dtype=bool), cfg.surf_map)
    pose = init_pose if init_pose is not None else se3.Pose.identity()
    # distinct buffers for pose/prev_pose: process_scan donates the state and
    # XLA rejects donating one buffer twice
    prev = jax.tree.map(jnp.copy, pose)
    return state._replace(corner_map=cmap, surf_map=smap, pose=pose, prev_pose=prev)


def relocalize_lio_state(cfg, map_points: np.ndarray, init_pose=None):
    """LioState localized in a prior map — the direct laserMapping_re analog
    (S-FAST_LIO loads GlobalMap.pcd into the ikd-Tree at startup :350 and
    seeds pos/rot from the mapping/init_* params :541-589). `cfg` is a
    LioConfig; `init_pose` an se3.Pose seed for the IMU body frame."""
    from ..map.hash_map import insert
    from ..runtime.lio_pipeline import init_lio_state

    state = init_lio_state(cfg)
    m = insert(state.map, jnp.asarray(map_points),
               jnp.ones(len(map_points), dtype=bool), cfg.map)
    x = state.x
    if init_pose is not None:
        x = x._replace(p=jnp.asarray(init_pose.t), q=jnp.asarray(init_pose.q))
    return state._replace(map=m, x=x)
