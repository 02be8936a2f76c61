#!/usr/bin/env python
"""Per-stage timing of the odometry hot path on the real chip.

Times each pipeline stage as its own jitted function (same configs/shapes as
bench.py) so optimization work targets the real bottleneck. Not a test; a tool.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import functools

import jax.numpy as jnp

from agi_lidar_slam_tpu.config import preset_aloam_kitti64
from agi_lidar_slam_tpu.estimators.gn_scan2map import (associate,
                                                       normal_equations,
                                                       solve_scan2map)
from agi_lidar_slam_tpu.features.curvature import extract_features
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.map.hash_map import bound_map, insert_with_stats
from agi_lidar_slam_tpu.nn.knn import knn
from agi_lidar_slam_tpu.pointcloud.voxel import voxel_downsample
from agi_lidar_slam_tpu.runtime.pipeline import (deskew_constant_velocity,
                                                 init_state, process_scan)
from bench import make_scans


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a real sync through a scalar fetch (tunneled PJRT)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.2f} ms")
    return out


def main():
    cfg = preset_aloam_kitti64()
    scans = [jax.device_put(s) for s in make_scans()]
    state = init_state(cfg)
    for s in scans[:4]:
        state, res = process_scan(state, s, cfg)
    float(res.pose.t[0])
    scan = scans[4]
    pose = state.pose
    rel = se3.compose(se3.inverse(state.prev_pose), state.pose)

    print(f"map blocks: corner={int(state.corner_map.num_blocks())} "
          f"surf={int(state.surf_map.num_blocks())}")

    dsk = timeit("deskew", jax.jit(deskew_constant_velocity), scan, rel)
    feats = timeit("features", jax.jit(functools.partial(extract_features, cfg=cfg.features)), dsk)
    corners = timeit(
        "downsample corners",
        jax.jit(lambda x, m: voxel_downsample(x, m, cfg.corner_ds_voxel, cfg.features.max_corners)),
        feats.corners.xyz, feats.corners.mask)
    surfs = timeit(
        "downsample surfs",
        jax.jit(lambda x, m: voxel_downsample(x, m, cfg.surf_ds_voxel, cfg.features.max_surfs)),
        feats.surfs.xyz, feats.surfs.mask)

    R = so3.quat_to_matrix(pose.q)
    cw = corners.xyz @ R.T + pose.t
    sw = surfs.xyz @ R.T + pose.t
    print(f"corners N={corners.xyz.shape[0]} valid={int(corners.mask.sum())}; "
          f"surfs N={surfs.xyz.shape[0]} valid={int(surfs.mask.sum())}")

    timeit("knn corners (1 pass)",
           jax.jit(functools.partial(knn, k=cfg.solver.k_neighbors, cfg=cfg.corner_map)),
           state.corner_map, cw, corners.mask)
    timeit("knn surfs (1 pass)",
           jax.jit(functools.partial(knn, k=cfg.solver.k_neighbors, cfg=cfg.surf_map)),
           state.surf_map, sw, surfs.mask)

    corr = timeit(
        "associate (knn+fits, both classes)",
        jax.jit(functools.partial(associate, cmap_cfg=cfg.corner_map,
                                  smap_cfg=cfg.surf_map, cfg=cfg.solver)),
        pose, corners, surfs, state.corner_map, state.surf_map)

    timeit("normal_equations (1 linearize)",
           jax.jit(functools.partial(normal_equations, cfg=cfg.solver)),
           pose, corners, surfs, corr)

    timeit(f"solve_scan2map (outer={cfg.solver.n_outer} inner={cfg.solver.n_inner})",
           jax.jit(functools.partial(solve_scan2map, cmap_cfg=cfg.corner_map,
                                     smap_cfg=cfg.surf_map, cfg=cfg.solver)),
           pose, corners, surfs, state.corner_map, state.surf_map)

    timeit("insert corners",
           jax.jit(functools.partial(insert_with_stats, cfg=cfg.corner_map)),
           state.corner_map, cw, corners.mask)
    timeit("insert surfs",
           jax.jit(functools.partial(insert_with_stats, cfg=cfg.surf_map)),
           state.surf_map, sw, surfs.mask)
    timeit("bound_map surf",
           jax.jit(functools.partial(bound_map, radius=cfg.bound_radius, cfg=cfg.surf_map)),
           state.surf_map, pose.t)

    # whole pipeline for reference
    st = state
    def step(st, s):
        return process_scan(st, s, cfg)
    st, r = step(st, scan)
    float(r.pose.t[0])
    t0 = time.perf_counter()
    n = 0
    for _ in range(5):
        for s in scans[4:]:
            st, r = step(st, s)
            n += 1
    float(r.pose.t[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{'process_scan (full)':40s} {dt*1e3:8.2f} ms   ({1/dt:.1f} scans/s)")


if __name__ == "__main__":
    main()
