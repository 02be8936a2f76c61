#!/usr/bin/env python
"""Per-stage throughput attribution on the real chip.

Each stage is timed with the chained-iteration + value-fetch pattern
(`lax.fori_loop` with a synthetic data dependence between repetitions, then a
scalar fetch) because `block_until_ready` is not a reliable barrier on the
tunneled PJRT backend this container uses. See tpu-perf notes in bench.py.

Usage: timeout 580 python tools/profile_stages.py [--reps 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from agi_lidar_slam_tpu.config import preset_aloam_kitti64
from agi_lidar_slam_tpu.estimators.gn_scan2map import (
    associate,
    normal_equations,
    solve_delta,
)
from agi_lidar_slam_tpu.features.curvature import extract_features
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.map.hash_map import bound_map, insert
from agi_lidar_slam_tpu.nn.knn import knn
from agi_lidar_slam_tpu.pointcloud.cloud import PointBatch
from agi_lidar_slam_tpu.pointcloud.voxel import voxel_downsample
from agi_lidar_slam_tpu.runtime.pipeline import (
    deskew_constant_velocity,
    init_state,
    process_scan,
)

from bench import make_scans  # noqa: E402  (repo-root bench harness)


def timed(name, fn, *args, reps=20, fetch=None):
    """fn must return something whose first leaf feeds the chain."""
    out = fn(*args)  # compile + warm
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf) * 0)

    @jax.jit
    def chained(*a):
        def body(i, carry):
            o = fn(*a)
            l0 = jax.tree.leaves(o)[0]
            return carry + jnp.sum(l0).astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    r = chained(*args)
    float(r)
    t0 = time.perf_counter()
    r = chained(*args)
    float(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:32s} {dt*1e3:8.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    cfg = preset_aloam_kitti64()
    scans = [jax.device_put(s) for s in make_scans(4)]
    state = init_state(cfg)
    for s in scans:
        state, res = process_scan(state, s, cfg)
    float(res.pose.t[0])
    scan = scans[-1]
    pose = state.pose
    cmap, smap = state.corner_map, state.surf_map

    feats = extract_features(scan, cfg.features)
    corners = voxel_downsample(feats.corners.xyz, feats.corners.mask,
                               cfg.corner_ds_voxel, cfg.features.max_corners)
    surfs = voxel_downsample(feats.surfs.xyz, feats.surfs.mask,
                             cfg.surf_ds_voxel, cfg.features.max_surfs)
    print(f"n_corners={int(corners.mask.sum())} n_surfs={int(surfs.mask.sum())} "
          f"c_cap={corners.xyz.shape[0]} s_cap={surfs.xyz.shape[0]}")

    R = args.reps
    timed("deskew", lambda s: deskew_constant_velocity(s, pose).xyz, scan, reps=R)
    timed("features(extract)", lambda s: extract_features(s, cfg.features).surfs.xyz,
          scan, reps=R)
    timed("features+downsample", lambda s: voxel_downsample(
        extract_features(s, cfg.features).surfs.xyz,
        extract_features(s, cfg.features).surfs.mask,
        cfg.surf_ds_voxel, cfg.features.max_surfs).xyz, scan, reps=R)
    timed("knn corner (2048q)", lambda q, m: knn(m, q, corners.mask, 5,
                                                 cfg.corner_map).sq_dists,
          corners.xyz, cmap, reps=R)
    timed("knn surf (8192q)", lambda q, m: knn(m, q, surfs.mask, 5,
                                               cfg.surf_map).sq_dists,
          surfs.xyz, smap, reps=R)
    timed("associate (both maps)", lambda p: associate(
        se3.Pose(p.q, p.t), corners, surfs, cmap, smap,
        cfg.corner_map, cfg.surf_map, cfg.solver).line_centroid, pose, reps=R)

    corr = associate(pose, corners, surfs, cmap, smap, cfg.corner_map,
                     cfg.surf_map, cfg.solver)

    def inner(p):
        H, g, _ = normal_equations(p, corners, surfs, corr, cfg.solver)
        d, _ = solve_delta(H, g, cfg.solver)
        return d

    timed("normal_eq+solve (1 inner)", inner, pose, reps=R)
    timed("insert surf (8192)", lambda xyz: insert(
        smap, xyz, surfs.mask, cfg.surf_map).occ, surfs.xyz, reps=R)
    timed("bound_map surf", lambda t: bound_map(smap, t, 150.0, cfg.surf_map).occ,
          pose.t, reps=R)
    # copy the state per call: process_scan donates its state argument, and the
    # eager warmup call would otherwise delete the profiler's copy
    timed("full process_scan",
          lambda s: process_scan(jax.tree.map(jnp.array, state), s, cfg)[1].pose.t,
          scan, reps=max(4, R // 2))


if __name__ == "__main__":
    main()
