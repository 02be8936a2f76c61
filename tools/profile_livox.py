#!/usr/bin/env python
"""Stage-level timing of the livox engine step on the real chip.

Times, as separately-jitted programs over the same inputs the bench feeds:
  preprocess   dynamic removal + 3-class features + downsamples
  preint       IMU preintegration + window shift
  solve        solve_window (3 outer x 2 inner, jacfwd linearization)
  wininfo      window_information (the duplicated linearization)
  marg         marginalize_oldest + prior embed
  mapins       3x insert_with_stats + bound_map
Progress to stderr; summary table to stdout.
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from agi_lidar_slam_tpu.estimators.window_map import (marginalize_oldest,
                                                      solve_window,
                                                      window_information,
                                                      _boxminus_flat)
from agi_lidar_slam_tpu.features.dynamic_removal import remove_dynamic
from agi_lidar_slam_tpu.features.livox import extract_livox_features
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.imu.preintegration import preintegrate
from agi_lidar_slam_tpu.map.hash_map import bound_map, insert_with_stats
from agi_lidar_slam_tpu.pointcloud.cloud import PointBatch, ScanGrid
from agi_lidar_slam_tpu.pointcloud.voxel import voxel_downsample
from agi_lidar_slam_tpu.runtime.livox_pipeline import (LivoxConfig, LivoxDriver,
                                                       process_livox_scan)
from agi_lidar_slam_tpu.runtime.lio_pipeline import ImuWindow
from agi_lidar_slam_tpu.sim.trajectory import circle_imu, circle_pose, circle_velocity
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

RINGS, WIDTH = 64, 1800
SCAN_DT = 0.1
IMU_PER_SCAN = 20
T0 = time.perf_counter()


def log(m):
    print(f"[prof +{time.perf_counter() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def make(n):
    world = default_world(seed=3, n_pillars=48, extent=35.0)
    scans, wins = [], []
    for i in range(n):
        t0, t1 = i * SCAN_DT, (i + 1) * SCAN_DT
        p0, p1 = circle_pose(t0, 8.0, 0.25), circle_pose(t1, 8.0, 0.25)
        scans.append(simulate_scan(world, p0, p1, rings=RINGS, width=WIDTH,
                                   fov_up_deg=2.0, fov_down_deg=-24.8,
                                   max_range=80.0, noise_std=0.01, seed=i))
        ts = t0 + (jnp.arange(IMU_PER_SCAN) + 0.5) * (SCAN_DT / IMU_PER_SCAN)
        gy, ac = circle_imu(ts, 8.0, 0.25)
        wins.append(ImuWindow(gy, ac, jnp.full((IMU_PER_SCAN,), SCAN_DT / IMU_PER_SCAN),
                              jnp.ones((IMU_PER_SCAN,), bool)))
    return scans, wins


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    log(f"{name:10s} {ms:8.2f} ms")
    return ms


def main():
    log(f"devices: {jax.devices()}")
    scans, wins = make(8)
    scans = [jax.device_put(s) for s in scans]
    wins = [jax.device_put(w) for w in wins]
    cfg = LivoxConfig()
    driver = LivoxDriver(cfg, init_frames=4, x0=circle_pose(0.0, 8.0, 0.25))
    for s, w in zip(scans[:6], wins[:6]):
        driver.process(s, w)
    assert driver.engaged
    log("engaged")
    state = driver.state
    scan, imu = scans[6], wins[6]

    ms = {}
    # full step
    def full(st, sc, w):
        st2, r = process_livox_scan(st, sc, w, cfg)
        return r.pose.t
    # NOTE process_livox_scan donates state; pass fresh copies
    stc = jax.tree.map(jnp.copy, state)
    ms["full"] = timeit("full", lambda: full(jax.tree.map(jnp.copy, state), scan, imu), reps=10)

    # --- preprocess ---------------------------------------------------------
    @jax.jit
    def preprocess(sc):
        keep = remove_dynamic(sc, cfg.dynamic)
        sc = ScanGrid(sc.xyz, sc.mask & keep, sc.time)
        feats = extract_livox_features(sc, cfg.features)
        c = voxel_downsample(feats.corners.xyz, feats.corners.mask,
                             cfg.corner_ds_voxel, cfg.features.max_corners)
        s = voxel_downsample(feats.surfs.xyz, feats.surfs.mask,
                             cfg.surf_ds_voxel, cfg.features.max_surfs)
        return c, s, feats.others
    ms["preprocess"] = timeit("preprocess", preprocess, scan)
    corners_new, surfs_new, others_new = jax.block_until_ready(preprocess(scan))

    @jax.jit
    def dynrem(sc):
        return remove_dynamic(sc, cfg.dynamic)
    ms["dyn_rem"] = timeit("dyn_rem", dynrem, scan)

    @jax.jit
    def feats_only(sc):
        return extract_livox_features(sc, cfg.features)
    ms["features"] = timeit("features", feats_only, scan)

    # --- preintegration -----------------------------------------------------
    @jax.jit
    def preint(st, w):
        cur_bg, cur_ba = st.ws.bg[1], st.ws.ba[1]
        return preintegrate(w.gyro, w.acc, jnp.where(w.mask, w.dt, 0.0),
                            w.mask, cur_bg, cur_ba, cfg.imu_noise)
    ms["preint"] = timeit("preint", preint, state, imu)
    pre = jax.block_until_ready(preint(state, imu))

    # --- build window inputs (mirrors process_livox_scan) -------------------
    ws = state.ws
    corners = PointBatch(jnp.stack([state.corners.xyz[1], corners_new.xyz]),
                         jnp.stack([state.corners.mask[1], corners_new.mask]))
    surfs = PointBatch(jnp.stack([state.surfs.xyz[1], surfs_new.xyz]),
                       jnp.stack([state.surfs.mask[1], surfs_new.mask]))
    others = PointBatch(jnp.stack([state.others.xyz[1], others_new.xyz]),
                        jnp.stack([state.others.mask[1], others_new.mask]))
    preints = jax.tree.map(lambda x: x[None], pre)
    okw = dict(others=others, other_map=state.other_map, omap_cfg=cfg.other_map,
               nonfeature_weight=cfg.nonfeature_weight)

    solve = jax.jit(lambda ws_, prior: solve_window(
        ws_, corners, surfs, state.corner_map, state.surf_map, preints,
        prior, state.grav, cfg.corner_map, cfg.surf_map, cfg.solver,
        cfg.lidar_weight, **okw))
    ms["solve"] = timeit("solve", solve, ws, state.prior)
    ws_opt, _, _, _ = jax.block_until_ready(solve(ws, state.prior))

    wininfo = jax.jit(lambda ws_: window_information(
        ws_, corners, surfs, state.corner_map, state.surf_map, preints,
        state.grav, cfg.corner_map, cfg.surf_map, cfg.solver, cfg.lidar_weight,
        **okw))
    ms["wininfo"] = timeit("wininfo", wininfo, ws_opt)
    H, b = jax.block_until_ready(wininfo(ws_opt))

    @jax.jit
    def marg(ws_, H_, b_, prior):
        dx_lin = _boxminus_flat(ws_, prior)
        return marginalize_oldest(ws_, H_ + prior.H, b_ + prior.b - prior.H @ dx_lin)
    ms["marg"] = timeit("marg", marg, ws_opt, H, b, state.prior)

    @jax.jit
    def mapins(st, ws_):
        pose_new = se3.Pose(ws_.q[1], ws_.t[1])
        Rn = so3.quat_to_matrix(pose_new.q)
        cmap, dc = insert_with_stats(st.corner_map, corners_new.xyz @ Rn.T + pose_new.t,
                                     corners_new.mask, cfg.corner_map)
        smap, dss = insert_with_stats(st.surf_map, surfs_new.xyz @ Rn.T + pose_new.t,
                                      surfs_new.mask, cfg.surf_map)
        omap, do = insert_with_stats(st.other_map, others_new.xyz @ Rn.T + pose_new.t,
                                     others_new.mask, cfg.other_map)
        cmap = bound_map(cmap, pose_new.t, cfg.bound_radius, cfg.corner_map)
        smap = bound_map(smap, pose_new.t, cfg.bound_radius, cfg.surf_map)
        omap = bound_map(omap, pose_new.t, cfg.bound_radius, cfg.other_map)
        return cmap.occ.sum() + smap.occ.sum() + omap.occ.sum()
    ms["mapins"] = timeit("mapins", mapins, state, ws_opt)

    print("\nstage breakdown (ms):")
    acct = sum(v for k, v in ms.items() if k not in ("full", "dyn_rem", "features"))
    for k, v in ms.items():
        print(f"  {k:10s} {v:8.2f}")
    print(f"  {'sum':10s} {acct:8.2f}  (vs full {ms['full']:.2f})")


if __name__ == "__main__":
    main()
