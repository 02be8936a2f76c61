"""Long-trajectory accuracy + map-bounding gates (VERDICT round-1 item 9).

Drives the flagship odometry configuration for 150+ scans around a full
simulated loop and gates on
  * translational drift as a fraction of distance traveled (the KITTI-style
    metric the reference reports; A-LOAM class is ~0.55-0.8% on HDL-64 —
    the 16-beam simulator on a tight circle is a harder relative setting,
    so the gate is an envelope/regression bound, not a parity claim),
  * late-trajectory health: the error in the last quarter must not blow up
    relative to the whole run (catches map saturation / association decay),
  * map bounding: live block counts stay bounded and inserts are not
    silently dropped (hash table never saturates).

The LIO engine has its own circle-tracking gate (test_lio), LeGO and Livox
their own e2e tests; this file pins the long-horizon behavior of the base
scan-to-map engine that all of them share.
"""

import numpy as np

from agi_lidar_slam_tpu.config import preset_sim16
from agi_lidar_slam_tpu.runtime.pipeline import run_sequence
from agi_lidar_slam_tpu.sim.trajectory import circle_pose
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

N_SCANS = 150
R_TRAJ, OMEGA, DT = 8.0, 0.125, 0.25  # ~1 m/s, 0.03 rad/scan yaw


import pytest


@pytest.fixture(scope="module")
def loop_scans():
    """One shared 150-scan raycast set for both long-trajectory gates —
    the CPU raycast is the expensive part, not the engines."""
    world = default_world(seed=3)
    scans, gt = [], []
    for i in range(N_SCANS):
        p0 = circle_pose(i * DT, R_TRAJ, OMEGA)
        p1 = circle_pose((i + 1) * DT, R_TRAJ, OMEGA)
        scans.append(simulate_scan(world, p0, p1, rings=16, width=900,
                                   noise_std=0.005, seed=i))
        gt.append(np.asarray(p0.t))
    return scans, np.stack(gt)


def test_long_trajectory_drift_and_map_bound(loop_scans):
    cfg = preset_sim16()
    scans, gt = loop_scans
    state, results = run_sequence(scans, cfg)

    est = np.stack([np.asarray(r.pose.t) for r in results])
    path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))
    err = np.linalg.norm(est - gt, axis=1)

    # drift envelope: on this 16-beam tight-circle world the error oscillates
    # around ~2-3.6% of path (measured); gate final drift at 5% and the whole-
    # run ATE at 3% as regression bounds
    drift_pct = 100.0 * err[-1] / path
    assert drift_pct < 5.0, f"drift {drift_pct:.2f}% of {path:.0f} m path"
    ate_pct = 100.0 * float(np.sqrt((err ** 2).mean())) / path
    assert ate_pct < 4.5, f"ATE {ate_pct:.2f}% of path"

    # late-trajectory health: last-quarter mean error within 3x the overall
    # mean (maps that saturate or alias show runaway late error)
    q = N_SCANS // 4
    assert err[-q:].mean() < 3.0 * max(err.mean(), 0.05)

    # map stays bounded and (near-)lossless: block counts well under table
    # capacity, and drops to unluckily-full probe chains stay rare (<0.03%
    # of ~400k insert attempts; saturation shows up as thousands)
    n_dropped = sum(int(r.n_dropped) for r in results)
    assert n_dropped < 100, f"{n_dropped} map inserts silently dropped"
    cb = int(state.corner_map.num_blocks())
    sb = int(state.surf_map.num_blocks())
    assert cb < 0.5 * cfg.corner_map.slots, (cb, cfg.corner_map.slots)
    assert sb < 0.5 * cfg.surf_map.slots, (sb, cfg.surf_map.slots)


def test_long_trajectory_lego_two_step(loop_scans):
    """Same long-loop scans through the LeGO configuration (segmentation +
    two-step GN + constant-velocity deskew): drift envelope gate. The
    two-step solver constrains 3 dof per stage, so its envelope is wider
    than the full-6dof gate above; this pins regressions, not parity."""
    from agi_lidar_slam_tpu.config import preset_lego_vlp16

    cfg = preset_lego_vlp16()
    n = 120
    scans, gt = loop_scans
    scans, gt = scans[:n], gt[:n]
    state, results = run_sequence(scans, cfg)
    est = np.stack([np.asarray(r.pose.t) for r in results])
    path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))
    err = np.linalg.norm(est - gt, axis=1)
    drift_pct = 100.0 * err[-1] / path
    assert drift_pct < 8.0, f"lego drift {drift_pct:.2f}% of {path:.0f} m"
    q = n // 4
    assert err[-q:].mean() < 3.0 * max(err.mean(), 0.05)


@pytest.mark.nightly
def test_city_drive_kitti_drift_gated():
    """Nightly: a multi-lap city-block drive gated in the OFFICIAL KITTI
    per-segment drift units (eval/metrics.kitti_drift) — the CPU-scale
    companion of the 1000-scan HDL-64 TPU run
    (`run_slam.py --sim --world city --frames 1000 --sim-rings 64
      --sim-width 1800 --slam --gate ...`, PARITY.md round-3 notes).
    Full SLAM: keyframes + loop closures across laps."""
    import dataclasses

    from agi_lidar_slam_tpu.eval.metrics import kitti_drift
    from agi_lidar_slam_tpu.geometry import se3
    from agi_lidar_slam_tpu.runtime.slam_pipeline import SlamConfig, SlamDriver
    from agi_lidar_slam_tpu.sim.trajectory import square_loop_pose
    from agi_lidar_slam_tpu.sim.world import city_world, simulate_scan

    frames, ds = 360, 0.35  # ~126 m of path = 1.2 laps of the block
    world = city_world(seed=0)
    cfg = SlamConfig(pipeline=dataclasses.replace(preset_sim16()),
                     kf_dist=1.0, loop_every=10)
    driver = SlamDriver(cfg)
    inv0 = se3.inverse(square_loop_pose(0.0, side=18.0, corner=4.0))
    est, est_q, gt, gt_q = [], [], [], []
    for i in range(frames):
        p0 = square_loop_pose(i * ds, side=18.0, corner=4.0)
        p1 = square_loop_pose((i + 1) * ds, side=18.0, corner=4.0)
        scan = simulate_scan(world, p0, p1, rings=16, width=900,
                             noise_std=0.005, seed=i)
        res = driver.process(scan)
        est.append(np.asarray(res.pose.t))
        est_q.append(np.asarray(res.pose.q)[[1, 2, 3, 0]])
        g = se3.compose(inv0, p0)
        gt.append(np.asarray(g.t))
        gt_q.append(np.asarray(g.q)[[1, 2, 3, 0]])
    driver.finalize()
    d = kitti_drift(np.stack(est), np.stack(gt), est_q=np.stack(est_q),
                    gt_q=np.stack(gt_q), lengths=(50.0, 100.0), step=10)
    assert d["n_segments"] >= 10, d
    # envelope: A-LOAM class is 0.55-0.8% on real KITTI; the simulator is
    # cleaner, so gate at 1.0% translational / 0.01 deg/m rotational
    assert d["t_rel_pct"] < 1.0, d
    assert d["r_deg_per_m"] < 0.01, d


def test_city_drift_short_gate():
    """Default-suite KITTI-drift gate: a trimmed (~1/3 scale) version of the
    nightly city drive, so drift evidence is recorded on EVERY suite run
    rather than only in the nightly band (VERDICT r3 missing #3). Gates the
    same eval/metrics.kitti_drift units on shorter segments — a regression
    tripwire, not the full parity envelope (that is the nightly +
    DRIFT_r{N}.json artifacts from tools/run_slam.py --summary-out)."""
    import dataclasses

    from agi_lidar_slam_tpu.eval.metrics import kitti_drift
    from agi_lidar_slam_tpu.geometry import se3
    from agi_lidar_slam_tpu.runtime.slam_pipeline import SlamConfig, SlamDriver
    from agi_lidar_slam_tpu.sim.trajectory import square_loop_pose
    from agi_lidar_slam_tpu.sim.world import city_world, simulate_scan

    frames, ds = 130, 0.35  # ~45 m: one half-lap of the block
    world = city_world(seed=0)
    cfg = SlamConfig(pipeline=dataclasses.replace(preset_sim16()),
                     kf_dist=1.0, loop_every=10)
    driver = SlamDriver(cfg)
    inv0 = se3.inverse(square_loop_pose(0.0, side=18.0, corner=4.0))
    est, est_q, gt, gt_q = [], [], [], []
    for i in range(frames):
        p0 = square_loop_pose(i * ds, side=18.0, corner=4.0)
        p1 = square_loop_pose((i + 1) * ds, side=18.0, corner=4.0)
        scan = simulate_scan(world, p0, p1, rings=16, width=720,
                             noise_std=0.005, seed=i)
        res = driver.process(scan)
        est.append(np.asarray(res.pose.t))
        est_q.append(np.asarray(res.pose.q)[[1, 2, 3, 0]])
        g = se3.compose(inv0, p0)
        gt.append(np.asarray(g.t))
        gt_q.append(np.asarray(g.q)[[1, 2, 3, 0]])
    driver.finalize()
    d = kitti_drift(np.stack(est), np.stack(gt), est_q=np.stack(est_q),
                    gt_q=np.stack(gt_q), lengths=(20.0, 40.0), step=5)
    assert d["n_segments"] >= 8, d
    assert d["t_rel_pct"] < 1.5, d
    assert d["r_deg_per_m"] < 0.02, d
