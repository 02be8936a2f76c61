#!/usr/bin/env python
"""SLAM run harness — the engine's replacement for the reference's launch
files + kittiHelper + rosbag play (SURVEY.md section 4).

Examples:
  # KITTI sequence (uses the native C++ prefetching loader):
  python tools/run_slam.py --kitti /data/kitti/sequences/00 --preset aloam \
      --max-scans 500 --metrics /tmp/run.jsonl --save-map /tmp/maps

  # built-in simulator (no dataset needed):
  python tools/run_slam.py --sim --frames 40 --preset sim16

Outputs the trajectory (KITTI pose format), ATE vs ground truth when
available, and per-scan JSONL metrics.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _pipeline_cfg(name: str):
    """Resolve a --preset string to a PipelineConfig. The *-ref presets are
    the reference-parameter parity pack (agi_lidar_slam_tpu/presets.py)."""
    from agi_lidar_slam_tpu.config import (preset_aloam_kitti64,
                                           preset_lego_vlp16, preset_sim16)
    from agi_lidar_slam_tpu.presets import REFERENCE_PIPELINE_PRESETS

    table = {"aloam": preset_aloam_kitti64, "sim16": preset_sim16,
             "lego": preset_lego_vlp16, **REFERENCE_PIPELINE_PRESETS}
    return table[name]()


def _gate_exit(args, summary: dict) -> int:
    """Write --summary-out, then apply --gate: compare the run summary to
    the envelope, print the
    verdict, and return the process exit code (2 on breach — the one-command
    accuracy gate for dataset parity runs)."""
    if getattr(args, "summary_out", None):
        import json
        import sys as _sys

        # provenance so the artifact is self-describing (the drift/gate
        # artifacts are judged standalone)
        summary.setdefault("command", "tools/run_slam.py " + " ".join(_sys.argv[1:]))
        if getattr(args, "engine", None):
            summary.setdefault("engine", args.engine)
        if getattr(args, "sim", False):
            summary.setdefault("world", args.world)
        with open(args.summary_out, "w") as f:
            json.dump(summary, f, indent=1)
        print("summary written:", args.summary_out)
    if not getattr(args, "gate", None):
        return 0
    from agi_lidar_slam_tpu.eval.metrics import check_envelope, load_envelope

    env = load_envelope(args.gate)
    breaches = check_envelope(summary, env)
    bounds = {k: v for k, v in env.items() if not k.startswith("_")}
    if breaches:
        print(f"GATE FAIL ({args.gate}):")
        for b in breaches:
            print(f"  - {b}")
        return 2
    print(f"GATE PASS ({args.gate}): within {bounds}")
    return 0


def _make_viz(args):
    """--live-viz PORT: start the rviz-analog SSE viewer (io/live_viz.py)."""
    if not getattr(args, "live_viz", None):
        return None
    from agi_lidar_slam_tpu.io.live_viz import VizServer

    viz = VizServer(port=args.live_viz).start()
    print(f"live viz: http://localhost:{viz.port}/")
    return viz


def _viz_pub(viz, res, scan=None, stride=97):
    """Publish one scan's pose + a decimated world-frame scatter. `scan` is a
    ScanGrid or an (xyz, mask) pair; host numpy only, so the device pipeline
    never stalls on the viewer."""
    if viz is None:
        return
    pose = getattr(res, "pose", None)
    if pose is not None:
        t, q = np.asarray(pose.t), np.asarray(pose.q)
    else:  # direct-LIO result: NavState
        t, q = np.asarray(res.x.p), np.asarray(res.x.q)
    pts = None
    if scan is not None:
        xyz, m = (scan if isinstance(scan, tuple)
                  else (scan.xyz, scan.mask))
        xyz = np.asarray(xyz).reshape(-1, 3)[::stride]
        m = np.asarray(m).reshape(-1)[::stride]
        xyz = xyz[m]
        w, x, y, z = q
        R = np.array([[1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                      [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                      [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
        pts = xyz @ R.T + t
    viz.publish(t, pose_q=q, points=pts)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti", help="KITTI sequence dir (with velodyne/)")
    ap.add_argument("--bag", help="ROS1 .bag file (PointCloud2/CustomMsg + Imu)")
    ap.add_argument("--sim", action="store_true", help="run on the simulator")
    ap.add_argument("--preset", default="aloam",
                    choices=["aloam", "sim16", "lego",
                             "aloam-ref", "lego-ref", "liosam-ref",
                             "avia-ref", "horizon-ref"],
                    help="engine configuration preset; the *-ref presets "
                         "restore the reference's shipped parameters "
                         "(presets.py) for dataset parity runs. avia-ref "
                         "applies to --engine lio, horizon-ref to livox")
    ap.add_argument("--gate",
                    help="accuracy envelope: JSON file, named envelope in "
                         "eval/envelopes/ (e.g. kitti00_aloam), or inline "
                         "'ate_m=0.5,t_rel_pct=1.0'; exits 2 on breach")
    ap.add_argument("--engine", default=None,
                    choices=["odom", "slam", "lio", "livox", "liosam"],
                    help="odom/slam: feature scan-to-map; lio: FAST-LIO IESKF; "
                         "livox: sliding-window MAP; liosam: IMU-coupled + graph")
    ap.add_argument("--lidar-topic", default=None)
    ap.add_argument("--imu-topic", default=None)
    ap.add_argument("--gps-topic", default=None,
                    help="bag GPS topic (nav_msgs/Odometry or NavSatFix); "
                         "adds unary GPS factors in slam/liosam engines "
                         "(LIO-SAM gpsTopic)")
    ap.add_argument("--navsat", action="store_true",
                    help="fuse IMU+GPS through the navsat ESKF "
                         "(imu/navsat.py) and feed the SMOOTHED odometry to "
                         "the GPS factors — the reference's ekf_gps stage "
                         "(LIO-SAM launch/run.launch)")
    ap.add_argument("--gps-cov-thresh", type=float, default=2.0,
                    help="skip GPS fixes whose position covariance exceeds "
                         "this (LIO-SAM gpsCovThreshold)")
    ap.add_argument("--imu-mode", type=int, default=2, choices=[0, 1, 2],
                    help="livox engine IMU mode (horizon.launch:10-11): "
                         "0 = LiDAR-only, 1 = gyro deskew only, "
                         "2 = tightly-coupled window LIO")
    ap.add_argument("--rings", type=int, default=None,
                    help="grid rows for bag feature engines (default 16, or "
                         "6 for livox CustomMsg)")
    ap.add_argument("--max-points", type=int, default=131072)
    ap.add_argument("--fov-up", type=float, default=2.0,
                    help="grid fov for bag clouds without a ring channel")
    ap.add_argument("--fov-down", type=float, default=-24.8)
    ap.add_argument("--frames", type=int, default=40, help="sim frames")
    ap.add_argument("--world", default="arena",
                    choices=["arena", "city", "corridor"],
                    help="simulator world: arena (pillar box), city "
                         "(urban-canyon block loop), corridor (degenerate "
                         "tunnel along +x)")
    ap.add_argument("--movers", type=int, default=0,
                    help="number of moving car-sized boxes in the sim world")
    ap.add_argument("--sim-rings", type=int, default=16,
                    help="simulated beam count (64 = HDL-64 scale)")
    ap.add_argument("--sim-width", type=int, default=900,
                    help="simulated columns per sweep (1800 = HDL-64 scale)")
    ap.add_argument("--max-scans", type=int, default=None)
    ap.add_argument("--width", type=int, default=1800)
    ap.add_argument("--metrics", help="JSONL metrics output path")
    ap.add_argument("--summary-out",
                    help="write the run summary (scans/s, ATE, KITTI drift) "
                         "as JSON — the machine-checkable drift artifact")
    ap.add_argument("--save-map", help="directory for PCD map export")
    ap.add_argument("--traj-out", help="trajectory output (KITTI format)")
    ap.add_argument("--no-imu-deskew", action="store_true",
                    help="disable IMU-interpolated deskew in bag+lego mode")
    ap.add_argument("--imu-rate-out",
                    help="npz path for the IMU-rate pose stream (the "
                         "TransformFusion 200-500 Hz output): liosam engine "
                         "via the fused ESKF re-predict, odom/slam engines "
                         "via gyro-track + constant-velocity fusion")
    ap.add_argument("--loop-pairs",
                    help="file of externally supplied loop candidates, one "
                         "'cur_kf cand_kf' keyframe-index pair per line "
                         "(detectLoopClosureExternal analog; slam engine). "
                         "Pairs are verified by submap alignment before the "
                         "edge is added, then applied at end of stream")
    ap.add_argument("--viz", help="render trajectory/metrics PNG after the run")
    ap.add_argument("--live-viz", type=int, metavar="PORT",
                    help="serve the live rviz-analog viewer (SSE + embedded "
                         "canvas page, io/live_viz.py) on this port")
    ap.add_argument("--slam", action="store_true",
                    help="full SLAM (keyframes + loop closure) instead of odometry")
    ap.add_argument("--load-map",
                    help="relocalization mode (laserMapping_re analog): dir "
                         "with CornerMap.pcd/SurfMap.pcd from --save-map; the "
                         "engine starts localized in that prior map "
                         "(odom/slam engines)")
    ap.add_argument("--init-pose", default="0,0,0,0",
                    help="relocalization seed 'x,y,z,yaw_deg' (mapping "
                         "init_pos/init_rot params)")
    args = ap.parse_args()
    if args.engine is None:
        args.engine = "slam" if args.slam else "odom"
    if args.load_map and args.engine not in ("odom", "slam", "lio"):
        ap.error("--load-map relocalization covers the odom/slam/lio engines")
    if args.preset == "avia-ref" and args.engine != "lio":
        ap.error("--preset avia-ref is the --engine lio (IESKF) preset")
    if args.preset == "horizon-ref" and args.engine != "livox":
        ap.error("--preset horizon-ref is the --engine livox preset")
    if args.engine in ("lio", "liosam", "livox") and args.kitti:
        ap.error("the IMU-coupled engines need --bag (recorded IMU) or "
                 "--sim (exact analytic IMU); KITTI odometry has no IMU")

    if args.bag:
        return _run_bag(args)

    import jax.numpy as jnp

    from agi_lidar_slam_tpu.eval.metrics import ate_rmse
    from agi_lidar_slam_tpu.geometry import se3, so3
    from agi_lidar_slam_tpu.io.checkpoint import save_map_bundle
    from agi_lidar_slam_tpu.runtime.metrics import MetricsWriter, StageTimer
    from agi_lidar_slam_tpu.runtime.pipeline import init_state, process_scan

    cfg = _pipeline_cfg(args.preset)

    gt_positions = None
    gt_quats = None  # (N,4) xyzw ground-truth orientations when available
    if args.kitti:
        from agi_lidar_slam_tpu.io.kitti import scan_paths
        from agi_lidar_slam_tpu.io.native_loader import NativeKittiLoader

        paths = scan_paths(args.kitti)
        if args.max_scans:
            paths = paths[: args.max_scans]
        scans = NativeKittiLoader(paths, rings=64, width=args.width)
        seq = os.path.basename(os.path.normpath(args.kitti))
        pose_file = os.path.join(os.path.dirname(os.path.dirname(args.kitti)),
                                 "poses", f"{seq}.txt")
        if os.path.exists(pose_file):
            from agi_lidar_slam_tpu.io.kitti import load_poses

            T = load_poses(pose_file, os.path.join(args.kitti, "calib.txt"))
            gt_positions = T[: len(paths), :3, 3]
            from agi_lidar_slam_tpu.eval.metrics import mat_to_quat

            gt_quats = mat_to_quat(T[: len(paths), :3, :3])
    elif args.sim:
        from agi_lidar_slam_tpu.sim.trajectory import square_loop_pose
        from agi_lidar_slam_tpu.sim.world import (city_world, corridor_world,
                                                  default_world, simulate_scan,
                                                  with_movers)

        ds = 0.35  # metres per frame (3.5 m/s at 10 Hz)
        scan_period = 0.1
        imu_engine = args.engine in ("lio", "liosam", "livox")
        if args.world == "city":
            world = city_world(seed=0)  # street centerlines at +-13 m
            if args.movers:
                world = with_movers(world, n=args.movers, lane_y=-13.0,
                                    x_range=(-9.0, 9.0))

            def pose_at(i):  # rounded-square loop on the street grid
                return square_loop_pose(i * ds, side=18.0, corner=4.0)
        elif args.world == "corridor":
            world = corridor_world(length=max(60.0, args.frames * ds + 20.0),
                                   n_alcoves=max(2, args.frames // 25))
            if args.movers:
                world = with_movers(world, n=args.movers,
                                    x_range=(8.0, args.frames * ds))

            def pose_at(i):
                return se3.Pose(so3.quat_identity(),
                                jnp.asarray([i * ds, 0.0, 0.0]))
        else:
            world = default_world(seed=0)
            if args.movers:
                world = with_movers(world, n=args.movers)
            if imu_engine:
                # the arc trajectory has no closed-form IMU; IMU engines get
                # the exact circle instead (same 3.5 m/s)
                from agi_lidar_slam_tpu.sim.trajectory import circle_pose

                _R, _OM = 8.0, 0.4375

                def pose_at(i):
                    return circle_pose(i * scan_period, _R, _OM)
            else:
                _arc = []
                q, t = so3.quat_identity(), jnp.zeros(3)
                for _ in range(args.frames + 1):
                    _arc.append(se3.Pose(q, t))
                    q = so3.quat_normalize(
                        so3.quat_mul(q, so3.quat_exp(jnp.asarray([0, 0, 0.03]))))
                    t = t + so3.quat_rotate(q, jnp.asarray([ds, 0.0, 0.0]))

                def pose_at(i):
                    return _arc[i]

        def imu_at(i, m=20):
            """Exact IMU window covering frame i (body rates + specific
            force from the analytic trajectory of the chosen world)."""
            from agi_lidar_slam_tpu.runtime.lio_pipeline import ImuWindow
            from agi_lidar_slam_tpu.sim.trajectory import (circle_imu,
                                                           square_loop_imu,
                                                           straight_imu)

            ts = (i + (jnp.arange(m) + 0.5) / m) * scan_period
            if args.world == "city":
                gy, ac = square_loop_imu(ts, side=18.0, corner=4.0,
                                         speed=ds / scan_period)
            elif args.world == "corridor":
                gy, ac = straight_imu(ts, speed=ds / scan_period)
            else:
                gy, ac = circle_imu(ts, _R, _OM)
            return ImuWindow(gy, ac, jnp.full((m,), scan_period / m),
                             jnp.ones((m,), bool))

        poses, scan_list = [], []
        inv0 = se3.inverse(pose_at(0))  # engines start at identity: rebase GT
        for i in range(args.frames):
            p, nxt = pose_at(i), pose_at(i + 1)
            scan_list.append(
                simulate_scan(world, p, nxt, rings=args.sim_rings,
                              width=args.sim_width, noise_std=0.005, seed=i,
                              t0=i * scan_period, scan_period=scan_period)
            )
            # IMU engines estimate the sweep-END pose (deskew-to-end); the
            # feature engines estimate the sweep START
            poses.append(se3.compose(inv0, nxt if imu_engine else p))
        scans = scan_list
        gt_positions = np.stack([np.asarray(p.t) for p in poses])
        gt_quats = np.stack([np.asarray(p.q)[[1, 2, 3, 0]] for p in poses])
        if imu_engine:
            return _run_sim_imu(args, scans, imu_at, gt_positions, gt_quats,
                                scan_period)
        if args.preset == "aloam" and args.sim_rings < 32:
            cfg = _pipeline_cfg("sim16")
    else:
        ap.error("need --kitti or --sim")

    metrics = MetricsWriter(args.metrics)
    viz = _make_viz(args)
    timer = StageTimer()
    est, est_q = [], []

    if args.slam:
        from agi_lidar_slam_tpu.runtime.slam_pipeline import SlamDriver

        driver = SlamDriver(_slam_cfg(args.preset, cfg))
        if args.load_map:
            driver.state = driver.state._replace(engine=_reloc_state(args, cfg))
        n = 0
        t_start = time.perf_counter()
        for scan in scans:
            t0 = time.perf_counter()
            with timer.stage("scan"):
                res = driver.process(scan)
            est.append(np.asarray(res.pose.t))
            est_q.append(np.asarray(res.pose.q)[[1, 2, 3, 0]])
            metrics.log_scan(n, res, (time.perf_counter() - t0) * 1e3)
            _viz_pub(viz, res, scan)
            n += 1
        driver.finalize()
        _apply_loop_pairs(args, driver)
        state = driver.state.engine
        print(f"loops closed: {driver.n_loops_closed}")
    else:
        state = _reloc_state(args, cfg) if args.load_map else init_state(cfg)
        n = 0
        t_start = time.perf_counter()
        for scan in scans:
            t0 = time.perf_counter()
            with timer.stage("scan"):
                state, res = process_scan(state, scan, cfg)
            est.append(np.asarray(res.pose.t))
            est_q.append(np.asarray(res.pose.q)[[1, 2, 3, 0]])
            metrics.log_scan(n, res, (time.perf_counter() - t0) * 1e3)
            _viz_pub(viz, res, scan)
            n += 1

    wall = time.perf_counter() - t_start
    est = np.stack(est)
    print(f"processed {n} scans in {wall:.2f}s ({n / wall:.2f} scans/s)")
    print("stage timing:", timer.summary())
    summary = {"n_scans": n, "scans_per_s": n / wall}
    if gt_positions is not None and len(gt_positions) >= len(est):
        err = ate_rmse(est, gt_positions[: len(est)])
        err_na = ate_rmse(est, gt_positions[: len(est)], align=False)
        print(f"ATE RMSE: {err:.3f} m (aligned), {err_na:.3f} m (raw)")
        summary.update(ate_m=err, ate_raw_m=err_na)
        from agi_lidar_slam_tpu.eval.metrics import kitti_drift

        gq = gt_quats[: len(est)] if gt_quats is not None else None
        eq = np.stack(est_q) if gq is not None else None
        d = kitti_drift(est, gt_positions[: len(est)], est_q=eq, gt_q=gq)
        if d["n_segments"]:
            print(f"KITTI drift: {d['t_rel_pct']:.3f}% translational, "
                  f"{d['r_deg_per_m']:.5f} deg/m rotational "
                  f"({d['n_segments']} segments; per-length "
                  f"{ {k: round(v, 3) for k, v in d['per_length'].items()} })")
            summary.update(t_rel_pct=d["t_rel_pct"],
                           r_deg_per_m=d["r_deg_per_m"])
    if args.traj_out:
        from agi_lidar_slam_tpu.geometry import so3 as _so3

        with open(args.traj_out, "w") as f:
            for p in est:
                M = np.eye(4)
                M[:3, 3] = p
                f.write(" ".join(f"{v:.6e}" for v in M[:3].reshape(-1)) + "\n")
        print("trajectory written:", args.traj_out)
    if args.save_map:
        save_map_bundle(args.save_map, state, trajectory=est)
        print("maps written:", args.save_map)
    metrics.close()
    _maybe_viz(args)
    return _gate_exit(args, summary)


def _run_sim_imu(args, scans, imu_at, gt_positions, gt_quats,
                 scan_period) -> int:
    """Drive the IMU-coupled engines (lio/liosam/livox) on the simulator with
    exact analytic IMU — the no-dataset analog of the bag path, so the full
    gate pack covers all five engines with one command, e.g.
      run_slam.py --sim --engine lio --preset avia-ref --gate ate_m=0.3
    """
    import jax.numpy as jnp

    from agi_lidar_slam_tpu.eval.metrics import ate_rmse, kitti_drift
    from agi_lidar_slam_tpu.runtime.metrics import MetricsWriter, StageTimer

    metrics = MetricsWriter(args.metrics)
    viz = _make_viz(args)
    timer = StageTimer()
    est, est_q = [], []
    v0 = jnp.asarray([0.35 / scan_period, 0.0, 0.0])  # all worlds start +x

    if args.engine == "lio":
        from agi_lidar_slam_tpu.imu.eskf import NavState
        from agi_lidar_slam_tpu.runtime.lio_pipeline import (
            LioConfig, init_lio_state, process_lio_scan)

        if args.preset == "avia-ref":
            from agi_lidar_slam_tpu.presets import lio_config_avia_ref

            cfg = lio_config_avia_ref()
        else:
            cfg = LioConfig()
        state = init_lio_state(cfg, NavState.identity()._replace(v=v0))
        for i, scan in enumerate(scans):
            pts = scan.xyz.reshape(-1, 3)
            tt = (scan.time * scan_period).reshape(-1).astype(jnp.float32)
            mm = scan.mask.reshape(-1)
            with timer.stage("scan"):
                state, res = process_lio_scan(state, pts, tt, mm,
                                              imu_at(i), cfg)
            est.append(np.asarray(res.x.p))
            est_q.append(np.asarray(res.x.q)[[1, 2, 3, 0]])
            metrics.log_scan(i, res, timer.last_ms)
            _viz_pub(viz, res, scan)
    elif args.engine == "liosam":
        from agi_lidar_slam_tpu.runtime.liosam_pipeline import (LioSamConfig,
                                                                LioSamDriver)

        pname = args.preset
        if pname == "aloam" and args.sim_rings < 32:
            pname = "sim16"  # same fallback as the feature-engine sim path
        cfg = LioSamConfig(slam=_slam_cfg(pname, _pipeline_cfg(pname)),
                           scan_period=scan_period)
        driver = LioSamDriver(cfg, v0=v0,
                              emit_imu_rate=bool(args.imu_rate_out))
        for i, scan in enumerate(scans):
            with timer.stage("scan"):
                res = driver.process(scan, imu_at(i))
            est.append(np.asarray(res.pose.t))
            est_q.append(np.asarray(res.pose.q)[[1, 2, 3, 0]])
            metrics.log_scan(i, res, timer.last_ms)
            _viz_pub(viz, res, scan)
        driver.finalize()
        print(f"loops closed: {driver.n_loops_closed}")
    else:  # livox
        import dataclasses as _dc

        from agi_lidar_slam_tpu.runtime.livox_pipeline import (LivoxConfig,
                                                               LivoxDriver)

        if args.preset == "horizon-ref":
            from agi_lidar_slam_tpu.presets import livox_config_horizon_ref

            cfg = livox_config_horizon_ref()
        else:
            cfg = LivoxConfig()
        if args.imu_mode != 2:
            cfg = _dc.replace(cfg, imu_mode=args.imu_mode)
        driver = LivoxDriver(cfg, init_frames=max(4, min(10, args.frames // 3)))
        for i, scan in enumerate(scans):
            with timer.stage("scan"):
                res = driver.process(scan, imu_at(i))
            est.append(np.asarray(res.pose.t))
            est_q.append(np.asarray(res.pose.q)[[1, 2, 3, 0]])
            metrics.log_scan(i, res, timer.last_ms)
            _viz_pub(viz, res, scan)

    n = len(est)
    wall = timer.summary()["scan"]["total_s"]
    est = np.stack(est)
    print(f"processed {n} scans in {wall:.2f}s ({n / wall:.2f} scans/s)")
    print("stage timing:", timer.summary())
    summary = {"n_scans": n, "scans_per_s": n / wall}
    err = ate_rmse(est, gt_positions[:n])
    err_na = ate_rmse(est, gt_positions[:n], align=False)
    print(f"ATE RMSE: {err:.3f} m (aligned), {err_na:.3f} m (raw)")
    summary.update(ate_m=err, ate_raw_m=err_na)
    d = kitti_drift(est, gt_positions[:n], est_q=np.stack(est_q),
                    gt_q=gt_quats[:n])
    if d["n_segments"]:
        print(f"KITTI drift: {d['t_rel_pct']:.3f}% translational, "
              f"{d['r_deg_per_m']:.5f} deg/m rotational")
        summary.update(t_rel_pct=d["t_rel_pct"], r_deg_per_m=d["r_deg_per_m"])
    if args.traj_out:
        with open(args.traj_out, "w") as f:
            for p in est:
                M = np.eye(4)
                M[:3, 3] = p
                f.write(" ".join(f"{v:.6e}" for v in M[:3].reshape(-1)) + "\n")
        print("trajectory written:", args.traj_out)
    metrics.close()
    return _gate_exit(args, summary)


def _apply_loop_pairs(args, driver):
    """Feed externally supplied loop candidates (--loop-pairs) through the
    driver's verification path (detectLoopClosureExternal analog)."""
    if not getattr(args, "loop_pairs", None) or driver is None:
        return
    if not hasattr(driver, "close_loop_external"):
        print("--loop-pairs: engine has no external loop entry point")
        return
    n_ok = n_all = 0
    with open(args.loop_pairs) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2 and not line.lstrip().startswith("#"):
                n_all += 1
                if driver.close_loop_external(int(parts[0]), int(parts[1])):
                    n_ok += 1
    print(f"external loop pairs: {n_ok}/{n_all} accepted")


def _slam_cfg(preset: str, pcfg):
    """SlamConfig for the graph engines, with the graph-side reference
    parameters applied for the *-ref presets (LeGO keyframe 0.3 m,
    mapOptmization.cpp:1634-1641; LIO-SAM loop params, params.yaml:82-87)."""
    from agi_lidar_slam_tpu.graph.loop_closure import LoopConfig
    from agi_lidar_slam_tpu.runtime.slam_pipeline import SlamConfig

    if preset in ("lego", "lego-ref"):
        return SlamConfig(pipeline=pcfg, kf_dist=0.3, kf_angle=0.2)
    if preset == "liosam-ref":
        from agi_lidar_slam_tpu.presets import LioSamRefParams

        rp = LioSamRefParams()
        return SlamConfig(
            pipeline=pcfg, kf_dist=rp.kf_dist, kf_angle=rp.kf_angle,
            loop=LoopConfig(radius=rp.loop_radius,
                            min_stamp_sep=300,  # 30 s at the 10 Hz scan rate
                            submap_half=rp.loop_submap // 2,
                            fitness_thresh=rp.loop_fitness),
        )
    return SlamConfig(pipeline=pcfg)


def _reloc_state(args, cfg):
    """Prior-map relocalization (S-FAST_LIO laserMapping_re.cpp:350,541-589):
    prefill the engine maps from a saved bundle and seed the pose from
    --init-pose (the init_pos/init_rot params)."""
    import jax.numpy as jnp

    from agi_lidar_slam_tpu.geometry import se3, so3
    from agi_lidar_slam_tpu.io.checkpoint import read_pcd, relocalize_state

    corner = read_pcd(os.path.join(args.load_map, "CornerMap.pcd"))
    surf = read_pcd(os.path.join(args.load_map, "SurfMap.pcd"))
    x, y, z, yaw = (float(v) for v in args.init_pose.split(","))
    pose = se3.Pose(so3.quat_exp(jnp.asarray([0.0, 0.0, float(np.deg2rad(yaw))])),
                    jnp.asarray([x, y, z]))
    print(f"relocalizing in {args.load_map}: {len(corner)} corner / "
          f"{len(surf)} surf map points, seed ({x}, {y}, {z}, {yaw} deg)")
    return relocalize_state(cfg, corner, surf, pose)


def _maybe_viz(args):
    if not getattr(args, "viz", None):
        return
    import subprocess

    cmd = [sys.executable, os.path.join(os.path.dirname(__file__), "visualize.py"),
           "--out", args.viz]
    if args.traj_out:
        cmd += ["--traj", args.traj_out]
    if args.metrics:
        cmd += ["--metrics", args.metrics]
    if args.save_map:
        cmd += ["--map", args.save_map]
    subprocess.run(cmd, check=False)


def _run_bag(args) -> int:
    """Stream a ROS1 bag through the chosen engine (the one-command analog of
    `roslaunch ... && rosbag play ...`, SURVEY.md section 4)."""
    import jax.numpy as jnp
    import numpy as np

    from agi_lidar_slam_tpu.io.bag_stream import bundle_to_grid, stream_bag
    from agi_lidar_slam_tpu.runtime.lio_pipeline import ImuWindow
    from agi_lidar_slam_tpu.runtime.metrics import MetricsWriter, StageTimer

    metrics = MetricsWriter(args.metrics)
    viz = _make_viz(args)
    timer = StageTimer()
    est = []
    n = 0
    t_start = time.perf_counter()
    stream = stream_bag(args.bag, lidar_topic=args.lidar_topic,
                        imu_topic=args.imu_topic, max_points=args.max_points,
                        gps_topic=args.gps_topic)

    def imu_win(b):
        return ImuWindow(jnp.asarray(b.imu_gyro), jnp.asarray(b.imu_acc),
                         jnp.asarray(b.imu_dt), jnp.asarray(b.imu_mask))

    n_gps_used = 0
    navsat = None
    if args.gps_topic and getattr(args, "navsat", False):
        from agi_lidar_slam_tpu.imu.navsat import NavsatFilter

        navsat = NavsatFilter()

    def gps_of(b):
        """Covariance-gated GPS fix for the factor graph (addGPSFactor's
        gpsCovThreshold gate, mapOptmization.cpp:1894-1896). Returns
        (position, information weight): the reference builds each factor's
        noise from the fix covariance floored at 1 m^2 (:1932-1941), so the
        weight is 1/max(var, 1).

        With --navsat the raw fixes first pass through the GPS+IMU ESKF
        (imu/navsat.py) — the robot_localization ekf_gps stage of the
        reference's launch graph — and the SMOOTHED odometry feeds the
        factor instead."""
        nonlocal n_gps_used
        if navsat is not None:
            fix = fix_cov = None
            if b.gps is not None:
                fix = np.asarray(b.gps, np.float32)
                fix_cov = (np.asarray(b.gps_cov, np.float32)
                           if b.gps_cov is not None else None)
            pos, cov = navsat.step(b.imu_gyro, b.imu_acc, b.imu_dt,
                                   b.imu_mask, fix=fix, fix_cov=fix_cov)
            var = float(np.max(np.asarray(cov)[:2]))
            if var > args.gps_cov_thresh:
                return None
            n_gps_used += 1
            return (pos, 1.0 / max(var, 1.0))
        if b.gps is None:
            return None
        var = 0.0
        if b.gps_cov is not None:
            var = float(np.max(b.gps_cov[:2]))
            if var > args.gps_cov_thresh:
                return None
        n_gps_used += 1
        return (jnp.asarray(np.asarray(b.gps, np.float32)),
                1.0 / max(var, 1.0))

    state = None
    driver = None
    if args.engine == "lio":
        from agi_lidar_slam_tpu.imu.eskf import static_init
        from agi_lidar_slam_tpu.runtime.lio_pipeline import (
            LioConfig, init_lio_state, process_lio_scan)

        blind = 0.0
        ext_t = None
        if args.preset == "avia-ref":
            from agi_lidar_slam_tpu.presets import (lio_config_avia_ref,
                                                    preset_sfastlio_avia_ref)

            cfg = lio_config_avia_ref()
            _, _, _, _, blind, ext_t = preset_sfastlio_avia_ref()
        else:
            cfg = LioConfig()
        reloc = None
        if args.load_map:
            from agi_lidar_slam_tpu.geometry import se3, so3
            from agi_lidar_slam_tpu.io.checkpoint import (read_pcd,
                                                          relocalize_lio_state)

            pts = read_pcd(os.path.join(args.load_map, "GlobalMap.pcd"))
            x, y, z, yaw = (float(v) for v in args.init_pose.split(","))
            seed = se3.Pose(
                so3.quat_exp(jnp.asarray([0.0, 0.0, float(np.deg2rad(yaw))])),
                jnp.asarray([x, y, z]))
            reloc = (pts, seed)
            print(f"relocalizing in {args.load_map}: {len(pts)} map points, "
                  f"seed ({x}, {y}, {z}, {yaw} deg)")
        for b in stream:
            win = imu_win(b)
            if state is None:
                x0 = static_init(win.gyro, win.acc, win.mask)
                if ext_t is not None:  # avia.yaml extrinsic_T (frozen:
                    # extrinsic_est_en false, so seed it exactly)
                    x0 = x0._replace(t_li=jnp.asarray(ext_t, jnp.float32))
                state = init_lio_state(cfg, x0)
                if reloc is not None:
                    from agi_lidar_slam_tpu.io.checkpoint import \
                        relocalize_lio_state

                    state = relocalize_lio_state(cfg, reloc[0], reloc[1])
                    # keep the static-init gravity/bias estimates, seed the pose
                    state = state._replace(
                        x=x0._replace(p=state.x.p, q=state.x.q))
            pmask = jnp.asarray(b.mask)
            if blind > 0.0:  # blind-zone removal (avia.yaml preprocess.blind)
                pmask = pmask & (
                    jnp.linalg.norm(jnp.asarray(b.xyz), axis=-1) > blind)
            with timer.stage("scan"):
                state, res = process_lio_scan(
                    state, jnp.asarray(b.xyz), jnp.asarray(b.rel_time),
                    pmask, win, cfg)
            est.append(np.asarray(res.x.p))
            metrics.log_scan(n, res, timer.last_ms)
            _viz_pub(viz, res, (b.xyz, b.mask))
            n += 1
            if args.max_scans and n >= args.max_scans:
                break
        final_state = state
    elif args.engine == "livox":
        from agi_lidar_slam_tpu.runtime.livox_pipeline import LivoxConfig, LivoxDriver

        if args.preset == "horizon-ref":
            from agi_lidar_slam_tpu.presets import livox_config_horizon_ref

            cfg = livox_config_horizon_ref()
        else:
            cfg = LivoxConfig()
        if args.imu_mode != 2:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, imu_mode=args.imu_mode)
        rings = args.rings or 6
        driver = LivoxDriver(cfg)
        for b in stream:
            grid = bundle_to_grid(b, rings, args.width, args.fov_up, args.fov_down)
            with timer.stage("scan"):
                res = driver.process(grid, imu_win(b))
            est.append(np.asarray(res.pose.t))
            metrics.log_scan(n, res, timer.last_ms)
            _viz_pub(viz, res, grid)
            n += 1
            if args.max_scans and n >= args.max_scans:
                break
        final_state = driver.state
    elif args.engine == "liosam":
        from agi_lidar_slam_tpu.runtime.liosam_pipeline import (
            LioSamConfig, LioSamDriver)

        pcfg = _pipeline_cfg(args.preset)
        if args.preset == "liosam-ref":
            from agi_lidar_slam_tpu.presets import LioSamRefParams

            rp = LioSamRefParams()
            cfg = LioSamConfig(slam=_slam_cfg(args.preset, pcfg),
                               imu_noise=rp.imu_noise())
        else:
            cfg = LioSamConfig(slam=_slam_cfg(args.preset, pcfg))
        rings = args.rings or 16
        driver = LioSamDriver(cfg, emit_imu_rate=bool(args.imu_rate_out))
        for b in stream:
            grid = bundle_to_grid(b, rings, args.width, args.fov_up, args.fov_down)
            with timer.stage("scan"):
                res = driver.process(grid, imu_win(b), gps=gps_of(b))
            est.append(np.asarray(res.pose.t))
            metrics.log_scan(n, res, timer.last_ms)
            _viz_pub(viz, res, grid)
            n += 1
            if args.max_scans and n >= args.max_scans:
                break
        driver.finalize()
        final_state = driver.state.engine
        if args.imu_rate_out:
            qs = np.stack([np.asarray(q) for q, p, m in driver.imu_rate_out])
            ps = np.stack([np.asarray(p) for q, p, m in driver.imu_rate_out])
            ms = np.stack([np.asarray(m) for q, p, m in driver.imu_rate_out])
            np.savez(args.imu_rate_out, q=qs, p=ps, mask=ms)
            print("imu-rate pose stream written:", args.imu_rate_out,
                  f"({int(ms.sum())} poses)")
    else:  # odom / slam on bag clouds (no IMU needed)
        import dataclasses

        from agi_lidar_slam_tpu.runtime.pipeline import init_state, process_scan
        from agi_lidar_slam_tpu.runtime.slam_pipeline import SlamConfig, SlamDriver

        def _grid_health_check(b, grid, n):
            """A grid binned at the wrong --width/--rings drops points or
            scatters them too sparsely for the 11-point curvature windows —
            the engine then free-wheels at identity with zero features.
            Catch it on the first scan instead of after a silent full run."""
            if n != 0:
                return
            n_pts = int(np.asarray(b.mask).sum())
            occ = int(np.asarray(grid.mask).sum())
            rows = int(np.asarray(grid.mask).any(axis=1).sum())
            if n_pts and occ < 0.5 * n_pts:
                print(f"WARNING: only {occ}/{n_pts} bag points landed in the "
                      f"{grid.mask.shape[0]}x{grid.mask.shape[1]} grid — "
                      "check --rings/--width/--fov-up/--fov-down against the "
                      "sensor (collisions/out-of-fov points are dropped)",
                      file=sys.stderr)
            if rows and occ / (rows * grid.mask.shape[1]) < 0.6:
                ppr = occ // max(rows, 1)
                print(f"WARNING: occupied grid rows are only "
                      f"{100 * occ // (rows * grid.mask.shape[1])}% filled — "
                      "curvature windows need contiguous returns; if feature "
                      f"counts stay 0, try --width {max(64, ppr)} (the "
                      "sensor's points-per-ring)", file=sys.stderr)

        def _feature_health_check(res, n):
            if n == 2 and int(res.stats.n_corner) + int(res.stats.n_surf) == 0:
                print("WARNING: zero features after 3 scans — the engine is "
                      "free-wheeling. Usually a grid-binning mismatch: set "
                      "--width to the sensor's points-per-ring and --rings/"
                      "--fov-* to its geometry", file=sys.stderr)

        pcfg = _pipeline_cfg(args.preset)
        # LeGO with an IMU stream in the bag: IMU-interpolated deskew
        # (adjustDistortion, featureAssociation.cpp:617-806) replaces the
        # solver's constant-velocity model — the gyro track captures
        # non-uniform intra-sweep rotation the CV model cannot
        use_imu_deskew = (args.preset in ("lego", "lego-ref")
                          and not args.no_imu_deskew)
        if use_imu_deskew:
            from agi_lidar_slam_tpu.imu.deskew import deskew_imu_rotation

            pcfg = dataclasses.replace(pcfg, deskew=False)
        rings = args.rings or 16
        if args.engine == "slam":
            driver = SlamDriver(_slam_cfg(args.preset, pcfg))
            if args.load_map:
                driver.state = driver.state._replace(
                    engine=_reloc_state(args, pcfg))
        elif args.load_map:
            state = _reloc_state(args, pcfg)
        else:
            state = init_state(pcfg)
        imu_rate_acc = []  # (qs, ps, mask) per scan when --imu-rate-out
        for b in stream:
            grid = bundle_to_grid(b, rings, args.width, args.fov_up, args.fov_down)
            _grid_health_check(b, grid, n)
            if use_imu_deskew and bool(np.any(b.imu_mask)):
                from agi_lidar_slam_tpu.geometry import so3 as _so3

                win = imu_win(b)
                cur = driver.state.engine if driver is not None else state
                # constant-velocity translation prior in the sweep-start frame
                rel_t = _so3.quat_rotate(_so3.quat_conj(cur.pose.q),
                                         cur.pose.t - cur.prev_pose.t)
                grid = deskew_imu_rotation(grid, win.gyro, win.dt, win.mask, rel_t)
            with timer.stage("scan"):
                if driver is not None:
                    res = driver.process(grid, gps=gps_of(b))
                else:
                    state, res = process_scan(state, grid, pcfg)
            est.append(np.asarray(res.pose.t))
            if args.imu_rate_out and bool(np.any(b.imu_mask)):
                # TransformFusion analog for the LiDAR-only engines
                # (transformFusion.cpp:35-288): scan-rate pose + gyro-track
                # rotation + constant-velocity translation at IMU rate
                from agi_lidar_slam_tpu.imu.deskew import fuse_imu_rate

                cur = driver.state.engine if driver is not None else state
                dt_sweep = float(np.sum(np.where(b.imu_mask, b.imu_dt, 0.0)))
                v_w = ((np.asarray(cur.pose.t) - np.asarray(cur.prev_pose.t))
                       / max(dt_sweep, 1e-3))
                win = imu_win(b)
                imu_rate_acc.append(fuse_imu_rate(
                    cur.pose.q, cur.pose.t, jnp.asarray(v_w, jnp.float32),
                    win.gyro, win.dt, win.mask))
            _feature_health_check(res, n)
            metrics.log_scan(n, res, timer.last_ms)
            _viz_pub(viz, res, grid)
            n += 1
            if args.max_scans and n >= args.max_scans:
                break
        if driver is not None:
            driver.finalize()
            _apply_loop_pairs(args, driver)
        final_state = driver.state.engine if driver is not None else state
        if args.imu_rate_out and imu_rate_acc:
            qs = np.stack([np.asarray(q) for q, p, m in imu_rate_acc])
            ps = np.stack([np.asarray(p) for q, p, m in imu_rate_acc])
            ms = np.stack([np.asarray(m) for q, p, m in imu_rate_acc])
            np.savez(args.imu_rate_out, q=qs, p=ps, mask=ms)
            print("imu-rate pose stream written:", args.imu_rate_out,
                  f"({int(ms.sum())} poses)")

    wall = time.perf_counter() - t_start
    if n == 0:
        print("no lidar messages found in bag")
        return 1
    est = np.stack(est)
    print(f"processed {n} scans in {wall:.2f}s ({n / wall:.2f} scans/s)")
    print("stage timing:", timer.summary())
    if args.gps_topic:
        print(f"gps factors added: {n_gps_used}")
    if args.traj_out:
        with open(args.traj_out, "w") as f:
            for p in est:
                M = np.eye(4)
                M[:3, 3] = p
                f.write(" ".join(f"{v:.6e}" for v in M[:3].reshape(-1)) + "\n")
        print("trajectory written:", args.traj_out)
    if args.save_map and args.engine in ("odom", "slam", "liosam"):
        from agi_lidar_slam_tpu.io.checkpoint import save_map_bundle

        save_map_bundle(args.save_map, final_state, trajectory=est)
        print("maps written:", args.save_map)
    elif args.save_map and args.engine == "lio":
        from agi_lidar_slam_tpu.io.checkpoint import export_pcd, map_to_points

        os.makedirs(args.save_map, exist_ok=True)
        export_pcd(os.path.join(args.save_map, "GlobalMap.pcd"),
                   map_to_points(final_state.map))
        export_pcd(os.path.join(args.save_map, "trajectory.pcd"), est)
        print("maps written:", args.save_map)
    metrics.close()
    _maybe_viz(args)
    # bag runs carry no ground truth; the gate covers scan count/throughput
    # (an envelope naming an accuracy metric fails loudly, never vacuously)
    return _gate_exit(args, {"n_scans": n, "scans_per_s": n / wall})


if __name__ == "__main__":
    raise SystemExit(main())
