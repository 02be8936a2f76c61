"""Integrated LIO-SAM configuration: IMU-coupled odometry + factor-graph
backend + IMU-rate pose stream (the reference's flagship full pipeline,
imuPreintegration.cpp + mapOptmization.cpp + transformFusion)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.config import MapConfig, SolverConfig, preset_sim16
from agi_lidar_slam_tpu.eval.metrics import ate_rmse
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.graph.loop_closure import LoopConfig
from agi_lidar_slam_tpu.runtime.lio_pipeline import ImuWindow
from agi_lidar_slam_tpu.runtime.liosam_pipeline import (
    LioSamConfig,
    LioSamDriver,
    imu_rate_poses,
    init_liosam_state,
    process_liosam_scan,
)
from agi_lidar_slam_tpu.runtime.slam_pipeline import SlamConfig
from agi_lidar_slam_tpu.sim.trajectory import circle_imu, circle_pose, circle_velocity
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

RADIUS, DT, M = 5.0, 0.2, 20


def make_cfg(loop_every=1000):
    pl = dataclasses.replace(preset_sim16(), deskew=False)  # engine's own flag unused here
    slam = SlamConfig(
        pipeline=pl, bank_capacity=128, edge_capacity=256,
        kf_dist=0.5, kf_angle=0.15,
        loop=LoopConfig(
            radius=3.0, min_stamp_sep=15, submap_half=4, fitness_thresh=0.3,
            min_matches=60,
            map_cfg=MapConfig(sub_voxel=0.3, block_sub=2, log2_slots=13,
                              neighborhood="full27"),
            solver=SolverConfig(n_outer=5, n_inner=3, surf_gate_sq=1.0,
                                corner_gate_sq=1.0, degen_eig_thresh=10.0),
        ),
        loop_every=loop_every,
    )
    return LioSamConfig(slam=slam, scan_period=DT, deskew=True)


def run_circle(cfg, omega, n_frames, world_seed=21, deskew_motion=True):
    world = default_world(seed=world_seed)
    x0 = circle_pose(0.0, RADIUS, omega)
    driver = LioSamDriver(cfg, x0=x0, v0=circle_velocity(0.0, RADIUS, omega),
                          emit_imu_rate=True)
    errs, gts = [], []
    for i in range(n_frames):
        t0, t1 = i * DT, (i + 1) * DT
        p0 = circle_pose(t0, RADIUS, omega)
        p1 = circle_pose(t1, RADIUS, omega)
        # sweep with real motion distortion p0 -> p1; engine deskews to end
        scan = simulate_scan(world, p0 if deskew_motion else p1, p1,
                             rings=16, width=900, noise_std=0.005, seed=70 + i)
        ts = t0 + (jnp.arange(M) + 0.5) * (DT / M)
        gy, ac = circle_imu(ts, RADIUS, omega)
        win = ImuWindow(gy, ac, jnp.full((M,), DT / M), jnp.ones((M,), bool))
        res = driver.process(scan, win)
        errs.append(float(jnp.linalg.norm(res.pose.t - p1.t)))
        gts.append(np.asarray(p1.t))
    driver.finalize()  # drain the in-flight loop detection
    return driver, errs, np.stack(gts)


class TestLioSamStep:
    def test_tracks_circle_with_imu_and_deskew(self):
        omega = 0.25
        driver, errs, _ = run_circle(make_cfg(), omega, 12)
        assert errs[-1] < 0.2, errs
        st = driver.state
        v_gt = circle_velocity(12 * DT, RADIUS, omega)
        assert float(jnp.linalg.norm(st.v - v_gt)) < 0.4
        assert int(st.engine.surf_map.num_points()) > 500

    def test_empty_map_first_frame_follows_imu(self):
        # degenerate mapping solve (empty map) -> inflated measurement noise
        # -> the fused pose must stay at the IMU prediction, not jump
        omega = 0.25
        cfg = make_cfg()
        x0 = circle_pose(0.0, RADIUS, omega)
        state = init_liosam_state(cfg, x0=x0,
                                  v0=circle_velocity(0.0, RADIUS, omega))
        world = default_world(seed=22)
        p1 = circle_pose(DT, RADIUS, omega)
        scan = simulate_scan(world, p1, p1, rings=16, width=900, seed=5)
        ts = (jnp.arange(M) + 0.5) * (DT / M)
        gy, ac = circle_imu(ts, RADIUS, omega)
        win = ImuWindow(gy, ac, jnp.full((M,), DT / M), jnp.ones((M,), bool))
        state2, res = process_liosam_scan(state, scan, win, cfg)
        assert bool(res.stats.degenerate)
        assert float(jnp.linalg.norm(res.pose.t - p1.t)) < 0.05  # exact IMU

    def test_imu_rate_stream_consistent(self):
        omega = 0.25
        driver, errs, gts = run_circle(make_cfg(), omega, 8)
        assert len(driver.imu_rate_out) == 8
        # block k predicts the interval ending at scan k's fused pose: its
        # last sample must land near the next ground-truth pose
        for k in range(2, 8):
            qs, ps, mask = driver.imu_rate_out[k]
            assert qs.shape == (M, 4) and ps.shape == (M, 3)
            gap = float(jnp.linalg.norm(ps[-1] - gts[k]))
            assert gap < 0.35, (k, gap)

    def test_loop_closure_fires_on_closed_circle(self):
        n = 40
        omega = float(2 * np.pi / (n * DT))
        driver, errs, gts = run_circle(make_cfg(loop_every=5), omega, n)
        assert driver.n_loops_closed >= 1, "no loop closure on a closed loop"
        nkf = int(driver.bank.count)
        assert nkf >= 10
        stamps = np.asarray(driver.bank.stamp[:nkf]) - 1
        gt = np.stack([np.asarray(circle_pose((s + 1) * DT, RADIUS, omega).t)
                       for s in stamps])
        err = ate_rmse(driver.trajectory(), gt, align=False)
        assert err < 0.35, f"keyframe ATE {err:.3f} m"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
