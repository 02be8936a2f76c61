"""A-LOAM scan-to-scan odometry stage + LIO failure detection."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.config import preset_sim16
from agi_lidar_slam_tpu.eval.metrics import ate_rmse
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.runtime.pipeline import run_sequence
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan


def make_jerky_trajectory(n, rng):
    """Non-constant velocity: random per-frame steps so the const-velocity
    prediction is systematically wrong — the case the odometry stage fixes."""
    poses = []
    q, t = so3.quat_identity(), jnp.zeros(3)
    for i in range(n):
        poses.append(se3.Pose(q, t))
        step = float(rng.uniform(0.1, 0.6))
        yaw = float(rng.uniform(-0.06, 0.06))
        q = so3.quat_normalize(so3.quat_mul(q, so3.quat_exp(jnp.asarray([0, 0, yaw]))))
        t = t + so3.quat_rotate(q, jnp.asarray([step, 0.0, 0.0]))
    return poses


class TestOdometryStage:
    def test_improves_jerky_motion(self):
        rng = np.random.RandomState(5)
        world = default_world(seed=15)
        poses = make_jerky_trajectory(14, rng)
        scans = [simulate_scan(world, p, p, rings=16, width=900, noise_std=0.005,
                               seed=200 + i) for i, p in enumerate(poses)]
        gt = np.stack([np.asarray(p.t) for p in poses])

        base = dataclasses.replace(preset_sim16(), deskew=False)
        with_odom = dataclasses.replace(base, odometry_stage=True)

        _, r0 = run_sequence(scans, base)
        _, r1 = run_sequence(scans, with_odom)
        e0 = ate_rmse(np.stack([np.asarray(r.pose.t) for r in r0]), gt, align=False)
        e1 = ate_rmse(np.stack([np.asarray(r.pose.t) for r in r1]), gt, align=False)
        # both should track; the odometry stage must not be worse
        assert e1 < 0.15, f"odom-stage ATE {e1:.3f}"
        assert e1 <= e0 * 1.5, (e0, e1)


class TestFailureDetection:
    def test_diverged_velocity_resets(self):
        from agi_lidar_slam_tpu.config import MapConfig
        from agi_lidar_slam_tpu.estimators.ieskf import IeskfConfig
        from agi_lidar_slam_tpu.imu.eskf import NavState
        from agi_lidar_slam_tpu.runtime.lio_pipeline import (
            ImuWindow, LioConfig, init_lio_state, process_lio_scan)

        cfg = LioConfig(map=MapConfig(sub_voxel=0.4, block_sub=4, log2_slots=14,
                                      neighborhood="full27"),
                        ieskf=IeskfConfig(), scan_voxel=0.3, max_scan_pts=2048)
        world = default_world(seed=1)
        p = se3.Pose.identity()
        scan = simulate_scan(world, p, p, rings=16, width=720)
        # absurd initial velocity triggers the failure detector
        x0 = NavState.identity()._replace(v=jnp.asarray([100.0, 0.0, 0.0]))
        state = init_lio_state(cfg, x0)
        M = 10
        win = ImuWindow(jnp.zeros((M, 3)), jnp.zeros((M, 3)),
                        jnp.full((M,), 0.01), jnp.ones((M,), bool))
        state, res = process_lio_scan(state, scan.xyz.reshape(-1, 3),
                                      jnp.zeros(16 * 720), scan.mask.reshape(-1),
                                      win, cfg)
        assert float(jnp.linalg.norm(res.x.v)) < 1.0  # reset fired
        assert bool(jnp.isfinite(res.x.p).all())


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
