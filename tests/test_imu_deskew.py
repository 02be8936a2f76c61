"""IMU-interpolated deskew (LeGO-LOAM adjustDistortion,
featureAssociation.cpp:617-806): gyro track integration + grid deskew."""

import jax.numpy as jnp
import numpy as np

from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.imu.deskew import deskew_imu_rotation, gyro_rotation_track
from agi_lidar_slam_tpu.pointcloud.cloud import ScanGrid
from agi_lidar_slam_tpu.runtime.pipeline import deskew_constant_velocity
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan


class TestGyroTrack:
    def test_constant_rate_matches_closed_form(self):
        M, dt = 25, 0.004
        w = jnp.array([0.1, -0.3, 0.8])
        gyro = jnp.tile(w, (M, 1))
        qs = gyro_rotation_track(gyro, jnp.full((M,), dt), jnp.ones((M,), bool))
        for i in [0, 5, M]:
            expect = so3.quat_exp(w * (i * dt))
            err = np.linalg.norm(np.asarray(so3.quat_log(
                so3.quat_mul(so3.quat_conj(qs[i]), expect))))
            assert err < 1e-5, (i, err)

    def test_varying_rate_fixed_axis(self):
        # about a fixed axis angles add exactly: q_i = exp(z * sum(w dt))
        M, dt = 30, 0.003
        rates = np.linspace(0.2, 2.0, M).astype(np.float32)
        gyro = np.zeros((M, 3), np.float32)
        gyro[:, 2] = rates
        qs = gyro_rotation_track(jnp.asarray(gyro), jnp.full((M,), dt),
                                 jnp.ones((M,), bool))
        angles = np.concatenate([[0.0], np.cumsum(rates * dt)])
        got = 2.0 * np.arctan2(np.asarray(qs[:, 3]), np.asarray(qs[:, 0]))
        np.testing.assert_allclose(got, angles, atol=1e-5)

    def test_masked_samples_freeze_track(self):
        M, dt = 10, 0.01
        gyro = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (M, 1))
        mask = jnp.arange(M) < 5
        qs = gyro_rotation_track(gyro, jnp.full((M,), dt), mask)
        np.testing.assert_allclose(np.asarray(qs[5]), np.asarray(qs[-1]),
                                   atol=1e-7)


class TestDeskew:
    def test_uniform_sweep_matches_constant_velocity(self):
        """For a truly uniform sweep the IMU track must reproduce the
        (round-1-validated) constant-velocity deskew."""
        world = default_world(seed=1)
        p0 = se3.Pose.identity()
        rel = se3.Pose(so3.quat_exp(jnp.array([0.0, 0.0, 0.2])),
                       jnp.array([0.5, 0.1, 0.0]))
        p1 = se3.compose(p0, rel)
        scan = simulate_scan(world, p0, p1, rings=16, width=600)

        M, T = 20, 0.1
        gyro = jnp.tile(jnp.array([0.0, 0.0, 0.2 / T]), (M, 1))
        dts = jnp.full((M,), T / M)
        out = deskew_imu_rotation(scan, gyro, dts, jnp.ones((M,), bool), rel.t)
        ref = deskew_constant_velocity(scan, rel)
        m = np.asarray(scan.mask)
        err = np.linalg.norm(np.asarray(out.xyz - ref.xyz), axis=-1)[m]
        assert err.max() < 2e-3, err.max()

    def test_nonuniform_rotation_beats_constant_velocity(self):
        """Sweep that yaws fast in the first half, slow in the second: the
        IMU track deskews it exactly; the constant-velocity model cannot."""
        R, W = 8, 400
        w1, w2, T = 3.0, 0.5, 0.1  # rad/s halves
        a_half = w1 * T / 2
        a_total = a_half + w2 * T / 2

        # per-column true pose: piecewise-linear yaw, no translation
        tau = np.arange(W, dtype=np.float32) / W
        yaw = np.where(tau < 0.5, w1 * T * tau,
                       a_half + w2 * T * (tau - 0.5)).astype(np.float32)

        # synthetic fixed world points, one random point per cell,
        # expressed in the instantaneous sensor frame at its column time
        rng = np.random.default_rng(0)
        pts_w = rng.uniform(-8, 8, size=(R, W, 3)).astype(np.float32)
        c, s = np.cos(yaw), np.sin(yaw)
        # sensor frame = world rotated by yaw: p_inst = Rz(yaw)^T p_w
        x = c[None, :] * pts_w[..., 0] + s[None, :] * pts_w[..., 1]
        y = -s[None, :] * pts_w[..., 0] + c[None, :] * pts_w[..., 1]
        xyz = np.stack([x, y, pts_w[..., 2]], axis=-1)
        scan = ScanGrid(jnp.asarray(xyz), jnp.ones((R, W), bool),
                        jnp.broadcast_to(jnp.asarray(tau)[None], (R, W)))

        M = 40
        rates = np.where(np.arange(M) < M // 2, w1, w2).astype(np.float32)
        gyro = np.zeros((M, 3), np.float32)
        gyro[:, 2] = rates
        out = deskew_imu_rotation(scan, jnp.asarray(gyro),
                                  jnp.full((M,), T / M), jnp.ones((M,), bool),
                                  jnp.zeros(3))
        err_imu = np.linalg.norm(np.asarray(out.xyz) - pts_w, axis=-1)

        rel = se3.Pose(so3.quat_exp(jnp.array([0.0, 0.0, a_total])),
                       jnp.zeros(3))
        cv = deskew_constant_velocity(scan, rel)
        err_cv = np.linalg.norm(np.asarray(cv.xyz) - pts_w, axis=-1)

        assert err_imu.max() < 0.01, err_imu.max()
        assert err_cv.mean() > 10.0 * max(err_imu.mean(), 1e-4), (
            err_cv.mean(), err_imu.mean())
