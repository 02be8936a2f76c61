"""Dynamic (moving-start) MAP initialization — gravity/velocity/bias recovery.

Reference behavior: LIO-Livox TryMAPInitialization (PoseEstimation.cpp:
189-377) solves gravity direction + per-frame velocities + biases from
LiDAR-odometry poses and IMU preintegrations over the init window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.imu.initialization import map_initialize
from agi_lidar_slam_tpu.imu.preintegration import preintegrate
from agi_lidar_slam_tpu.sim.trajectory import circle_imu, circle_pose, circle_velocity

RADIUS, OMEGA, DT, M = 6.0, 0.3, 0.2, 20


def make_window(F, bg_true, ba_true, omega=OMEGA):
    """F poses on the circle + F-1 preintegrations from biased exact IMU."""
    qs, ts = [], []
    pres = []
    for i in range(F):
        p = circle_pose(i * DT, RADIUS, omega)
        qs.append(p.q)
        ts.append(p.t)
    for i in range(F - 1):
        tt = i * DT + (jnp.arange(M) + 0.5) * (DT / M)
        gy, ac = circle_imu(tt, RADIUS, omega)
        gy = gy + bg_true[None, :]
        ac = ac + ba_true[None, :]
        pres.append(preintegrate(gy, ac, jnp.full((M,), DT / M),
                                 jnp.ones((M,), bool), jnp.zeros(3), jnp.zeros(3)))
    preints = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
    return jnp.stack(qs), jnp.stack(ts), preints


class TestMapInitialize:
    def test_recovers_gravity_velocity_zero_bias(self):
        qs, ts, preints = make_window(10, jnp.zeros(3), jnp.zeros(3))
        init = map_initialize(qs, ts, preints)
        assert bool(init.ok)
        np.testing.assert_allclose(np.asarray(init.grav), [0, 0, -9.81], atol=0.05)
        v_gt = np.stack([np.asarray(circle_velocity(i * DT, RADIUS, OMEGA))
                         for i in range(10)])
        np.testing.assert_allclose(np.asarray(init.v), v_gt, atol=0.1)
        assert float(jnp.linalg.norm(init.bg)) < 0.01
        assert float(jnp.linalg.norm(init.ba)) < 0.05

    def test_biased_imu_still_initializes(self):
        # gyro bias is exactly observable from rotations; accel bias is only
        # weakly observable in any short window (the window velocities absorb
        # it — VINS-class initializers skip ba for the same reason) and the
        # online window estimator owns it afterwards. Init must deliver exact
        # bg, near-true gravity, and a BOUNDED ba despite the biased IMU.
        bg = jnp.asarray([0.02, -0.01, 0.015])
        ba = jnp.asarray([0.05, -0.08, 0.04])
        qs, ts, preints = make_window(12, bg, ba, omega=1.2)
        init = map_initialize(qs, ts, preints)
        assert bool(init.ok)
        np.testing.assert_allclose(np.asarray(init.bg), np.asarray(bg), atol=0.005)
        np.testing.assert_allclose(np.asarray(init.grav), [0, 0, -9.81], atol=0.15)
        assert float(jnp.linalg.norm(init.ba)) < 0.3

    def test_low_rotation_window_stays_bounded(self):
        # at low rotation gravity/bias are collinear; the ba prior must keep
        # the solution sane (round-2 regression: free lstsq returned |ba|~30
        # and a wildly wrong gravity on exactly this geometry)
        ba = jnp.asarray([0.05, -0.08, 0.04])
        qs, ts, preints = make_window(8, jnp.zeros(3), ba)
        init = map_initialize(qs, ts, preints)
        assert bool(init.ok)
        assert float(jnp.linalg.norm(init.ba)) < 0.5
        # gravity direction still within a few degrees (bias leaks in bounded)
        cos = float(init.grav @ jnp.asarray([0., 0., -9.81])) / 9.81**2
        assert cos > 0.999

    def test_rejects_garbage(self):
        # IMU wildly inconsistent with the poses -> huge implied bias -> not ok
        qs, ts, preints = make_window(8, jnp.asarray([2.0, 0.0, 0.0]), jnp.zeros(3))
        init = map_initialize(qs, ts, preints)
        assert not bool(init.ok)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
