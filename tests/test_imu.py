import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.geometry import so3
from agi_lidar_slam_tpu.imu.eskf import EskfNoise, NavState, boxminus, boxplus, predict
from agi_lidar_slam_tpu.imu.preintegration import bias_corrected, preintegrate
from agi_lidar_slam_tpu.sim.trajectory import G, circle_imu, circle_pose, circle_velocity


def window(gyro_fn, acc_fn, n, dt):
    ts = jnp.arange(n) * dt
    gyro = jnp.stack([gyro_fn(t) for t in ts])
    acc = jnp.stack([acc_fn(t) for t in ts])
    return gyro, acc, jnp.full((n,), dt), jnp.ones((n,), dtype=bool)


class TestPreintegration:
    def test_pure_rotation(self):
        w = jnp.asarray([0.0, 0.0, 0.5])
        gyro, acc, dts, mask = window(lambda t: w, lambda t: jnp.zeros(3), 100, 0.01)
        pre = preintegrate(gyro, acc, dts, mask, jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(so3.quat_log(pre.dq), w * 1.0, atol=1e-4)
        np.testing.assert_allclose(pre.dp, 0.0, atol=1e-6)

    def test_constant_acceleration(self):
        a = jnp.asarray([1.0, 0.0, 0.0])
        gyro, acc, dts, mask = window(lambda t: jnp.zeros(3), lambda t: a, 100, 0.01)
        pre = preintegrate(gyro, acc, dts, mask, jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(pre.dv, a * 1.0, atol=1e-4)
        np.testing.assert_allclose(pre.dp, 0.5 * a * 1.0**2, atol=1e-3)

    def test_masked_samples_skipped(self):
        a = jnp.asarray([1.0, 0.0, 0.0])
        gyro = jnp.zeros((10, 3))
        acc = jnp.tile(a, (10, 1))
        dts = jnp.full((10,), 0.1)
        mask = jnp.arange(10) < 5  # only first 0.5 s valid
        pre = preintegrate(gyro, acc, dts, mask, jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(pre.dt, 0.5, atol=1e-6)
        np.testing.assert_allclose(pre.dv, a * 0.5, atol=1e-5)

    def test_bias_correction_first_order(self):
        w = jnp.asarray([0.1, -0.2, 0.3])
        a = jnp.asarray([0.5, 1.0, -0.5])
        gyro, acc, dts, mask = window(lambda t: w, lambda t: a, 50, 0.01)
        pre0 = preintegrate(gyro, acc, dts, mask, jnp.zeros(3), jnp.zeros(3))
        dbg = jnp.asarray([0.01, -0.005, 0.002])
        dba = jnp.asarray([-0.01, 0.02, 0.005])
        # exact re-integration at the new bias
        pre1 = preintegrate(gyro, acc, dts, mask, dbg, dba)
        dq_c, dp_c, dv_c = bias_corrected(pre0, dbg, dba)
        np.testing.assert_allclose(
            so3.quat_log(dq_c), so3.quat_log(pre1.dq), atol=2e-4
        )
        np.testing.assert_allclose(dv_c, pre1.dv, atol=2e-3)
        np.testing.assert_allclose(dp_c, pre1.dp, atol=2e-3)

    def test_covariance_grows(self):
        gyro, acc, dts, mask = window(lambda t: jnp.zeros(3), lambda t: jnp.zeros(3), 100, 0.01)
        pre = preintegrate(gyro, acc, dts, mask, jnp.zeros(3), jnp.zeros(3))
        diag = np.diag(np.asarray(pre.cov))
        assert (diag[:9] > 0).all()
        evals = np.linalg.eigvalsh(np.asarray(pre.cov))
        assert evals.min() > -1e-8  # PSD


class TestEskfPropagation:
    def test_tracks_circle_exactly(self):
        radius, omega = 5.0, 0.4
        dt, n = 0.005, 400  # 2 s
        x = NavState.identity()
        x = x._replace(v=circle_velocity(0.0, radius, omega))
        P = jnp.eye(24) * 1e-6
        for i in range(n):
            t = i * dt + dt / 2  # midpoint sampling for 2nd-order accuracy
            gy, ac = circle_imu(t, radius, omega)
            x, P = predict(x, P, gy, ac, dt, EskfNoise())
        gt = circle_pose(n * dt, radius, omega)
        np.testing.assert_allclose(np.asarray(x.p), np.asarray(gt.t), atol=2e-2)
        dq = so3.quat_log(so3.quat_mul(so3.quat_conj(gt.q), x.q))
        np.testing.assert_allclose(np.asarray(dq), 0.0, atol=5e-3)

    def test_zero_dt_noop(self):
        x = NavState.identity()
        P = jnp.eye(24)
        x2, P2 = predict(x, P, jnp.ones(3), jnp.ones(3), 0.0, EskfNoise())
        np.testing.assert_allclose(np.asarray(P2), np.asarray(P))
        np.testing.assert_allclose(np.asarray(x2.p), np.asarray(x.p))

    def test_boxplus_boxminus(self):
        x = NavState.identity()
        dx = 0.01 * jnp.arange(24, dtype=jnp.float32)
        x2 = boxplus(x, dx)
        np.testing.assert_allclose(np.asarray(boxminus(x2, x)), np.asarray(dx), atol=1e-5)


class TestBatchedPreintegrationParity:
    def test_matches_sequential_scan(self):
        """The associative-scan preintegrate must reproduce the step-by-step
        lax.scan recurrence (mean, covariance, bias Jacobian) bit-near."""
        from agi_lidar_slam_tpu.imu.preintegration import (preintegrate,
                                                           preintegrate_scan)

        rng = np.random.RandomState(11)
        N = 20
        gyro = jnp.asarray(rng.randn(N, 3) * 0.4, jnp.float32)
        acc = jnp.asarray(rng.randn(N, 3) * 2.0 + np.array([0, 0, 9.81]),
                          jnp.float32)
        dts = jnp.full((N,), 0.005)
        mask = jnp.asarray(rng.rand(N) > 0.2)
        bg = jnp.asarray([0.01, -0.02, 0.005])
        ba = jnp.asarray([-0.05, 0.02, 0.1])
        a = preintegrate(gyro, acc, dts, mask, bg, ba)
        b = preintegrate_scan(gyro, acc, dts, mask, bg, ba)
        np.testing.assert_allclose(np.asarray(a.dq), np.asarray(b.dq), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.dp), np.asarray(b.dp), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.dv), np.asarray(b.dv), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov),
                                   rtol=1e-3, atol=1e-9)
        np.testing.assert_allclose(np.asarray(a.J_bias), np.asarray(b.J_bias),
                                   rtol=1e-4, atol=1e-6)


class TestStaticInit:
    def test_recovers_bias_and_gravity(self):
        from agi_lidar_slam_tpu.runtime.lio_pipeline import static_init

        bg = jnp.asarray([0.01, -0.02, 0.005])
        acc = jnp.tile(jnp.asarray([0.0, 0.0, G]), (50, 1))
        gyro = jnp.tile(bg, (50, 1))
        x = static_init(gyro, acc, jnp.ones(50, dtype=bool))
        np.testing.assert_allclose(np.asarray(x.bg), np.asarray(bg), atol=1e-6)
        np.testing.assert_allclose(np.asarray(x.g), [0.0, 0.0, -9.81], atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
