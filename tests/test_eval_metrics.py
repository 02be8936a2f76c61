"""Trajectory metrics: ATE alignment and the (round-2 fixed) SE(3) RPE."""

import numpy as np
import pytest

from agi_lidar_slam_tpu.eval.metrics import ate_rmse, rpe_rmse, umeyama_alignment


def _yaw_quats(yaws):
    return np.stack([np.zeros_like(yaws), np.zeros_like(yaws),
                     np.sin(yaws / 2), np.cos(yaws / 2)], axis=1)


class TestAte:
    def test_zero_on_rigid_transform(self):
        rng = np.random.RandomState(0)
        gt = np.cumsum(rng.randn(50, 3) * 0.1, axis=0)
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        est = gt @ R.T + np.array([3.0, -2.0, 1.0])
        assert ate_rmse(est, gt) < 1e-9

    def test_umeyama_recovers_rotation(self):
        rng = np.random.RandomState(1)
        gt = rng.randn(40, 3)
        th = -0.4
        Rz = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        est = gt @ Rz.T
        R, t, s = umeyama_alignment(est, gt)
        np.testing.assert_allclose(R @ Rz, np.eye(3), atol=1e-9)


class TestRpe:
    def test_heading_drift_scores_nonzero(self):
        # regression (round-1 bug): |de|-|dg| scored ~0 for a trajectory
        # drifting sideways at the correct SPEED. The fixed metric must not.
        n = 100
        gt = np.stack([np.arange(n, dtype=float), np.zeros(n), np.zeros(n)], 1)
        # estimate curves away at the same 1 m/frame speed
        ang = np.arange(n) * 0.01
        est = np.stack([np.cumsum(np.cos(ang)), np.cumsum(np.sin(ang)),
                        np.zeros(n)], 1)
        assert rpe_rmse(est, gt) > 0.01

    def test_zero_on_exact(self):
        rng = np.random.RandomState(2)
        traj = np.cumsum(rng.randn(30, 3) * 0.2, axis=0)
        assert rpe_rmse(traj, traj) < 1e-12

    def test_se3_form_invariant_to_global_rotation(self):
        # with orientations, deltas live in the local frame: a globally
        # rotated copy of the same trajectory has zero RPE against it
        n = 60
        yaw_g = np.arange(n) * 0.03
        gt = np.stack([np.cumsum(np.cos(yaw_g)), np.cumsum(np.sin(yaw_g)),
                       np.zeros(n)], 1)
        gq = _yaw_quats(yaw_g)
        th = 1.1
        Rz = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        est = gt @ Rz.T
        eq = _yaw_quats(yaw_g + th)
        assert rpe_rmse(est, gt, est_q=eq, gt_q=gq) < 1e-9
        # and a local-frame sideways drift is seen
        est2 = gt + np.stack([np.zeros(n), 0.05 * np.arange(n), np.zeros(n)], 1)
        assert rpe_rmse(est2, gt, est_q=gq, gt_q=gq) > 0.01


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestKittiDrift:
    def test_exact_scale_drift(self):
        """1% scale error along a straight line = exactly 1% translational
        drift at every segment length."""
        from agi_lidar_slam_tpu.eval.metrics import kitti_drift

        n = 1200
        gt = np.zeros((n, 3))
        gt[:, 0] = np.arange(n) * 1.0  # 1 m/frame, plenty of 800 m segments
        est = gt * 1.01
        out = kitti_drift(est, gt, step=50)
        assert out["n_segments"] > 0
        assert abs(out["t_rel_pct"] - 1.0) < 1e-6
        for L, pct in out["per_length"].items():
            assert abs(pct - 1.0) < 1e-6, (L, pct)

    def test_rotation_error_deg_per_m(self):
        """A constant heading bias of 0.01 rad held over every segment gives
        r_err = deg(0.01)/L per segment."""
        from agi_lidar_slam_tpu.eval.metrics import kitti_drift
        from agi_lidar_slam_tpu.geometry import so3
        import jax.numpy as jnp

        n = 400
        gt = np.zeros((n, 3))
        gt[:, 0] = np.arange(n) * 1.0
        qi = np.tile(np.asarray([0, 0, 0, 1.0]), (n, 1))
        qb = np.asarray(so3.quat_exp(jnp.asarray([0.0, 0.0, 0.01])))
        qe = np.tile(qb, (n, 1))
        out = kitti_drift(gt, gt, est_q=qe, gt_q=qi, lengths=(100.0, 200.0),
                          step=20)
        # E rotation == identity (bias cancels inside each segment)... unless
        # the bias is constant, in which case rel rotations match: r_err = 0
        assert out["r_deg_per_m"] < 1e-9

    def test_growing_yaw_is_penalized(self):
        from agi_lidar_slam_tpu.eval.metrics import kitti_drift
        from agi_lidar_slam_tpu.geometry import so3
        import jax.numpy as jnp

        n = 400
        gt = np.zeros((n, 3))
        gt[:, 0] = np.arange(n) * 1.0
        qi = np.tile(np.asarray([0, 0, 0, 1.0]), (n, 1))
        rate = 1e-4  # rad per frame (= per meter here)
        qe = np.stack([
            np.asarray(so3.quat_exp(jnp.asarray([0.0, 0.0, rate * i])))
            for i in range(n)
        ])
        out = kitti_drift(gt, gt, est_q=qe, gt_q=qi, lengths=(100.0,), step=20)
        # yaw grows rate rad/m -> r_err = deg(rate)/m
        assert abs(out["r_deg_per_m"] - np.degrees(rate)) < 1e-6


class TestMatToQuat:
    def test_round_trip(self):
        from agi_lidar_slam_tpu.eval.metrics import _quat_to_mat, mat_to_quat

        rng = np.random.RandomState(3)
        # random rotations via QR of random matrices (det fixed to +1)
        Rs = []
        for _ in range(32):
            Q, _ = np.linalg.qr(rng.randn(3, 3))
            if np.linalg.det(Q) < 0:
                Q[:, 2] *= -1
            Rs.append(Q)
        R = np.stack(Rs)
        R2 = _quat_to_mat(mat_to_quat(R))
        np.testing.assert_allclose(R2, R, atol=1e-9)

    def test_near_pi_rotations(self):
        from agi_lidar_slam_tpu.eval.metrics import _quat_to_mat, mat_to_quat

        # trace near -1 exercises the non-w pivots
        R = np.stack([
            np.diag([1.0, -1.0, -1.0]),
            np.diag([-1.0, 1.0, -1.0]),
            np.diag([-1.0, -1.0, 1.0]),
        ])
        np.testing.assert_allclose(_quat_to_mat(mat_to_quat(R)), R, atol=1e-9)


class TestKittiDriftRotational:
    def test_yaw_drift_reports_deg_per_m(self):
        from agi_lidar_slam_tpu.eval.metrics import kitti_drift

        # straight 1 m/frame ground truth; estimate yaws 0.001 rad/frame
        n = 1500
        gt = np.stack([np.arange(n, dtype=float), np.zeros(n), np.zeros(n)], 1)
        gt_q = _yaw_quats(np.zeros(n))
        yaw = 0.001 * np.arange(n)
        # integrate the yawing trajectory
        est = np.zeros((n, 3))
        est[1:] = np.cumsum(np.stack([np.cos(yaw[:-1]), np.sin(yaw[:-1]),
                                      np.zeros(n - 1)], 1), axis=0)
        d = kitti_drift(est, gt, est_q=_yaw_quats(yaw), gt_q=gt_q)
        assert d["n_segments"] > 0
        # 0.001 rad/m = 0.0573 deg/m
        assert abs(d["r_deg_per_m"] - np.degrees(0.001)) < 0.01
        assert np.isfinite(d["t_rel_pct"])
