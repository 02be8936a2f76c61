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
