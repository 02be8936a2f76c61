import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.graph.keyframes import add_keyframe, empty_bank, should_add
from agi_lidar_slam_tpu.graph.pose_graph import (
    add_edge,
    between_measurement,
    empty_edges,
    solve_pose_graph,
)
from agi_lidar_slam_tpu.pointcloud.cloud import PointBatch


def make_ring_poses(n, radius=10.0):
    """Ground-truth poses around a circle (loop)."""
    th = jnp.linspace(0, 2 * jnp.pi, n, endpoint=False)
    t = jnp.stack([radius * jnp.cos(th), radius * jnp.sin(th), jnp.zeros_like(th)], -1)
    q = so3.quat_exp(jnp.stack([jnp.zeros_like(th), jnp.zeros_like(th), th + jnp.pi / 2], -1))
    return se3.Pose(q, t)


class TestPoseGraph:
    def test_odometry_chain_consistent(self):
        # perfect odometry edges, no noise: solver must keep the chain intact
        gt = make_ring_poses(12)
        edges = empty_edges(64)
        for k in range(11):
            z = between_measurement(se3.Pose(gt.q[k], gt.t[k]), se3.Pose(gt.q[k + 1], gt.t[k + 1]))
            edges = add_edge(edges, k, k + 1, z, 100.0, 100.0)
        out = solve_pose_graph(gt, jnp.int32(12), edges)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(gt.t), atol=1e-3)

    def test_loop_closure_corrects_drift(self):
        # odometry edges from drifted estimates + one exact loop edge:
        # the solve must pull the trajectory back toward ground truth
        n = 16
        gt = make_ring_poses(n)
        # simulate accumulated drift: rotate each subsequent relative pose a bit
        drift = so3.quat_exp(jnp.asarray([0.0, 0.0, 0.02]))
        est_q = [gt.q[0]]
        est_t = [gt.t[0]]
        for k in range(1, n):
            z = between_measurement(
                se3.Pose(gt.q[k - 1], gt.t[k - 1]), se3.Pose(gt.q[k], gt.t[k])
            )
            # corrupt the applied motion (but store clean edges from est chain below)
            zq = so3.quat_mul(z.q, drift)
            q = so3.quat_normalize(so3.quat_mul(est_q[-1], zq))
            t = est_t[-1] + so3.quat_rotate(est_q[-1], z.t)
            est_q.append(q)
            est_t.append(t)
        est = se3.Pose(jnp.stack(est_q), jnp.stack(est_t))

        edges = empty_edges(64)
        for k in range(1, n):
            z = between_measurement(
                se3.Pose(est.q[k - 1], est.t[k - 1]), se3.Pose(est.q[k], est.t[k])
            )
            edges = add_edge(edges, k - 1, k, z, 100.0, 100.0)
        # exact loop edge last->first (as ICP would give)
        z_loop = between_measurement(se3.Pose(gt.q[n - 1], gt.t[n - 1]), se3.Pose(gt.q[0], gt.t[0]))
        edges = add_edge(edges, n - 1, 0, z_loop, 400.0, 400.0)

        before = float(jnp.linalg.norm(est.t - gt.t, axis=-1).max())
        out = solve_pose_graph(est, jnp.int32(n), edges, n_gn_iters=10)
        # compare up to the gauge fixed at node 0
        after = float(jnp.linalg.norm(out.t - gt.t, axis=-1).max())
        assert after < before * 0.5, (before, after)

    def test_gps_factors_pin_positions(self):
        n = 8
        gt = make_ring_poses(n, radius=5.0)
        # start from a uniformly shifted estimate; GPS factors on several nodes
        est = se3.Pose(gt.q, gt.t + jnp.asarray([2.0, -1.0, 0.5]))
        edges = empty_edges(32)
        for k in range(1, n):
            z = between_measurement(se3.Pose(gt.q[k - 1], gt.t[k - 1]), se3.Pose(gt.q[k], gt.t[k]))
            edges = add_edge(edges, k - 1, k, z, 100.0, 100.0)
        for k in (0, 3, 6):
            edges = add_edge(edges, k, k, se3.Pose(so3.quat_identity(), gt.t[k]),
                             0.0, 50.0, kind=1)
        out = solve_pose_graph(est, jnp.int32(n), edges, n_gn_iters=10, anchor_weight=0.0)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(gt.t), atol=0.05)


class TestShardedPoseGraph:
    def test_matches_single_device_solve(self):
        from jax.sharding import Mesh

        from agi_lidar_slam_tpu.graph.pose_graph import sharded_solve_pose_graph

        gt = make_ring_poses(12)
        edges = empty_edges(64)  # divides 8 devices
        for k in range(11):
            z = between_measurement(se3.Pose(gt.q[k], gt.t[k]),
                                    se3.Pose(gt.q[k + 1], gt.t[k + 1]))
            edges = add_edge(edges, k, k + 1, z, 100.0, 100.0)
        # noisy start so the solve does real work
        noisy = se3.Pose(gt.q, gt.t + jnp.asarray(
            np.random.RandomState(0).randn(12, 3) * 0.2, jnp.float32))
        ref = solve_pose_graph(noisy, jnp.int32(12), edges)
        mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("dp",))
        out = sharded_solve_pose_graph(mesh, noisy, jnp.int32(12), edges)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q),
                                   rtol=1e-4, atol=1e-4)


class TestKeyframeBank:
    def test_gating_and_add(self):
        bank = empty_bank(8, 4, 4)
        pose = se3.Pose.identity()
        pb = PointBatch(jnp.zeros((4, 3)), jnp.ones(4, bool))
        assert bool(should_add(bank, pose))
        bank, idx = add_keyframe(bank, pose, pb, pb, jnp.int32(0), jnp.bool_(True))
        assert int(bank.count) == 1
        # too close: gate rejects
        near = se3.Pose(so3.quat_identity(), jnp.asarray([0.2, 0.0, 0.0]))
        assert not bool(should_add(bank, near))
        far = se3.Pose(so3.quat_identity(), jnp.asarray([2.0, 0.0, 0.0]))
        assert bool(should_add(bank, far))
        bank, _ = add_keyframe(bank, far, pb, pb, jnp.int32(5), jnp.bool_(True))
        assert int(bank.count) == 2
        np.testing.assert_allclose(np.asarray(bank.t[1]), [2.0, 0.0, 0.0])

    def test_capacity_limit(self):
        bank = empty_bank(2, 4, 4)
        pb = PointBatch(jnp.zeros((4, 3)), jnp.ones(4, bool))
        for k in range(4):
            pose = se3.Pose(so3.quat_identity(), jnp.asarray([2.0 * k, 0.0, 0.0]))
            bank, _ = add_keyframe(bank, pose, pb, pb, jnp.int32(k), jnp.bool_(True))
        assert int(bank.count) == 2


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
