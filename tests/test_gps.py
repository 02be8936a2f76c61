"""GPS ingestion: bag decoders, ENU conversion, sweep pairing, and the
factor-graph path (LIO-SAM addGPSFactor, mapOptmization.cpp:1879-1957;
gpsTopic consumes robot_localization navsat odometry)."""

import numpy as np
import pytest

from agi_lidar_slam_tpu.io import bag_write as bw
from agi_lidar_slam_tpu.io import rosbag as rb
from agi_lidar_slam_tpu.io.bag_stream import stream_bag


class TestDecoders:
    def test_odometry_roundtrip(self):
        raw = bw.encode_odometry([1.5, -2.0, 0.25], cov_diag=(0.5,) * 6,
                                 stamp=3.25, frame="odom")
        m = rb.decode_odometry(raw)
        np.testing.assert_allclose(m["position"], [1.5, -2.0, 0.25])
        np.testing.assert_allclose(m["orientation"], [0, 0, 0, 1])
        np.testing.assert_allclose(np.diag(m["cov"]), 0.5)

    def test_navsatfix_roundtrip(self):
        raw = bw.encode_navsatfix([37.4, -122.1, 30.0], cov_diag=(1.0, 1.0, 4.0))
        m = rb.decode_navsatfix(raw)
        np.testing.assert_allclose(m["lla"], [37.4, -122.1, 30.0])
        np.testing.assert_allclose(np.diag(m["cov"]), [1.0, 1.0, 4.0])
        assert m["status"] == 0

    def test_lla_to_local_enu(self):
        origin = np.asarray([37.0, -122.0, 10.0])
        # ~1e-5 deg latitude = 1.11 m north; longitude scaled by cos(lat)
        p = rb.lla_to_local(np.asarray([37.00001, -122.00001, 12.0]), origin)
        assert abs(p[1] - 1.113) < 0.01  # north
        assert abs(p[0] + 1.113 * np.cos(np.deg2rad(37.0))) < 0.01  # east (west = neg)
        assert abs(p[2] - 2.0) < 1e-9


def _gps_bag(tmp_path, gps_msgs):
    """Bag: gps fix, sweep, sweep (no new fix), gps+gps, sweep."""
    xyz = np.random.RandomState(0).randn(40, 3).astype(np.float32) + 4.0
    pc = bw.encode_pointcloud2(xyz)
    msgs = []
    msgs.append((2, "/gps/odom", gps_msgs[0][0], 0.05, gps_msgs[0][1]))
    msgs.append((1, "/pts", "sensor_msgs/PointCloud2", 0.1, pc))
    msgs.append((1, "/pts", "sensor_msgs/PointCloud2", 0.2, pc))
    msgs.append((2, "/gps/odom", gps_msgs[1][0], 0.22, gps_msgs[1][1]))
    msgs.append((2, "/gps/odom", gps_msgs[2][0], 0.28, gps_msgs[2][1]))
    msgs.append((1, "/pts", "sensor_msgs/PointCloud2", 0.3, pc))
    path = str(tmp_path / "g.bag")
    bw.write_bag(path, msgs)
    return path


class TestStreamPairing:
    def test_odometry_gps_pairs_latest_fix_once(self, tmp_path):
        t = "nav_msgs/Odometry"
        path = _gps_bag(tmp_path, [
            (t, bw.encode_odometry([0, 0, 0], cov_diag=(1,) * 6)),
            (t, bw.encode_odometry([5, 0, 0], cov_diag=(1,) * 6)),
            (t, bw.encode_odometry([6, 1, 0], cov_diag=(9,) * 6)),
        ])
        bundles = list(stream_bag(path, max_points=64, gps_topic="/gps/odom"))
        assert len(bundles) == 3
        np.testing.assert_allclose(bundles[0].gps, [0, 0, 0])
        np.testing.assert_allclose(bundles[0].gps_cov, 1.0)
        assert bundles[1].gps is None  # fix consumed by sweep 0, none since
        # two fixes before sweep 2: the LATEST wins (one factor per fix;
        # LIO-SAM pops its gps deque the same way)
        np.testing.assert_allclose(bundles[2].gps, [6, 1, 0])
        np.testing.assert_allclose(bundles[2].gps_cov, 9.0)

    def test_gps_ignored_without_topic(self, tmp_path):
        t = "nav_msgs/Odometry"
        path = _gps_bag(tmp_path, [
            (t, bw.encode_odometry([0, 0, 0])),
            (t, bw.encode_odometry([5, 0, 0])),
            (t, bw.encode_odometry([6, 1, 0])),
        ])
        bundles = list(stream_bag(path, max_points=64))
        assert all(b.gps is None for b in bundles)

    def test_navsatfix_converts_to_enu(self, tmp_path):
        t = "sensor_msgs/NavSatFix"
        path = _gps_bag(tmp_path, [
            (t, bw.encode_navsatfix([37.0, -122.0, 10.0])),
            (t, bw.encode_navsatfix([37.0, -122.0, 10.0], status=-1)),  # no fix
            (t, bw.encode_navsatfix([37.00001, -122.0, 12.0])),
        ])
        bundles = list(stream_bag(path, max_points=64, gps_topic="/gps/odom"))
        np.testing.assert_allclose(bundles[0].gps, [0, 0, 0], atol=1e-9)
        assert bundles[1].gps is None  # STATUS_NO_FIX dropped
        assert abs(bundles[2].gps[1] - 1.113) < 0.01
        assert abs(bundles[2].gps[2] - 2.0) < 1e-9


class TestGpsFactors:
    def test_gps_edges_pull_graph_to_fixes(self):
        """A drifted odometry chain + exact GPS priors: the pose-graph solve
        must pull node positions onto the GPS track (the reference's
        gtsam::GPSFactor role)."""
        import jax.numpy as jnp

        from agi_lidar_slam_tpu.geometry import se3, so3
        from agi_lidar_slam_tpu.graph.pose_graph import (add_edge, empty_edges,
                                                         solve_pose_graph)
        from agi_lidar_slam_tpu.geometry.se3 import Pose

        n = 6
        gt = np.stack([np.asarray([i * 1.0, 0.0, 0.0]) for i in range(n)])
        edges = empty_edges(32)
        # anchor prior on node 0
        edges = add_edge(edges, 0, 0, se3.Pose(so3.quat_identity(), jnp.zeros(3)),
                         1e4, 1e4, kind=1)
        # odometry with a consistent lateral drift of 0.1 m/step
        for i in range(n - 1):
            z = se3.Pose(so3.quat_identity(), jnp.asarray([1.0, 0.1, 0.0]))
            edges = add_edge(edges, i, i + 1, z, 1e2, 1e2)
        # GPS priors on the last three nodes at the true positions
        for i in (n - 3, n - 2, n - 1):
            edges = add_edge(edges, i, i,
                             se3.Pose(so3.quat_identity(), jnp.asarray(gt[i])),
                             0.0, 1e3, kind=1)
        q0 = jnp.tile(so3.quat_identity()[None], (n, 1))
        t0 = jnp.asarray((gt + np.asarray([[0.0, 0.3, 0.0]])).astype(np.float32))
        sol = solve_pose_graph(Pose(q0, t0), jnp.int32(n), edges, n_gn_iters=10)
        t = np.asarray(sol.t)
        # GPS-anchored nodes land on the truth; drift is absorbed
        assert np.linalg.norm(t[-1] - gt[-1]) < 0.05, t
        assert np.linalg.norm(t[-2] - gt[-2]) < 0.05


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestGpsCovarianceWeighting:
    def test_high_variance_fix_pulls_less(self):
        """Per-fix covariance -> edge weight (mapOptmization.cpp:1932-1941:
        variance floored at 1 m^2 becomes the factor noise). A 25 m^2-variance
        fix must displace the graph less than a 1 m^2 one."""
        import jax.numpy as jnp

        from agi_lidar_slam_tpu.geometry import se3, so3
        from agi_lidar_slam_tpu.geometry.se3 import Pose
        from agi_lidar_slam_tpu.graph.pose_graph import (add_edge, empty_edges,
                                                         solve_pose_graph)

        def solve_with_weight(w):
            n = 4
            edges = empty_edges(16)
            edges = add_edge(edges, 0, 0,
                             se3.Pose(so3.quat_identity(), jnp.zeros(3)),
                             1e4, 1e4, kind=1)
            for i in range(n - 1):
                z = se3.Pose(so3.quat_identity(), jnp.asarray([1.0, 0.0, 0.0]))
                edges = add_edge(edges, i, i + 1, z, 1e2, 1e2)
            # GPS fix 1 m off the odometry chain on the last node
            edges = add_edge(edges, n - 1, n - 1,
                             se3.Pose(so3.quat_identity(),
                                      jnp.asarray([3.0, 1.0, 0.0])),
                             0.0, w, kind=1)
            q0 = jnp.tile(so3.quat_identity()[None], (n, 1))
            t0 = jnp.asarray([[i, 0.0, 0.0] for i in range(n)], jnp.float32)
            sol = solve_pose_graph(Pose(q0, t0), jnp.int32(n), edges,
                                   n_gn_iters=8)
            return float(np.asarray(sol.t)[-1, 1])

        pull_good = solve_with_weight(1.0)  # var 1 m^2
        pull_bad = solve_with_weight(1.0 / 25.0)  # var 25 m^2
        assert pull_good > 3.0 * pull_bad
        assert pull_good > 0.05

    def test_run_slam_gps_of_weight(self):
        """The bag harness converts fix covariance to 1/max(var,1)."""
        import sys
        sys.path.insert(0, "tools")
        # gps_of is a closure inside _run_bag; test the formula contract at the
        # driver level instead: a (pos, w) tuple flows through _gps_fix
        from agi_lidar_slam_tpu.runtime.slam_pipeline import SlamConfig, _gps_fix

        cfg = SlamConfig()
        pos, w = _gps_fix((np.asarray([1.0, 2.0, 3.0]), 0.04), cfg)
        assert abs(float(w) - 0.04) < 1e-9
        pos2, w2 = _gps_fix(np.asarray([1.0, 2.0, 3.0]), cfg)
        assert abs(float(w2) - cfg.gps_w_trans) < 1e-9
