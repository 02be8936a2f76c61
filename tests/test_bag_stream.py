"""Bag -> engine streaming: IMU/sweep pairing and the full bag->engine path.

The reference's validation protocol is `rosbag play` into the launch graph
(SURVEY.md section 4); these tests pin this engine's one-command equivalent:
a synthetic bag is written from simulator ground truth and streamed through
the pipeline, ready to point at real datasets.
"""

import struct

import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.io.bag_stream import bundle_to_grid, stream_bag
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

from test_rosbag import _std_header, _string, make_imu, make_livox, write_bag


def make_pc2_with_time(xyz: np.ndarray, rel_t: np.ndarray) -> bytes:
    n = xyz.shape[0]
    fields = b""
    for j, name in enumerate(("x", "y", "z", "time")):
        fields += _string(name) + struct.pack("<IBI", j * 4, 7, 1)
    pts = np.concatenate([xyz.astype(np.float32),
                          rel_t.astype(np.float32)[:, None]], axis=1)
    data = pts.tobytes()
    return (
        _std_header() + struct.pack("<II", 1, n) + struct.pack("<I", 4) + fields
        + b"\x00" + struct.pack("<II", 16, 16 * n)
        + struct.pack("<I", len(data)) + data + b"\x01"
    )


class TestStreamPairing:
    def test_imu_windows_align_to_sweeps(self, tmp_path):
        path = str(tmp_path / "s.bag")
        rng = np.random.RandomState(0)
        msgs, stamps = [], []
        t = 0.0
        # 6 imu, scan, 4 imu, scan
        for i in range(6):
            msgs.append((0, "/imu", "sensor_msgs/Imu",
                         make_imu([0.1 * i, 0, 0], [0, 0, 9.8])))
            stamps.append(t)
            t += 0.01
        msgs.append((1, "/pts", "sensor_msgs/PointCloud2",
                     make_pc2_with_time(rng.randn(50, 3).astype(np.float32),
                                        np.linspace(0, 0.1, 50))))
        stamps.append(t)
        for i in range(4):
            msgs.append((0, "/imu", "sensor_msgs/Imu",
                         make_imu([0, 0.2 * i, 0], [0, 0, 9.8])))
            stamps.append(t)
            t += 0.01
        msgs.append((1, "/pts", "sensor_msgs/PointCloud2",
                     make_pc2_with_time(rng.randn(30, 3).astype(np.float32),
                                        np.linspace(0, 0.1, 30))))
        stamps.append(t)
        write_bag(path, msgs, stamps=stamps)
        bundles = list(stream_bag(path, max_points=64, imu_capacity=16))
        assert len(bundles) == 2
        b0, b1 = bundles
        assert int(b0.imu_mask.sum()) == 6
        assert int(b1.imu_mask.sum()) == 4
        assert int(b0.mask.sum()) == 50 and int(b1.mask.sum()) == 30
        np.testing.assert_allclose(b0.imu_gyro[5], [0.5, 0, 0], atol=1e-9)
        np.testing.assert_allclose(b1.imu_gyro[3], [0, 0.6, 0], atol=1e-9)
        # per-point relative times survive
        assert abs(float(b0.rel_time[49]) - 0.1) < 1e-3
        # imu dt from stamps
        np.testing.assert_allclose(b0.imu_dt[:5], 0.01, atol=1e-6)

    def test_livox_bundle_and_grid(self, tmp_path):
        path = str(tmp_path / "l.bag")
        xyz = np.random.RandomState(1).randn(120, 3).astype(np.float32) + 5.0
        msgs = [(0, "/livox/lidar", "livox_ros_driver/CustomMsg", make_livox(xyz))]
        write_bag(path, msgs)
        bundles = list(stream_bag(path, max_points=256))
        assert len(bundles) == 1
        b = bundles[0]
        assert b.ring is not None
        assert int(b.mask.sum()) == 120
        grid = bundle_to_grid(b, rings=6, width=64)
        assert grid.xyz.shape == (6, 64, 3)
        # clustered azimuths collide heavily; enough distinct cells must land
        assert int(grid.mask.sum()) > 20


class TestBagToEngine:
    def test_sim_bag_through_odometry(self, tmp_path):
        """Full path: simulator scans serialized as PointCloud2 into a bag,
        streamed back, gridded, and tracked by the odometry engine."""
        from agi_lidar_slam_tpu.config import preset_sim16
        from agi_lidar_slam_tpu.runtime.pipeline import init_state, process_scan

        world = default_world(seed=15)
        q, t = so3.quat_identity(), jnp.zeros(3)
        msgs, stamps, gts = [], [], []
        tm = 0.0
        for i in range(6):
            p = se3.Pose(q, t)
            t2 = t + so3.quat_rotate(q, jnp.asarray([0.3, 0.0, 0.0]))
            scan = simulate_scan(world, p, p, rings=16, width=900,
                                 noise_std=0.005, seed=i)
            pts = np.asarray(scan.xyz[scan.mask])
            rel = np.asarray(scan.time[scan.mask]) * 0.1
            msgs.append((0, "/pts", "sensor_msgs/PointCloud2",
                         make_pc2_with_time(pts, rel)))
            stamps.append(tm)
            tm += 0.1
            gts.append(np.asarray(p.t))
            t = t2
        path = str(tmp_path / "sim.bag")
        write_bag(path, msgs, stamps=stamps, compression="lz4")

        cfg = preset_sim16()
        state = init_state(cfg)
        est = []
        for b in stream_bag(path, max_points=16384):
            grid = bundle_to_grid(b, rings=16, width=900,
                                  fov_up_deg=15.0, fov_down_deg=-15.0)
            state, res = process_scan(state, grid, cfg)
            est.append(np.asarray(res.pose.t))
        assert len(est) == 6
        err = np.linalg.norm(np.stack(est) - np.stack(gts), axis=1)
        assert err[-1] < 0.3, err


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestLegoImuDeskewPath:
    def test_bag_imu_deskew_into_two_step(self, tmp_path):
        """LeGO configuration fed from a bag with an IMU stream: the gyro
        track deskews each sweep (adjustDistortion analog) before the
        two-step engine; distorted rotating sweeps must still track."""
        import dataclasses

        from agi_lidar_slam_tpu.config import preset_lego_vlp16
        from agi_lidar_slam_tpu.imu.deskew import deskew_imu_rotation
        from agi_lidar_slam_tpu.runtime.pipeline import init_state, process_scan

        world = default_world(seed=4)
        T, wz = 0.1, 0.5  # strong yaw rate: 0.05 rad of intra-sweep rotation
        q, t = so3.quat_identity(), jnp.zeros(3)
        msgs, stamps, gts = [], [], []
        for i in range(8):
            p0 = se3.Pose(q, t)
            q2 = so3.quat_normalize(so3.quat_mul(q, so3.quat_exp(jnp.asarray([0, 0, wz * T]))))
            t2 = t + so3.quat_rotate(q2, jnp.asarray([0.25, 0.0, 0.0]))
            scan = simulate_scan(world, p0, se3.Pose(q2, t2), rings=16,
                                 width=600, noise_std=0.004, seed=i)
            m = np.asarray(scan.mask).reshape(-1)
            pts = np.asarray(scan.xyz).reshape(-1, 3)[m]
            rel = np.asarray(scan.time).reshape(-1)[m] * T
            msgs.append((1, "/pts", "sensor_msgs/PointCloud2",
                         make_pc2_with_time(pts, rel)))
            stamps.append(i * T)
            for k in range(10):
                msgs.append((2, "/imu", "sensor_msgs/Imu",
                             make_imu(np.array([0, 0, wz]), np.array([0, 0, 9.81]))))
                stamps.append(i * T + k * T / 10)
            gts.append(np.asarray(p0.t))
            q, t = q2, t2
        order = np.argsort(np.asarray(stamps), kind="stable")
        msgs = [msgs[i] for i in order]
        stamps = [stamps[i] for i in order]
        path = str(tmp_path / "lego.bag")
        write_bag(path, msgs, stamps=stamps)

        cfg = dataclasses.replace(preset_lego_vlp16(), deskew=False)
        state = init_state(cfg)
        est = []
        from agi_lidar_slam_tpu.runtime.lio_pipeline import ImuWindow

        for b in stream_bag(path, max_points=16384):
            grid = bundle_to_grid(b, rings=16, width=600,
                                  fov_up_deg=15.0, fov_down_deg=-15.0)
            win = ImuWindow(jnp.asarray(b.imu_gyro), jnp.asarray(b.imu_acc),
                            jnp.asarray(b.imu_dt), jnp.asarray(b.imu_mask))
            if bool(np.any(b.imu_mask)):
                rel_t = so3.quat_rotate(so3.quat_conj(state.pose.q),
                                        state.pose.t - state.prev_pose.t)
                grid = deskew_imu_rotation(grid, win.gyro, win.dt, win.mask, rel_t)
            state, res = process_scan(state, grid, cfg)
            est.append(np.asarray(res.pose.t))
        assert len(est) == 8
        err = np.linalg.norm(np.stack(est) - np.stack(gts), axis=1)
        assert err[-1] < 0.25, err


def make_pc2_custom(xyz: np.ndarray, extra_fields) -> bytes:
    """PointCloud2 with arbitrary extra per-point fields.
    extra_fields: list of (name, np_array, pf_datatype_code)."""
    n = xyz.shape[0]
    cols = [("x", xyz[:, 0].astype(np.float32), 7),
            ("y", xyz[:, 1].astype(np.float32), 7),
            ("z", xyz[:, 2].astype(np.float32), 7)] + list(extra_fields)
    fields = b""
    off = 0
    blobs = []
    for name, arr, code in cols:
        fields += _string(name) + struct.pack("<IBI", off, code, 1)
        blobs.append(arr)
        off += arr.dtype.itemsize
    step = off
    data = bytearray(step * n)
    off = 0
    for name, arr, code in cols:
        w = arr.dtype.itemsize
        raw = arr.tobytes()
        for i in range(n):
            data[i * step + off:i * step + off + w] = raw[i * w:(i + 1) * w]
        off += w
    data = bytes(data)
    return (
        _std_header() + struct.pack("<II", 1, n) + struct.pack("<I", len(cols))
        + fields + b"\x00" + struct.pack("<II", step, step * n)
        + struct.pack("<I", len(data)) + data + b"\x01"
    )


class TestPerLidarTimeConventions:
    """The reference ships DEDICATED per-lidar parsers with distinct time
    conventions (S-FAST_LIO preprocess.h:47-111). These tests encode each
    convention into a synthetic bag and pin that the stream recovers the
    true relative sweep times (VERDICT r3 missing #4)."""

    def _roundtrip(self, tmp_path, extra_fields, n=64):
        rng = np.random.RandomState(0)
        xyz = rng.randn(n, 3).astype(np.float32) + np.array([5, 0, 0])
        msgs = [(0, "/imu", "sensor_msgs/Imu",
                 make_imu(np.zeros(3), np.array([0, 0, 9.81])))]
        msgs.append((1, "/pts", "sensor_msgs/PointCloud2",
                     make_pc2_custom(xyz, extra_fields)))
        path = str(tmp_path / "conv.bag")
        write_bag(path, msgs)
        bundles = list(stream_bag(path, max_points=128))
        assert len(bundles) == 1
        b = bundles[0]
        return b.rel_time[b.mask]

    def test_ouster_t_uint32_ns(self, tmp_path):
        # Ouster: `t` uint32 nanoseconds from frame start (preprocess.h
        # oust64 handler divides by 1e9)
        n = 64
        t_ns = (np.linspace(0.0, 0.1, n, endpoint=False) * 1e9).astype(np.uint32)
        rel = self._roundtrip(tmp_path, [("intensity", np.ones(n, np.float32), 7),
                                         ("t", t_ns, 6),
                                         ("ring", np.zeros(n, np.uint16), 4)])
        np.testing.assert_allclose(rel, np.linspace(0.0, 0.1, n, endpoint=False),
                                   atol=1e-6)

    def test_robosense_timestamp_f64_absolute(self, tmp_path):
        # RoboSense: `timestamp` float64 ABSOLUTE epoch seconds per point
        # (preprocess.h rs handler subtracts the frame time). The old generic
        # ns-heuristic read epoch seconds as nanoseconds and collapsed the
        # sweep to ~0 s of deskew span.
        n = 64
        t_abs = 1.7e9 + np.linspace(0.0, 0.1, n, endpoint=False)
        rel = self._roundtrip(tmp_path, [("intensity", np.ones(n, np.float32), 7),
                                         ("timestamp", t_abs.astype(np.float64), 8)])
        np.testing.assert_allclose(rel, np.linspace(0.0, 0.1, n, endpoint=False),
                                   atol=1e-6)
        assert rel.max() > 0.05  # the regression: everything collapsed to ~0

    def test_velodyne_time_f32_relative(self, tmp_path):
        # Velodyne: `time` float32 seconds relative to the frame reference;
        # end-referenced drivers emit negative values — shifted to start at 0
        n = 64
        t_rel = np.linspace(-0.1, 0.0, n, endpoint=False).astype(np.float32)
        rel = self._roundtrip(tmp_path, [("intensity", np.ones(n, np.float32), 7),
                                         ("time", t_rel, 7),
                                         ("ring", np.zeros(n, np.uint16), 4)])
        np.testing.assert_allclose(rel, t_rel - t_rel.min(), atol=1e-6)
