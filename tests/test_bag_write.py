"""Bag writer round-trip: io/bag_write -> io/rosbag -> io/bag_stream
(the library half of kittiHelper's to_bag mode)."""

import numpy as np

from agi_lidar_slam_tpu.io import rosbag as rb
from agi_lidar_slam_tpu.io.bag_stream import stream_bag
from agi_lidar_slam_tpu.io.bag_write import (encode_imu, encode_pointcloud2,
                                             write_bag)


def test_pointcloud2_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    inten = rng.uniform(0, 1, 500).astype(np.float32)
    rel = np.linspace(0, 0.1, 500, endpoint=False).astype(np.float32)
    ring = (np.arange(500) % 16).astype(np.int32)
    raw = encode_pointcloud2(xyz, intensity=inten, rel_time=rel, ring=ring,
                             stamp=12.5)
    path = str(tmp_path / "w.bag")
    write_bag(path, [(0, "/pts", "sensor_msgs/PointCloud2", 12.5, raw)])

    msgs = list(rb.read_messages(path))
    assert len(msgs) == 1
    topic, dtype, stamp, data = msgs[0]
    assert topic == "/pts" and dtype == "sensor_msgs/PointCloud2"
    assert abs(stamp - 12.5) < 1e-6
    f = rb.decode_pointcloud2(data)
    np.testing.assert_allclose(f["x"], xyz[:, 0], atol=0)
    np.testing.assert_allclose(f["intensity"], inten, atol=0)
    np.testing.assert_allclose(f["time"], rel, atol=0)
    np.testing.assert_array_equal(f["ring"], ring)


def test_imu_and_stream_bundles(tmp_path):
    rng = np.random.default_rng(1)
    msgs = []
    t = 0.0
    for k in range(5):
        msgs.append((1, "/imu", "sensor_msgs/Imu", t,
                     encode_imu([0.0, 0.0, 0.1 * k], [0.0, 0.0, 9.81],
                                stamp=t)))
        t += 0.02
    xyz = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    msgs.append((0, "/pts", "sensor_msgs/PointCloud2", t,
                 encode_pointcloud2(
                     xyz, rel_time=np.linspace(0, 0.1, 100).astype(np.float32),
                     stamp=t)))
    path = str(tmp_path / "w2.bag")
    write_bag(path, msgs)

    bundles = list(stream_bag(path, max_points=256, imu_capacity=16))
    assert len(bundles) == 1
    b = bundles[0]
    assert int(b.mask.sum()) == 100
    assert int(b.imu_mask.sum()) == 5
    np.testing.assert_allclose(b.imu_gyro[4], [0, 0, 0.4], atol=1e-7)
