"""ROS1 bag reader: round-trip against a hand-written bag file."""

import struct

import numpy as np
import pytest

from agi_lidar_slam_tpu.io.rosbag import (
    decode_imu,
    decode_livox_custom,
    decode_pointcloud2,
    read_messages,
)


def _header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        entry = k.encode() + b"=" + v
        out += struct.pack("<I", len(entry)) + entry
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _std_header(frame: str = "lidar") -> bytes:
    return struct.pack("<I", 0) + struct.pack("<II", 0, 0) + _string(frame)


def make_pc2(xyz: np.ndarray, intensity: np.ndarray) -> bytes:
    n = xyz.shape[0]
    fields = b""
    for j, name in enumerate(("x", "y", "z", "intensity")):
        fields += _string(name) + struct.pack("<IBI", j * 4, 7, 1)
    pts = np.concatenate([xyz.astype(np.float32),
                          intensity.astype(np.float32)[:, None]], axis=1)
    data = pts.tobytes()
    msg = (
        _std_header() + struct.pack("<II", 1, n) + struct.pack("<I", 4) + fields
        + b"\x00" + struct.pack("<II", 16, 16 * n)
        + struct.pack("<I", len(data)) + data + b"\x01"
    )
    return msg


def make_imu(gyro, acc) -> bytes:
    cov = np.zeros(9, np.float64).tobytes()
    return (
        _std_header("imu")
        + np.asarray([0, 0, 0, 1], np.float64).tobytes() + cov
        + np.asarray(gyro, np.float64).tobytes() + cov
        + np.asarray(acc, np.float64).tobytes() + cov
    )


def make_livox(xyz: np.ndarray) -> bytes:
    n = xyz.shape[0]
    rec = np.zeros(n, dtype=[("offset_time", "<u4"), ("x", "<f4"), ("y", "<f4"),
                             ("z", "<f4"), ("reflectivity", "u1"), ("tag", "u1"),
                             ("line", "u1")])
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rec["offset_time"] = np.arange(n) * 1000
    rec["line"] = np.arange(n) % 6
    return (
        _std_header("livox") + struct.pack("<Q", 123456789)
        + struct.pack("<I", n) + b"\x01" + b"\x00" * 3
        + struct.pack("<I", n) + rec.tobytes()
    )


def lz4_frame_stored(data: bytes) -> bytes:
    """Minimal valid LZ4 frame: stored (uncompressed) blocks + EndMark."""
    hdr = struct.pack("<I", 0x184D2204) + bytes([0x40, 0x40, 0x00])
    blocks = b""
    for i in range(0, len(data), 65536):
        c = data[i:i + 65536]
        blocks += struct.pack("<I", 0x80000000 | len(c)) + c
    return hdr + blocks + struct.pack("<I", 0)


def write_bag(path, messages, stamps=None, compression="none"):
    """messages: list of (conn_id, topic, msg_type, raw)."""
    chunk = b""
    seen = set()
    for k, (conn_id, topic, dtype, raw) in enumerate(messages):
        if conn_id not in seen:
            seen.add(conn_id)
            conn_data = _header({"topic": topic.encode(), "type": dtype.encode(),
                                 "md5sum": b"x", "message_definition": b""})
            chunk += _record({"op": b"\x07", "conn": struct.pack("<I", conn_id),
                              "topic": topic.encode()}, conn_data)
        # ROS 'time' wire layout: secs (u32 LE) then nsecs (u32 LE)
        if stamps is not None:
            secs = int(stamps[k])
            nsecs = int(round((stamps[k] - secs) * 1e9))
        else:
            secs, nsecs = 10, 500
        chunk += _record({"op": b"\x02", "conn": struct.pack("<I", conn_id),
                          "time": struct.pack("<II", secs, nsecs)}, raw)
    if compression == "lz4":
        payload = lz4_frame_stored(chunk)
    else:
        payload = chunk
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", len(seen)),
                         "chunk_count": struct.pack("<I", 1)}, b"\x00" * 8))
        f.write(_record({"op": b"\x05", "compression": compression.encode(),
                         "size": struct.pack("<I", len(chunk))}, payload))


class TestRosbag:
    def test_pointcloud2_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        xyz = rng.randn(500, 3).astype(np.float32)
        inten = rng.rand(500).astype(np.float32)
        path = str(tmp_path / "t.bag")
        write_bag(path, [(0, "/velodyne_points", "sensor_msgs/PointCloud2",
                          make_pc2(xyz, inten))])
        msgs = list(read_messages(path))
        assert len(msgs) == 1
        topic, dtype, stamp, raw = msgs[0]
        assert topic == "/velodyne_points" and dtype == "sensor_msgs/PointCloud2"
        assert abs(stamp - (10 + 500e-9)) < 1e-12  # secs + nsecs, not swapped
        out = decode_pointcloud2(raw)
        np.testing.assert_allclose(
            np.stack([out["x"], out["y"], out["z"]], 1), xyz, atol=1e-6)
        np.testing.assert_allclose(out["intensity"], inten, atol=1e-6)

    def test_imu_and_livox(self, tmp_path):
        path = str(tmp_path / "t2.bag")
        xyz = np.random.RandomState(1).randn(100, 3).astype(np.float32)
        write_bag(path, [
            (0, "/imu/data", "sensor_msgs/Imu", make_imu([0.1, -0.2, 0.3], [0, 0, 9.8])),
            (1, "/livox/lidar", "livox_ros_driver/CustomMsg", make_livox(xyz)),
        ])
        msgs = list(read_messages(path))
        assert [m[0] for m in msgs] == ["/imu/data", "/livox/lidar"]
        imu = decode_imu(msgs[0][3])
        np.testing.assert_allclose(imu["gyro"], [0.1, -0.2, 0.3])
        np.testing.assert_allclose(imu["acc"], [0, 0, 9.8])
        lv = decode_livox_custom(msgs[1][3])
        np.testing.assert_allclose(lv["xyz"], xyz, atol=1e-6)
        assert lv["timebase"] == 123456789

    def test_lz4_chunk_roundtrip(self, tmp_path):
        rng = np.random.RandomState(3)
        xyz = rng.randn(400, 3).astype(np.float32)
        inten = rng.rand(400).astype(np.float32)
        path = str(tmp_path / "t4.bag")
        write_bag(path, [(0, "/pts", "sensor_msgs/PointCloud2",
                          make_pc2(xyz, inten))], compression="lz4")
        msgs = list(read_messages(path))
        assert len(msgs) == 1
        out = decode_pointcloud2(msgs[0][3])
        np.testing.assert_allclose(
            np.stack([out["x"], out["y"], out["z"]], 1), xyz, atol=1e-6)

    def test_lz4_compressed_block(self):
        # hand-crafted LZ4 block: 4 literals + match(offset 4, len 8) + final
        # 5 literals -> exercises the sequence decoder, not just stored blocks
        from agi_lidar_slam_tpu.io.rosbag import _lz4_decompress

        block = bytes([0x44]) + b"abcd" + struct.pack("<H", 4) \
            + bytes([0x50]) + b"hello"
        frame = (struct.pack("<I", 0x184D2204) + bytes([0x40, 0x40, 0x00])
                 + struct.pack("<I", len(block)) + block + struct.pack("<I", 0))
        out = _lz4_decompress(frame, 64)
        assert out == b"abcdabcdabcdhello"

    def test_topic_filter(self, tmp_path):
        path = str(tmp_path / "t3.bag")
        xyz = np.zeros((10, 3), np.float32)
        write_bag(path, [
            (0, "/a", "sensor_msgs/Imu", make_imu([0, 0, 0], [0, 0, 9.8])),
            (1, "/b", "livox_ros_driver/CustomMsg", make_livox(xyz)),
        ])
        msgs = list(read_messages(path, topics=["/b"]))
        assert len(msgs) == 1 and msgs[0][0] == "/b"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
