"""High-rate fused pose output for the LiDAR-only engines (LeGO-LOAM
transformFusion.cpp:35-288 parity, VERDICT r2 item 7): gyro-track rotation +
constant-velocity translation composed onto the scan-rate fused pose."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.imu.deskew import fuse_imu_rate
from agi_lidar_slam_tpu.sim.trajectory import circle_imu, circle_pose, circle_velocity

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RADIUS, OMEGA, DT, M = 6.0, 0.4, 0.1, 25


class TestFuseImuRate:
    def test_stream_is_continuous_at_sweep_boundaries(self):
        """The stream launched from scan k's pose must land on scan k+1's
        pose (exact trajectory, exact gyro): the 200 Hz output is gap-free
        across sweep boundaries — the property transformFusion provides."""
        for k in range(3):
            t0, t1 = k * DT, (k + 1) * DT
            p0, p1 = circle_pose(t0, RADIUS, OMEGA), circle_pose(t1, RADIUS, OMEGA)
            v0 = circle_velocity(t0, RADIUS, OMEGA)
            ts = t0 + (jnp.arange(M) + 0.5) * (DT / M)
            gy, _ = circle_imu(ts, RADIUS, OMEGA)
            qs, ps, ok = fuse_imu_rate(p0.q, p0.t, v0, gy,
                                       jnp.full((M,), DT / M),
                                       jnp.ones((M,), bool))
            assert bool(ok.all())
            # last stream pose ~= next scan's pose (CV translation is 1st
            # order: O(v*omega*dt^2) ~ 5 mm here; rotation is exact)
            gap_t = float(jnp.linalg.norm(ps[-1] - p1.t))
            dq = so3.quat_mul(so3.quat_conj(qs[-1]), p1.q)
            gap_r = float(jnp.linalg.norm(so3.quat_log(dq)))
            assert gap_t < 0.02, gap_t
            assert gap_r < 1e-3, gap_r
            # intermediate poses interpolate the arc, not the chord: the
            # midpoint must match the true pose to first order
            mid = circle_pose(t0 + DT / 2, RADIUS, OMEGA)
            i = M // 2
            assert float(jnp.linalg.norm(ps[i] - mid.t)) < 0.03

    def test_masked_tail_freezes(self):
        p0 = se3.Pose.identity()
        gy = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
        mask = jnp.asarray([True] * 4 + [False] * 4)
        qs, ps, ok = fuse_imu_rate(p0.q, p0.t, jnp.asarray([1.0, 0, 0]),
                                   gy, jnp.full((8,), 0.01), mask)
        # masked samples advance neither rotation nor translation
        np.testing.assert_allclose(np.asarray(qs[4:]), np.asarray(qs[3:7]),
                                   atol=0)
        np.testing.assert_allclose(np.asarray(ps[4:]),
                                   np.tile(np.asarray(ps[3]), (4, 1)), atol=0)


@pytest.mark.nightly
def test_run_slam_lego_bag_emits_imu_rate_stream(tmp_path):
    """e2e: a synthetic lego bag run with --imu-rate-out writes the npz
    stream (the reference's 200 Hz fused TF, for the non-liosam engines)."""
    from agi_lidar_slam_tpu.io.bag_write import (encode_imu,
                                                 encode_pointcloud2, write_bag)
    from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

    world = default_world(seed=2)
    msgs = []
    t = 0.0
    for k in range(6):
        p0 = circle_pose(k * DT, RADIUS, OMEGA)
        p1 = circle_pose((k + 1) * DT, RADIUS, OMEGA)
        scan = simulate_scan(world, p0, p1, rings=16, width=720, seed=k)
        xyz = np.asarray(scan.xyz.reshape(-1, 3))
        m = np.asarray(scan.mask.reshape(-1))
        rel = np.asarray(scan.time.reshape(-1) * DT, np.float32)
        ring = np.repeat(np.arange(16, dtype=np.int32), 720)
        msgs.append((0, "/pts", "sensor_msgs/PointCloud2", t,
                     encode_pointcloud2(xyz[m], rel_time=rel[m],
                                        ring=ring[m], stamp=t)))
        for j in range(10):
            ti = k * DT + (j + 0.5) * DT / 10
            gy, ac = circle_imu(ti, RADIUS, OMEGA)
            msgs.append((1, "/imu", "sensor_msgs/Imu", t + (j + 0.5) * DT / 10,
                         encode_imu(np.asarray(gy), np.asarray(ac),
                                    stamp=t + (j + 0.5) * DT / 10)))
        t += DT
    bag = str(tmp_path / "lego.bag")
    write_bag(bag, sorted(msgs, key=lambda x: x[3]))

    out = str(tmp_path / "imu_rate.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_slam.py"),
         "--bag", bag, "--preset", "lego", "--width", "720",
         "--imu-rate-out", out],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(out), r.stdout
    z = np.load(out)
    assert z["q"].shape[0] >= 5 and z["q"].shape[2] == 4
    assert int(z["mask"].sum()) >= 50  # ~10 IMU poses per scan
    # unit quaternions, finite positions
    nrm = np.linalg.norm(z["q"][z["mask"].astype(bool)], axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-4)
    assert np.all(np.isfinite(z["p"]))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
