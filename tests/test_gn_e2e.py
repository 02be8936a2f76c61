import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.config import preset_sim16
from agi_lidar_slam_tpu.estimators.gn_scan2map import solve_scan2map
from agi_lidar_slam_tpu.eval.metrics import ate_rmse
from agi_lidar_slam_tpu.features.curvature import extract_features
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.map.hash_map import empty_map, insert
from agi_lidar_slam_tpu.pointcloud.voxel import voxel_downsample
from agi_lidar_slam_tpu.runtime.pipeline import init_state, process_scan, run_sequence
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

CFG = preset_sim16()


def features_of(scan):
    feats = extract_features(scan, CFG.features)
    corners = voxel_downsample(
        feats.corners.xyz, feats.corners.mask, CFG.corner_ds_voxel, CFG.features.max_corners
    )
    surfs = voxel_downsample(
        feats.surfs.xyz, feats.surfs.mask, CFG.surf_ds_voxel, CFG.features.max_surfs
    )
    return corners, surfs


class TestScanToMapGN:
    def test_recovers_perturbed_pose(self):
        world = default_world()
        ident = se3.Pose.identity()
        scan = simulate_scan(world, ident, ident, rings=16, width=900)
        corners, surfs = features_of(scan)
        cmap = insert(empty_map(CFG.corner_map), corners.xyz, corners.mask, CFG.corner_map)
        smap = insert(empty_map(CFG.surf_map), surfs.xyz, surfs.mask, CFG.surf_map)
        guess = se3.Pose(
            so3.quat_exp(jnp.asarray([0.02, -0.03, 0.05])), jnp.asarray([0.3, -0.2, 0.1])
        )
        pose, stats = solve_scan2map(
            guess, corners, surfs, cmap, smap, CFG.corner_map, CFG.surf_map, CFG.solver
        )
        assert int(stats.n_surf) > 50
        np.testing.assert_allclose(np.asarray(pose.t), 0.0, atol=0.03)
        np.testing.assert_allclose(np.asarray(so3.quat_log(pose.q)), 0.0, atol=0.01)

    def test_empty_map_is_noop(self):
        world = default_world()
        ident = se3.Pose.identity()
        scan = simulate_scan(world, ident, ident, rings=16, width=900)
        corners, surfs = features_of(scan)
        guess = se3.Pose(so3.quat_identity(), jnp.asarray([1.0, 2.0, 3.0]))
        pose, stats = solve_scan2map(
            guess, corners, surfs, empty_map(CFG.corner_map), empty_map(CFG.surf_map),
            CFG.corner_map, CFG.surf_map, CFG.solver,
        )
        np.testing.assert_allclose(np.asarray(pose.t), [1.0, 2.0, 3.0], atol=1e-6)
        assert bool(stats.degenerate)


def make_trajectory(n, step=0.35, yaw_rate=0.02):
    """Ground-truth poses: forward motion with a slow turn."""
    poses = []
    q = so3.quat_identity()
    t = jnp.zeros(3)
    for _ in range(n):
        poses.append(se3.Pose(q, t))
        q = so3.quat_mul(q, so3.quat_exp(jnp.asarray([0.0, 0.0, yaw_rate])))
        q = so3.quat_normalize(q)
        fwd = so3.quat_rotate(q, jnp.asarray([step, 0.0, 0.0]))
        t = t + fwd
    return poses


class TestEndToEndOdometry:
    def test_rigid_scans_tracked(self):
        world = default_world(seed=1)
        poses = make_trajectory(20)
        cfg = dataclasses.replace(CFG, deskew=False)
        scans = [simulate_scan(world, p, p, rings=16, width=900) for p in poses]
        state, results = run_sequence(scans, cfg)
        est = np.stack([np.asarray(r.pose.t) for r in results])
        gt = np.stack([np.asarray(p.t) for p in poses])
        err = ate_rmse(est, gt, align=False)
        assert err < 0.08, f"ATE {err:.3f} m too high"

    def test_distorted_scans_with_deskew(self):
        world = default_world(seed=2)
        poses = make_trajectory(16, step=0.3)
        cfg = CFG  # deskew on
        scans = [
            simulate_scan(world, poses[i], poses[min(i + 1, len(poses) - 1)],
                          rings=16, width=900)
            for i in range(len(poses))
        ]
        state, results = run_sequence(scans, cfg)
        est = np.stack([np.asarray(r.pose.t) for r in results])
        gt = np.stack([np.asarray(p.t) for p in poses])
        err = ate_rmse(est, gt, align=False)
        assert err < 0.15, f"ATE {err:.3f} m too high with deskew"

    def test_state_shapes_stable(self):
        world = default_world()
        p = se3.Pose.identity()
        scan = simulate_scan(world, p, p, rings=16, width=900)
        state = init_state(CFG)
        s1, _ = process_scan(state, scan, CFG)
        s2, _ = process_scan(s1, scan, CFG)
        assert s1.corner_map.keys.shape == s2.corner_map.keys.shape
        assert int(s2.frame) == 2


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestChunkedDriver:
    def test_chunked_matches_sequential(self):
        """process_scan_chunk is the same computation as sequential
        process_scan calls — exact pose parity."""
        import jax.numpy as jnp

        from agi_lidar_slam_tpu.pointcloud.cloud import ScanGrid
        from agi_lidar_slam_tpu.runtime.pipeline import process_scan_chunk

        world = default_world(seed=5)
        poses = make_trajectory(6, step=0.3)
        scans = [simulate_scan(world, poses[i], poses[min(i + 1, 5)],
                               rings=16, width=900, seed=i)
                 for i in range(6)]
        s_state = init_state(CFG)
        seq = []
        for s in scans:
            s_state, res = process_scan(s_state, s, CFG)
            seq.append(np.asarray(res.pose.t))

        c_state = init_state(CFG)
        stacked = ScanGrid(
            jnp.stack([s.xyz for s in scans]),
            jnp.stack([s.mask for s in scans]),
            jnp.stack([s.time for s in scans]),
        )
        c_state, cres = process_scan_chunk(c_state, stacked, CFG)
        np.testing.assert_allclose(np.asarray(cres.pose.t), np.stack(seq),
                                   atol=1e-5)
