"""LeGO-LOAM configuration: ground removal, cluster segmentation, two-step GN."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.config import preset_lego_vlp16
from agi_lidar_slam_tpu.eval.metrics import ate_rmse
from agi_lidar_slam_tpu.features.segmentation import (
    SegmentationConfig,
    ground_removal,
    segment_scan,
)
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.runtime.pipeline import run_sequence
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan


def make_scan(seed=0):
    world = default_world(seed=seed)
    p = se3.Pose.identity()
    return world, simulate_scan(world, p, p, rings=16, width=900)


class TestGroundRemoval:
    def test_ground_points_are_low(self):
        _, scan = make_scan()
        g = ground_removal(scan, SegmentationConfig())
        z = np.asarray(scan.xyz[..., 2])
        gm = np.asarray(g)
        assert gm.sum() > 500
        # ground slab top is at z = -1 in the sim world
        assert np.abs(z[gm] + 1.0).mean() < 0.1

    def test_walls_not_ground(self):
        world, scan = make_scan()
        g = ground_removal(scan, SegmentationConfig())
        xyz = np.asarray(scan.xyz)
        gm = np.asarray(g)
        # points above sensor height are never ground
        high = xyz[..., 2] > 0.5
        assert not (gm & high & np.asarray(scan.mask)).any()


class TestSegmentation:
    def test_pillars_form_valid_clusters(self):
        _, scan = make_scan()
        seg = segment_scan(scan)
        nonground = np.asarray(scan.mask & ~seg.ground)
        segm = np.asarray(seg.segmented)
        # most non-ground structure (walls, pillars) survives the size filter
        assert segm.sum() > 0.6 * nonground.sum()

    def test_sparse_speckle_rejected(self):
        # a scan of isolated random returns: no cluster reaches size 30
        import jax

        key = jax.random.PRNGKey(0)
        R, W = 16, 900
        xyz = jax.random.uniform(key, (R, W, 3), minval=-20, maxval=20)
        mask = jax.random.uniform(jax.random.PRNGKey(1), (R, W)) < 0.02
        from agi_lidar_slam_tpu.pointcloud.cloud import ScanGrid

        scan = ScanGrid(xyz, mask, jnp.zeros((R, W)))
        seg = segment_scan(scan)
        assert int(seg.segmented.sum()) < 0.2 * int(mask.sum())


class TestLegoPipeline:
    def test_two_step_tracks(self):
        world = default_world(seed=21)
        cfg = dataclasses.replace(preset_lego_vlp16(), deskew=False)
        poses = []
        q, t = so3.quat_identity(), jnp.zeros(3)
        for _ in range(15):
            poses.append(se3.Pose(q, t))
            q = so3.quat_normalize(so3.quat_mul(q, so3.quat_exp(jnp.asarray([0, 0, 0.03]))))
            t = t + so3.quat_rotate(q, jnp.asarray([0.35, 0.0, 0.0]))
        scans = [simulate_scan(world, p, p, rings=16, width=900, noise_std=0.005, seed=i)
                 for i, p in enumerate(poses)]
        state, results = run_sequence(scans, cfg)
        est = np.stack([np.asarray(r.pose.t) for r in results])
        gt = np.stack([np.asarray(p.t) for p in poses])
        err = ate_rmse(est, gt, align=False)
        assert err < 0.15, f"LeGO two-step ATE {err:.3f} m"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestTwoStepDegenerateFlag:
    def test_empty_map_reports_degenerate(self):
        """Regression (round-2 verdict): GnStats.degenerate was hardcoded
        False in the two-step solver even though _solve_subset clamps — the
        LIO-SAM-style covariance inflation consumer would never inflate."""
        from agi_lidar_slam_tpu.config import MapConfig, SolverConfig
        from agi_lidar_slam_tpu.estimators.two_step import solve_scan2map_two_step
        from agi_lidar_slam_tpu.map.hash_map import empty_map
        from agi_lidar_slam_tpu.pointcloud.cloud import PointBatch

        mcfg = MapConfig(log2_slots=10, sub_voxel=0.5, block_sub=2,
                         neighborhood="full27")
        cmap, smap = empty_map(mcfg), empty_map(mcfg)
        pts = PointBatch(jnp.zeros((32, 3)), jnp.ones((32,), bool))
        pose, stats = solve_scan2map_two_step(
            se3.Pose.identity(), pts, pts, cmap, smap, mcfg, mcfg,
            SolverConfig(n_outer=1, n_inner=1))
        # empty map -> zero correspondences -> every eigenvalue clamped
        assert bool(stats.degenerate)
