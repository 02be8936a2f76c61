import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.features.livox import LivoxFeatureConfig, extract_livox_features
from agi_lidar_slam_tpu.geometry import se3
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

CFG = LivoxFeatureConfig()


class TestLivoxFeatures:
    def test_three_classes_populated(self):
        world = default_world(seed=2)
        p = se3.Pose.identity()
        scan = simulate_scan(world, p, p, rings=16, width=900)
        f = extract_livox_features(scan, CFG)
        assert int(f.corners.mask.sum()) > 10
        assert int(f.surfs.mask.sum()) > 200
        assert int(f.others.mask.sum()) > 0

    def test_classes_disjoint_by_construction(self):
        world = default_world(seed=2)
        p = se3.Pose.identity()
        scan = simulate_scan(world, p, p, rings=16, width=900)
        f = extract_livox_features(scan, CFG)
        # surf and other voxelized point sets should not overlap heavily
        s = np.asarray(f.surfs.xyz[np.asarray(f.surfs.mask)])
        o = np.asarray(f.others.xyz[np.asarray(f.others.mask)])
        if len(s) and len(o):
            d = np.linalg.norm(s[:, None, :] - o[None, :, :], axis=-1).min(axis=1)
            assert (d < 0.05).mean() < 0.2

    def test_distance_adaptive_threshold(self):
        # the same physical corner far away must still be found: thresholds
        # scale with range so distant structure is not all classified corner
        world = default_world(seed=2, extent=40.0)
        p = se3.Pose.identity()
        scan = simulate_scan(world, p, p, rings=16, width=900, max_range=120.0)
        f = extract_livox_features(scan, CFG)
        c = np.asarray(f.corners.xyz[np.asarray(f.corners.mask)])
        r = np.linalg.norm(c, axis=1)
        # corners exist both near and far
        assert (r < 15).sum() > 5


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
