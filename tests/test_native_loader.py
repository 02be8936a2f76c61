"""Native C++ prefetching loader vs the pure-Python reference binning."""

import os

import numpy as np
import pytest

from agi_lidar_slam_tpu.io.native_loader import NativeKittiLoader, build_native
from agi_lidar_slam_tpu.pointcloud.cloud import grid_from_unorganized


def write_fake_scans(tmp_path, n_scans=4, n_pts=5000, seed=0):
    rng = np.random.RandomState(seed)
    paths = []
    for i in range(n_scans):
        r = rng.uniform(2.0, 60.0, n_pts)
        az = rng.uniform(-np.pi, np.pi, n_pts)
        el = np.deg2rad(rng.uniform(-24.0, 1.5, n_pts))
        pts = np.stack(
            [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az),
             r * np.sin(el), rng.uniform(0, 1, n_pts)], axis=1
        ).astype(np.float32)
        p = os.path.join(tmp_path, f"{i:06d}.bin")
        pts.tofile(p)
        paths.append(p)
    return paths


class TestNativeLoader:
    def test_builds(self):
        so = build_native()
        assert os.path.exists(so)

    def test_matches_python_binning(self, tmp_path):
        paths = write_fake_scans(tmp_path, n_scans=3)
        loader = NativeKittiLoader(paths, rings=64, width=900, fov_up=2.0,
                                   fov_down=-24.8, min_range=0.5)
        scans = list(loader)
        assert len(scans) == 3
        for i, scan in enumerate(scans):
            pts = np.fromfile(paths[i], dtype=np.float32).reshape(-1, 4)
            ref = grid_from_unorganized(pts[:, :3], rings=64, width=900,
                                        fov_up_deg=2.0, fov_down_deg=-24.8,
                                        min_range=0.5)
            got_mask = np.asarray(scan.mask)
            ref_mask = np.asarray(ref.mask)
            # identical binning: same occupied cells, same coordinates
            agree = (got_mask == ref_mask).mean()
            assert agree > 0.999, f"mask agreement {agree}"
            both = got_mask & ref_mask
            np.testing.assert_allclose(
                np.asarray(scan.xyz)[both], np.asarray(ref.xyz)[both], atol=1e-5
            )

    def test_order_and_reuse(self, tmp_path):
        paths = write_fake_scans(tmp_path, n_scans=6, seed=3)
        with NativeKittiLoader(paths, rings=16, width=360) as loader:
            sums = [float(np.abs(np.asarray(s.xyz)).sum()) for s in loader]
        assert len(sums) == 6
        # deterministic re-read in the same order
        with NativeKittiLoader(paths, rings=16, width=360) as loader:
            sums2 = [float(np.abs(np.asarray(s.xyz)).sum()) for s in loader]
        assert sums == sums2


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
