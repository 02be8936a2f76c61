import os

import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.config import preset_sim16
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.io.checkpoint import (
    export_pcd,
    load_state,
    map_to_points,
    read_pcd,
    relocalize_state,
    save_map_bundle,
    save_state,
)
from agi_lidar_slam_tpu.runtime.pipeline import init_state, process_scan
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

CFG = preset_sim16()


def run_a_bit(n=3):
    world = default_world(seed=9)
    state = init_state(CFG)
    p = se3.Pose.identity()
    for i in range(n):
        scan = simulate_scan(world, p, p, rings=16, width=900, seed=i)
        state, res = process_scan(state, scan, CFG)
    return world, state


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        world, state = run_a_bit()
        path = os.path.join(tmp_path, "state.npz")
        save_state(path, state)
        restored = load_state(path, init_state(CFG))
        np.testing.assert_array_equal(np.asarray(state.pose.t), np.asarray(restored.pose.t))
        assert int(restored.surf_map.num_points()) == int(state.surf_map.num_points())
        # restored state continues processing
        scan = simulate_scan(world, se3.Pose.identity(), se3.Pose.identity(),
                             rings=16, width=900, seed=42)
        s2, res = process_scan(restored, scan, CFG)
        assert bool(jnp.isfinite(res.pose.t).all())

    def test_pcd_roundtrip(self, tmp_path):
        pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        path = os.path.join(tmp_path, "cloud.pcd")
        export_pcd(path, pts)
        back = read_pcd(path)
        np.testing.assert_allclose(back, pts, atol=1e-4)

    def test_save_map_bundle(self, tmp_path):
        _, state = run_a_bit()
        save_map_bundle(str(tmp_path), state, trajectory=np.zeros((5, 3)))
        for name in ("CornerMap.pcd", "SurfMap.pcd", "GlobalMap.pcd", "trajectory.pcd"):
            assert os.path.exists(os.path.join(tmp_path, name))
        g = read_pcd(os.path.join(tmp_path, "GlobalMap.pcd"))
        assert g.shape[0] == int(state.corner_map.num_points()) + int(
            state.surf_map.num_points()
        )

    def test_relocalization(self):
        # build a map, relocalize a fresh engine from it with a seeded pose,
        # and verify the next scan registers against the prior map
        world, state = run_a_bit()
        corner = map_to_points(state.corner_map)
        surf = map_to_points(state.surf_map)
        seed_pose = se3.Pose(so3.quat_identity(), jnp.asarray([0.05, -0.05, 0.0]))
        st2 = relocalize_state(CFG, corner, surf, seed_pose)
        scan = simulate_scan(world, se3.Pose.identity(), se3.Pose.identity(),
                             rings=16, width=900, seed=77)
        st3, res = process_scan(st2, scan, CFG)
        # registered back to the true pose (identity) despite the seed offset
        assert float(jnp.linalg.norm(res.pose.t)) < 0.03
        assert int(res.stats.n_surf) > 200


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestLioRelocalization:
    def test_relocalize_lio_in_prior_map(self):
        """laserMapping_re analog for the IESKF engine: build a map with one
        run, relocalize a FRESH LioState in it (prior map + seeded pose) and
        track from there without a map-building phase."""
        from test_lio import (CFG as LCFG, RADIUS, OMEGA, SCAN_DT,
                              circle_velocity, make_sequence)

        from agi_lidar_slam_tpu.imu.eskf import NavState
        from agi_lidar_slam_tpu.io.checkpoint import relocalize_lio_state
        from agi_lidar_slam_tpu.runtime.lio_pipeline import (init_lio_state,
                                                             process_lio_scan)

        n = 6
        scans, windows, gts = make_sequence(n)
        x0 = NavState.identity()._replace(v=circle_velocity(0.0, RADIUS, OMEGA))
        state = init_lio_state(LCFG, x0)
        for scan, win in zip(scans[:4], windows[:4]):
            state, _ = process_lio_scan(
                state, scan.xyz.reshape(-1, 3),
                (scan.time * SCAN_DT).reshape(-1), scan.mask.reshape(-1),
                win, LCFG)
        prior_pts = map_to_points(state.map)
        assert len(prior_pts) > 500

        # fresh engine localized at the scan-4 ground truth in the prior map
        seed = gts[3]
        st2 = relocalize_lio_state(LCFG, prior_pts, seed)
        assert int(st2.map.num_points()) > 500
        st2 = st2._replace(x=st2.x._replace(
            v=circle_velocity(4 * SCAN_DT, RADIUS, OMEGA)))
        for scan, win, gt in zip(scans[4:], windows[4:], gts[4:]):
            st2, res = process_lio_scan(
                st2, scan.xyz.reshape(-1, 3),
                (scan.time * SCAN_DT).reshape(-1), scan.mask.reshape(-1),
                win, LCFG)
        err = float(jnp.linalg.norm(res.x.p - gts[-1].t))
        assert err < 0.25, err
        assert int(res.n_matches) > 200
