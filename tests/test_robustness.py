"""Failure-mode probes: degenerate inputs must never poison the engine.

The reference's only guards are runtime warnings (SURVEY.md section 4/5.3 —
"Too few input point cloud!", IMU failureDetection); here the invariants are
pinned: empty sweeps no-op, masked NaNs never reach the maps, a stationary
sensor does not drift.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.config import preset_sim16
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.pointcloud.cloud import ScanGrid
from agi_lidar_slam_tpu.runtime.pipeline import init_state, process_scan
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

CFG = preset_sim16()


def _sim_scan(world, p, seed):
    return simulate_scan(world, p, p, rings=16, width=900, noise_std=0.003,
                         seed=seed)


def _all_finite(state):
    leaves = [state.pose.q, state.pose.t,
              state.corner_map.points, state.surf_map.points]
    return all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)


class TestDegenerateInputs:
    def test_empty_scan_mid_sequence(self):
        """All-masked sweep (sensor dropout): the GN must no-op at the
        constant-velocity prediction, pose and maps stay finite, and the next
        real sweep recovers tracking."""
        world = default_world(seed=21)
        state = init_state(CFG)
        p = se3.Pose.identity()
        for i in range(3):
            state, _ = process_scan(state, _sim_scan(world, p, i), CFG)

        empty = ScanGrid(jnp.zeros((16, 900, 3)),
                         jnp.zeros((16, 900), bool),
                         jnp.zeros((16, 900)))
        state, res = process_scan(state, empty, CFG)
        assert _all_finite(state)
        assert int(res.stats.n_corner) + int(res.stats.n_surf) == 0

        state, res = process_scan(state, _sim_scan(world, p, 7), CFG)
        assert _all_finite(state)
        assert int(res.stats.n_surf) > 50
        assert float(jnp.linalg.norm(res.pose.t)) < 0.3

    def test_masked_nan_scan_keeps_maps_finite(self):
        """NaN coordinates under a False mask (a real driver failure mode:
        invalid returns encoded as NaN) must never propagate into the maps or
        the pose."""
        world = default_world(seed=22)
        state = init_state(CFG)
        p = se3.Pose.identity()
        state, _ = process_scan(state, _sim_scan(world, p, 0), CFG)

        scan = _sim_scan(world, p, 1)
        xyz = np.asarray(scan.xyz).copy()
        mask = np.asarray(scan.mask).copy()
        # poison a masked-out stripe with NaN/inf
        mask[:, 100:200] = False
        xyz[:, 100:200, :] = np.nan
        xyz[:, 150:160, :] = np.inf
        poisoned = ScanGrid(jnp.asarray(xyz), jnp.asarray(mask),
                            scan.time)
        state, res = process_scan(state, poisoned, CFG)
        assert _all_finite(state)
        assert bool(jnp.all(jnp.isfinite(res.pose.t)))

    def test_stationary_repeat_near_zero_drift(self):
        """Identical consecutive sweeps: the pose must stay put (the
        constant-velocity prediction is corrected back by association)."""
        world = default_world(seed=23)
        state = init_state(CFG)
        p = se3.Pose.identity()
        scan = _sim_scan(world, p, 5)
        drift = None
        for _ in range(4):
            state, res = process_scan(state, scan, CFG)
            drift = float(jnp.linalg.norm(res.pose.t))
        assert drift < 0.05, drift
        dq = so3.quat_log(res.pose.q)
        assert float(jnp.linalg.norm(dq)) < 0.02


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
