"""Hardened simulator worlds: degenerate corridor, moving objects, urban
canyon — the stress classes real datasets exercise (VERDICT r2 item 1c).

Reference anchors: the LIO-Livox 4 km tunnel robustness claim
(LIO-Livox/README.md:5-7), its dynamic-vehicle segmentation
(segment.hpp:118-125), and the KITTI urban loops the kittiHelper protocol
replays (kittiHelper.cpp:89-199).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.config import preset_sim16
from agi_lidar_slam_tpu.features.dynamic_removal import (DynamicRemovalConfig,
                                                         remove_dynamic)
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.runtime.pipeline import init_state, process_scan
from agi_lidar_slam_tpu.sim.trajectory import square_loop_pose
from agi_lidar_slam_tpu.sim.world import (city_world, corridor_world,
                                          default_world, simulate_scan,
                                          with_movers)

DS = 0.35  # m per frame


def _drive_x(world, cfg, n_frames, rings=16, width=900):
    """Straight +x drive; returns (per-axis |err| array (N,3), any_degenerate)."""
    state = init_state(cfg)
    errs, degen = [], False
    for i in range(n_frames):
        p0 = se3.Pose(so3.quat_identity(), jnp.asarray([i * DS, 0.0, 0.0]))
        p1 = se3.Pose(so3.quat_identity(), jnp.asarray([(i + 1) * DS, 0.0, 0.0]))
        scan = simulate_scan(world, p0, p1, rings=rings, width=width,
                             noise_std=0.005, seed=i)
        state, res = process_scan(state, scan, cfg)
        errs.append(np.abs(np.asarray(res.pose.t) - np.asarray(p0.t)))
        degen = degen or bool(res.stats.degenerate)
    return np.stack(errs), degen


class TestCorridorDegeneracy:
    def test_featureless_tunnel_is_stable_and_flagged(self):
        """A pure corridor gives NO x-constraint: the solver must flag the
        rank deficiency and clamp (not hallucinate) — y/z/yaw stay locked to
        the walls while x falls back to the motion prediction."""
        world = corridor_world(length=40.0, n_alcoves=0)
        errs, degen = _drive_x(world, preset_sim16(), 8)
        assert np.all(np.isfinite(errs))
        assert degen, "degeneracy clamp never fired in a pure tunnel"
        # lateral / vertical tracked by the wall planes
        assert errs[:, 1].max() < 0.15, errs[:, 1]
        assert errs[:, 2].max() < 0.15, errs[:, 2]
        # x is unobservable: bounded by the dead-reckoned path, no explosion
        assert errs[:, 0].max() <= 8 * DS + 0.5

    def test_alcoves_restore_x_observability(self):
        """Door-frame niches add x-facing faces; the same drive tracks x."""
        world = corridor_world(length=40.0, n_alcoves=6, seed=3)
        errs, _ = _drive_x(world, preset_sim16(), 8)
        assert errs[:, 0].max() < 0.2, errs[:, 0]
        assert errs[:, 1].max() < 0.15
        assert errs[:, 2].max() < 0.15


class TestMovers:
    def test_mover_points_move_and_are_removed(self):
        """A car crossing the scene: its returns displace between frames, and
        PCSeg-style dynamic removal drops them while keeping the walls."""
        world = with_movers(default_world(seed=1), n=2, speed=5.0,
                            x_range=(6.0, 12.0))
        p = se3.Pose.identity()
        s0 = simulate_scan(world, p, p, rings=16, width=900, t0=0.0)
        s1 = simulate_scan(world, p, p, rings=16, width=900, t0=0.6)
        x0, m0 = np.asarray(s0.xyz), np.asarray(s0.mask)
        x1, m1 = np.asarray(s1.xyz), np.asarray(s1.mask)
        moved = (np.abs(x0 - x1).max(axis=-1) > 1e-3) & m0 & m1
        assert moved.sum() > 100, "movers not visible"

        # points ON a mover at t0=0 (the rest of `moved` is background the car
        # occludes/uncovers — correctly kept as static structure). The AABB is
        # expanded by the within-sweep travel (speed * scan_period): the box
        # keeps moving while the beam sweeps to it.
        on_mover = np.zeros_like(m0)
        pad = np.asarray([5.0 * 0.1 + 0.02, 0.05, 0.05])
        for lo, hi in zip(np.asarray(world.lo[-2:]), np.asarray(world.hi[-2:])):
            on_mover |= m0 & np.all((x0 >= lo - pad) & (x0 <= hi + pad),
                                    axis=-1)
        assert on_mover.sum() > 50, "no returns on the movers"
        keep = np.asarray(remove_dynamic(s0, DynamicRemovalConfig(half_extent=24.0)))
        assert (keep & on_mover).sum() < 0.25 * on_mover.sum(), (
            f"{(keep & on_mover).sum()}/{on_mover.sum()} mover returns kept")
        # static far walls survive
        far_wall = m0 & (np.abs(x0[..., 0]) > 15.0) & (x0[..., 2] > 0.5)
        if far_wall.sum():
            assert (keep & far_wall).sum() > 0.8 * far_wall.sum()

    def test_decimated_stats_keep_unsampled_tall_points(self):
        """stats_stride=2 regression (ADVICE r4, high): a cell whose strided
        stats samples are all GROUND must not mark its (unsampled) tall
        static content as foreground — the sentinel cluster for cells
        unoccupied in the decimated occupancy fails SAFE (keep)."""
        W = 8
        xyz = np.zeros((1, W, 3), np.float32)
        xyz[..., :2] = 0.5  # all points in one BEV cell
        # even azimuth columns (the stride-2 stats samples): ground returns;
        # odd columns: a 5 m pole — tall static structure (a corner feature)
        xyz[0, 1::2, 2] = 5.0
        from agi_lidar_slam_tpu.pointcloud.cloud import ScanGrid
        scan = ScanGrid(jnp.asarray(xyz), jnp.ones((1, W), bool),
                        jnp.zeros((1, W), jnp.float32))
        cfg = DynamicRemovalConfig(cell=1.0, half_extent=4.0, stats_stride=2)
        keep = np.asarray(remove_dynamic(scan, cfg))
        assert keep.all(), f"unsampled tall static points removed: {keep}"
        # stride=1 control: same points, fully-sampled stats — also all kept
        # (footprint-1 cluster but 5 m tall -> background via the height gate)
        keep1 = np.asarray(remove_dynamic(
            scan, DynamicRemovalConfig(cell=1.0, half_extent=4.0)))
        assert keep1.all(), keep1
        # and a LOW small cluster sampled by the stats IS still removed at
        # stride 2: 1 m-high returns on both column parities
        xyz2 = np.zeros((1, W, 3), np.float32)
        xyz2[..., :2] = 0.5
        xyz2[0, :, 2] = np.where(np.arange(W) % 4 < 2, 0.0, 1.0)
        scan2 = ScanGrid(jnp.asarray(xyz2), jnp.ones((1, W), bool),
                         jnp.zeros((1, W), jnp.float32))
        keep2 = np.asarray(remove_dynamic(scan2, cfg))
        low = xyz2[..., 2] > 0.5
        assert not keep2[low].any(), keep2
        assert keep2[~low].all(), keep2  # the ground returns stay

    def test_tracking_with_movers(self):
        """The odom engine stays within ATE bounds while two cars drive
        through the scene (most returns are static structure)."""
        cfg = preset_sim16()
        world = with_movers(default_world(seed=0), n=2, speed=4.0,
                            x_range=(6.0, 14.0))
        state = init_state(cfg)
        errs = []
        q, t = so3.quat_identity(), jnp.zeros(3)
        for i in range(10):
            p0 = se3.Pose(q, t)
            q = so3.quat_normalize(so3.quat_mul(q, so3.quat_exp(jnp.asarray([0, 0, 0.03]))))
            t = t + so3.quat_rotate(q, jnp.asarray([DS, 0.0, 0.0]))
            scan = simulate_scan(world, p0, se3.Pose(q, t), rings=16, width=900,
                                 noise_std=0.005, seed=i, t0=i * 0.1)
            state, res = process_scan(state, scan, cfg)
            errs.append(float(jnp.linalg.norm(res.pose.t - p0.t)))
        assert max(errs) < 0.35, errs


class TestCityCanyon:
    def test_city_block_drive_tracks(self):
        """Urban canyon: drive one street leg between building walls."""
        cfg = preset_sim16()
        world = city_world(seed=0)
        state = init_state(cfg)
        inv0 = se3.inverse(square_loop_pose(0.0, side=18.0, corner=4.0))
        errs = []
        for i in range(12):
            p0 = square_loop_pose(i * DS, side=18.0, corner=4.0)
            p1 = square_loop_pose((i + 1) * DS, side=18.0, corner=4.0)
            scan = simulate_scan(world, p0, p1, rings=16, width=900,
                                 noise_std=0.005, seed=i)
            state, res = process_scan(state, scan, cfg)
            gt = se3.compose(inv0, p0)
            errs.append(float(jnp.linalg.norm(res.pose.t - gt.t)))
        assert max(errs) < 0.3, errs


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
