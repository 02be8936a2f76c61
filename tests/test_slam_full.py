"""Full SLAM (odometry + keyframes + loop closure + pose graph) on a closed
circular trajectory through the simulated arena."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
# loop-closure align/rebuild are among the suite's biggest XLA:CPU compiles:
# keep them on the serial heavy-compile worker (see test_window_map.py)
pytestmark = pytest.mark.xdist_group("mesh8")


from agi_lidar_slam_tpu.config import MapConfig, SolverConfig, preset_sim16
from agi_lidar_slam_tpu.eval.metrics import ate_rmse
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.graph.loop_closure import LoopConfig
from agi_lidar_slam_tpu.runtime.slam_pipeline import SlamConfig, SlamDriver
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

N_FRAMES = 40
RADIUS = 5.0


def loop_poses(n=N_FRAMES, radius=RADIUS):
    th = jnp.linspace(0, 2 * jnp.pi, n)
    t = jnp.stack(
        [radius * jnp.sin(th), radius * (1 - jnp.cos(th)), jnp.zeros_like(th)], -1
    )
    q = so3.quat_exp(jnp.stack([jnp.zeros_like(th), jnp.zeros_like(th), th], -1))
    return [se3.Pose(q[i], t[i]) for i in range(n)]


def make_cfg():
    pl = preset_sim16()
    pl = dataclasses.replace(pl, deskew=False)
    return SlamConfig(
        pipeline=pl,
        bank_capacity=128,
        edge_capacity=256,
        kf_dist=0.5,
        kf_angle=0.15,
        loop=LoopConfig(
            radius=3.0,
            min_stamp_sep=15,
            submap_half=4,
            fitness_thresh=0.3,
            min_matches=60,
            map_cfg=MapConfig(sub_voxel=0.3, block_sub=2, log2_slots=13,
                              neighborhood="full27"),
            solver=SolverConfig(n_outer=5, n_inner=3, surf_gate_sq=1.0,
                                corner_gate_sq=1.0, degen_eig_thresh=10.0),
        ),
        loop_every=5,
    )


class TestFullSlam:
    def test_loop_closed_trajectory(self):
        world = default_world(seed=11)
        poses = loop_poses()
        cfg = make_cfg()
        driver = SlamDriver(cfg)
        for i, p in enumerate(poses):
            scan = simulate_scan(world, p, p, rings=16, width=900,
                                 noise_std=0.01, seed=100 + i)
            driver.process(scan)
        driver.finalize()  # drain the in-flight loop detection (end of stream)
        assert int(driver.state.bank.count) >= 10
        assert driver.n_loops_closed >= 1, "no loop closure fired on a closed loop"
        # keyframe trajectory vs ground truth at keyframe stamps
        n = int(driver.state.bank.count)
        stamps = np.asarray(driver.state.bank.stamp[:n]) - 1
        gt = np.stack([np.asarray(poses[s].t) for s in stamps])
        est = driver.trajectory()
        err = ate_rmse(est, gt, align=False)
        assert err < 0.3, f"ATE {err:.3f} m after loop closure"

    def test_external_loop_candidate(self):
        """detectLoopClosureExternal analog (mapOptmization.cpp:883-940): with
        auto-detection off (huge loop_every), an externally supplied (cur,
        old) keyframe pair closes the loop after the same alignment gate —
        and a bogus far-apart pair is rejected by that gate."""
        world = default_world(seed=11)
        poses = loop_poses()
        cfg = dataclasses.replace(make_cfg(), loop_every=10_000)
        driver = SlamDriver(cfg)
        for i, p in enumerate(poses):
            scan = simulate_scan(world, p, p, rings=16, width=900,
                                 noise_std=0.01, seed=100 + i)
            driver.process(scan)
        driver.finalize()
        assert driver.n_loops_closed == 0  # auto path disabled
        n = int(driver.state.bank.count)
        assert n >= 10
        # out-of-range / degenerate pairs are refused cheaply
        assert not driver.close_loop_external(n, 0)
        assert not driver.close_loop_external(3, 3)
        # the genuine closure: last keyframe against the first (in this small
        # arena every keyframe pair overlaps, so no within-world pair can
        # exercise fitness rejection — external pairs run through the exact
        # same align_loop gate the auto path uses)
        assert driver.close_loop_external(n - 1, 0)
        assert driver.n_loops_closed == 1
        stamps = np.asarray(driver.state.bank.stamp[:n]) - 1
        gt = np.stack([np.asarray(poses[s].t) for s in stamps])
        err = ate_rmse(driver.trajectory(), gt, align=False)
        assert err < 0.3, f"ATE {err:.3f} m after external loop closure"

    def test_gps_factors_integrate(self):
        world = default_world(seed=12)
        poses = loop_poses(14)
        cfg = make_cfg()
        driver = SlamDriver(cfg)
        for i, p in enumerate(poses):
            scan = simulate_scan(world, p, p, rings=16, width=900, seed=i)
            driver.process(scan, gps=p.t)  # perfect GPS on keyframes
        kinds = np.asarray(driver.state.edges.kind)
        valid = np.asarray(driver.state.edges.valid)
        assert (kinds[valid] == 1).sum() >= 3  # GPS factors recorded


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
