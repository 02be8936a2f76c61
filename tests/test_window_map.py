"""Sliding-window MAP estimator (LIO-Livox configuration)."""

import os
import sys
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the windowed-MAP solve is the suite's biggest XLA:CPU compile; two of them
# in concurrent workers have segfaulted LLVM codegen on the 2-core box
# (observed: test_window_map + this module's horizon-ref test, r4's gw1
# crash class) — keep every module that compiles it on the serial worker
pytestmark = pytest.mark.xdist_group("mesh8")


from agi_lidar_slam_tpu.config import MapConfig, SolverConfig, preset_sim16
from agi_lidar_slam_tpu.estimators.window_map import (
    MarginalPrior,
    WindowState,
    empty_prior,
    marginalize_oldest,
    solve_window,
    window_information,
)
from agi_lidar_slam_tpu.features.curvature import extract_features
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.imu.preintegration import preintegrate
from agi_lidar_slam_tpu.map.hash_map import empty_map, insert
from agi_lidar_slam_tpu.pointcloud.cloud import PointBatch
from agi_lidar_slam_tpu.pointcloud.voxel import voxel_downsample
from agi_lidar_slam_tpu.sim.trajectory import circle_imu, circle_pose, circle_velocity
from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

CFG = preset_sim16()
GRAV = jnp.asarray([0.0, 0.0, -9.81])
RADIUS, OMEGA, DT = 6.0, 0.25, 0.2


def frame_features(world, pose):
    scan = simulate_scan(world, pose, pose, rings=16, width=900)
    feats = extract_features(scan, CFG.features)
    corners = voxel_downsample(feats.corners.xyz, feats.corners.mask,
                               CFG.corner_ds_voxel, CFG.features.max_corners)
    surfs = voxel_downsample(feats.surfs.xyz, feats.surfs.mask,
                             CFG.surf_ds_voxel, CFG.features.max_surfs)
    return corners, surfs


def setup_two_frames():
    world = default_world(seed=6)
    p0 = circle_pose(0.0, RADIUS, OMEGA)
    p1 = circle_pose(DT, RADIUS, OMEGA)
    c0, s0 = frame_features(world, p0)
    c1, s1 = frame_features(world, p1)
    # maps built from both frames at ground truth
    cmap = insert(empty_map(CFG.corner_map),
                  so3.quat_rotate(p0.q[None], c0.xyz) + p0.t, c0.mask, CFG.corner_map)
    cmap = insert(cmap, so3.quat_rotate(p1.q[None], c1.xyz) + p1.t, c1.mask, CFG.corner_map)
    smap = insert(empty_map(CFG.surf_map),
                  so3.quat_rotate(p0.q[None], s0.xyz) + p0.t, s0.mask, CFG.surf_map)
    smap = insert(smap, so3.quat_rotate(p1.q[None], s1.xyz) + p1.t, s1.mask, CFG.surf_map)
    corners = PointBatch(jnp.stack([c0.xyz, c1.xyz]), jnp.stack([c0.mask, c1.mask]))
    surfs = PointBatch(jnp.stack([s0.xyz, s1.xyz]), jnp.stack([s0.mask, s1.mask]))
    # exact IMU between the frames at 100 Hz
    M = 20
    ts = (jnp.arange(M) + 0.5) * (DT / M)
    gy, ac = circle_imu(ts, RADIUS, OMEGA)
    pre = preintegrate(gy, ac, jnp.full((M,), DT / M), jnp.ones((M,), bool),
                       jnp.zeros(3), jnp.zeros(3))
    preints = jax.tree.map(lambda x: x[None], pre)  # batch dim (F-1,)
    return world, (p0, p1), corners, surfs, cmap, smap, preints


class TestWindowSolve:
    def test_recovers_perturbed_window(self):
        world, (p0, p1), corners, surfs, cmap, smap, preints = setup_two_frames()
        v0 = circle_velocity(0.0, RADIUS, OMEGA)
        v1 = circle_velocity(DT, RADIUS, OMEGA)
        ws_gt = WindowState(
            q=jnp.stack([p0.q, p1.q]), t=jnp.stack([p0.t, p1.t]),
            v=jnp.stack([v0, v1]), bg=jnp.zeros((2, 3)), ba=jnp.zeros((2, 3)),
        )
        # perturb both frames
        dq = so3.quat_exp(jnp.asarray([0.01, -0.02, 0.03]))
        ws0 = ws_gt._replace(
            q=so3.quat_normalize(so3.quat_mul(ws_gt.q, dq[None])),
            t=ws_gt.t + jnp.asarray([[0.15, -0.1, 0.08], [0.12, 0.14, -0.06]]),
        )
        solver = SolverConfig(n_outer=4, n_inner=2, degen_eig_thresh=10.0)
        ws, rn, _, _ = solve_window(ws0, corners, surfs, cmap, smap, preints,
                                    empty_prior(2), GRAV, CFG.corner_map, CFG.surf_map, solver)
        terr = np.linalg.norm(np.asarray(ws.t - ws_gt.t), axis=-1)
        assert terr.max() < 0.05, terr
        rerr = np.linalg.norm(np.asarray(
            so3.quat_log(so3.quat_mul(so3.quat_conj(ws_gt.q), ws.q))), axis=-1)
        assert rerr.max() < 0.02, rerr

    def test_imu_constrains_velocity(self):
        # wrong initial velocity must be corrected through the IMU factor
        world, (p0, p1), corners, surfs, cmap, smap, preints = setup_two_frames()
        v0 = circle_velocity(0.0, RADIUS, OMEGA)
        v1 = circle_velocity(DT, RADIUS, OMEGA)
        ws0 = WindowState(
            q=jnp.stack([p0.q, p1.q]), t=jnp.stack([p0.t, p1.t]),
            v=jnp.stack([v0 + jnp.asarray([0.5, -0.5, 0.2]), v1]),
            bg=jnp.zeros((2, 3)), ba=jnp.zeros((2, 3)),
        )
        solver = SolverConfig(n_outer=2, n_inner=2, degen_eig_thresh=10.0)
        ws, _, _, _ = solve_window(ws0, corners, surfs, cmap, smap, preints,
                                   empty_prior(2), GRAV, CFG.corner_map, CFG.surf_map, solver)
        verr = float(jnp.linalg.norm(ws.v[0] - v0))
        assert verr < 0.15, verr

    def test_analytic_information_matches_jacfwd_oracle(self):
        # solve_window assembles the window normal equations analytically
        # (batched 6x6 lidar blocks + jacfwd'd 15-row IMU factors) and returns
        # (H, b) at its final state. With n_inner=0 the state never moves, so
        # the returned information must equal `window_information` — the
        # independent full-stack jacfwd linearization — at the same state.
        #
        # The oracle jacfwd is the suite's single biggest XLA:CPU program,
        # and compiling programs of that size in a LONG-LIVED worker process
        # has intermittently segfaulted the compiler (fresh processes never
        # crash; the entry is also excluded from the persistent cache by
        # conftest). Run the check in a fresh subprocess.
        if os.environ.get("_WINDOW_ORACLE_INNER") != "1":
            import subprocess

            r = subprocess.run(
                [sys.executable, "-m", "pytest", "-x", "-q", "-n", "0",
                 __file__ + "::TestWindowSolve::"
                 "test_analytic_information_matches_jacfwd_oracle"],
                env={**os.environ, "_WINDOW_ORACLE_INNER": "1",
                     "PYTEST_XDIST_WORKER": "oracle"},
                capture_output=True, text=True, timeout=1800,
            )
            assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
            return
        world, (p0, p1), corners, surfs, cmap, smap, preints = setup_two_frames()
        v0 = circle_velocity(0.0, RADIUS, OMEGA)
        v1 = circle_velocity(DT, RADIUS, OMEGA)
        ws0 = WindowState(
            q=jnp.stack([p0.q, p1.q]),
            t=jnp.stack([p0.t, p1.t]) + jnp.asarray([[0.05, -0.03, 0.02],
                                                     [-0.04, 0.02, 0.03]]),
            v=jnp.stack([v0, v1]), bg=jnp.zeros((2, 3)), ba=jnp.zeros((2, 3)),
        )
        solver = SolverConfig(n_outer=1, n_inner=0, degen_eig_thresh=10.0)
        ws, _, H, b = solve_window(ws0, corners, surfs, cmap, smap, preints,
                                   empty_prior(2), GRAV, CFG.corner_map,
                                   CFG.surf_map, solver)
        np.testing.assert_allclose(np.asarray(ws.t), np.asarray(ws0.t))
        H_ref, b_ref = window_information(ws0, corners, surfs, cmap, smap,
                                          preints, GRAV, CFG.corner_map,
                                          CFG.surf_map, solver)
        scale = float(jnp.max(jnp.abs(H_ref)))
        np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref),
                                   atol=2e-4 * scale, rtol=2e-3)
        bscale = max(float(jnp.max(jnp.abs(b_ref))), 1.0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref),
                                   atol=2e-4 * bscale, rtol=2e-3)


class TestMarginalization:
    def test_prior_carries_information(self):
        world, (p0, p1), corners, surfs, cmap, smap, preints = setup_two_frames()
        v0 = circle_velocity(0.0, RADIUS, OMEGA)
        v1 = circle_velocity(DT, RADIUS, OMEGA)
        ws = WindowState(
            q=jnp.stack([p0.q, p1.q]), t=jnp.stack([p0.t, p1.t]),
            v=jnp.stack([v0, v1]), bg=jnp.zeros((2, 3)), ba=jnp.zeros((2, 3)),
        )
        solver = SolverConfig(n_outer=1, n_inner=1, degen_eig_thresh=10.0)
        H, b = window_information(ws, corners, surfs, cmap, smap, preints, GRAV,
                                  CFG.corner_map, CFG.surf_map, solver)
        assert H.shape == (30, 30)
        prior = marginalize_oldest(ws, H, b)
        assert prior.H.shape == (15, 15)
        evals = np.linalg.eigvalsh(np.asarray(prior.H))
        assert evals.min() > -1e-2  # information stays (near) PSD
        assert evals.max() > 1.0  # and is substantial

    def test_prior_recovers_marginal_optimum(self):
        # regression (round-1 sign bug): for a pure quadratic cost the prior
        # from Schur-marginalizing frame 0 must place its optimum exactly at
        # the joint optimum's remaining block — NOT its negation.
        rng = np.random.RandomState(3)
        A = rng.randn(60, 30)
        H = jnp.asarray(A.T @ A + 30 * np.eye(30), jnp.float32)
        b = jnp.asarray(rng.randn(30), jnp.float32)
        ws = WindowState(q=jnp.tile(so3.quat_identity()[None], (2, 1)),
                         t=jnp.zeros((2, 3)), v=jnp.zeros((2, 3)),
                         bg=jnp.zeros((2, 3)), ba=jnp.zeros((2, 3)))
        prior = marginalize_oldest(ws, H, b)
        dx_joint = np.linalg.solve(np.asarray(H, np.float64), np.asarray(b, np.float64))
        dx_prior = np.linalg.solve(np.asarray(prior.H, np.float64) + 1e-9 * np.eye(15),
                                   np.asarray(prior.b, np.float64))
        np.testing.assert_allclose(dx_prior, dx_joint[15:], rtol=1e-3, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
