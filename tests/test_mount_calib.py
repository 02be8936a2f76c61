"""Mount-angle self-calibration (LIO-Livox pointsCorrect.cpp analog)."""

import jax.numpy as jnp
import numpy as np

from agi_lidar_slam_tpu.features.mount_calib import (
    correct_points,
    estimate_ground,
    init_mount_state,
    mount_rotation,
    update_mount,
)


def tilted_ground_cloud(roll=0.05, pitch=0.08, n=6000, seed=0, z0=-1.2):
    """Ground plane + pillars as seen by a sensor mounted with (roll, pitch)."""
    rng = np.random.default_rng(seed)
    g = np.zeros((n, 3), np.float32)
    g[:, 0] = rng.uniform(-18, 18, n)
    g[:, 1] = rng.uniform(-9, 9, n)
    g[:, 2] = z0 + rng.normal(0, 0.02, n)
    # clutter above ground (walls/pillars) confined to one side — cells it
    # lands in fail the flat gate; the open-road cells must carry the fit
    w = np.zeros((n // 4, 3), np.float32)
    w[:, 0] = rng.uniform(-18, -10, n // 4)
    w[:, 1] = rng.uniform(-9, -5, n // 4)
    w[:, 2] = rng.uniform(0.0, 3.0, n // 4)
    pts = np.concatenate([g, w], axis=0)
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]], np.float32)
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]], np.float32)
    R = Rx @ Ry  # sensor tilt: world points seen through the tilted mount
    return (pts @ R.T).astype(np.float32), R


class TestEstimate:
    def test_recovers_tilt_normal(self):
        pts, R = tilted_ground_cloud()
        est = estimate_ground(jnp.asarray(pts), jnp.ones((pts.shape[0],), bool))
        assert bool(est.ok)
        # true ground normal in sensor frame = R @ z
        n_true = R @ np.array([0, 0, 1.0], np.float32)
        assert np.dot(np.asarray(est.normal), n_true) > 0.9995

    def test_flat_gate_rejects_wall_only_cells(self):
        # vertical wall only: no flat cells -> not ok
        rng = np.random.default_rng(1)
        w = np.zeros((4000, 3), np.float32)
        w[:, 0] = rng.uniform(-5, 5, 4000)
        w[:, 1] = 3.0
        w[:, 2] = rng.uniform(-1, 3, 4000)
        est = estimate_ground(jnp.asarray(w), jnp.ones((4000,), bool))
        assert not bool(est.ok)


class TestCorrection:
    def test_corrected_ground_is_level_at_zero(self):
        pts, _ = tilted_ground_cloud(roll=0.06, pitch=-0.04)
        st = init_mount_state()
        st, est = update_mount(st, jnp.asarray(pts),
                               jnp.ones((pts.shape[0],), bool))
        assert bool(st.initialized)
        out = np.asarray(correct_points(jnp.asarray(pts), st))
        gz = out[:6000, 2]  # the ground subset
        assert abs(gz.mean()) < 0.02, gz.mean()
        assert gz.std() < 0.05, gz.std()

    def test_rotation_maps_normal_to_z(self):
        n = jnp.asarray(np.array([0.1, -0.05, 0.99], np.float32))
        n = n / jnp.linalg.norm(n)
        R = mount_rotation(n)
        out = np.asarray(R @ n)
        np.testing.assert_allclose(out, [0, 0, 1], atol=1e-5)

    def test_identity_before_init(self):
        pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
        out = correct_points(jnp.asarray(pts), init_mount_state())
        np.testing.assert_allclose(np.asarray(out), pts, atol=1e-7)


class TestEmaGate:
    def test_consistent_frames_average_in(self):
        st = init_mount_state()
        for seed in range(3):
            pts, _ = tilted_ground_cloud(seed=seed)
            st, est = update_mount(st, jnp.asarray(pts),
                                   jnp.ones((pts.shape[0],), bool))
        assert bool(st.initialized)
        assert int(st.misses) == 0

    def test_outlier_frame_rejected(self):
        pts, _ = tilted_ground_cloud()
        st = init_mount_state()
        st, _ = update_mount(st, jnp.asarray(pts), jnp.ones((pts.shape[0],), bool))
        n0 = np.asarray(st.normal).copy()
        # wildly different tilt: outside the 0.1 gate -> rejected, miss count up
        pts2, _ = tilted_ground_cloud(roll=0.45, pitch=0.0, seed=5)
        st2, _ = update_mount(st, jnp.asarray(pts2),
                              jnp.ones((pts2.shape[0],), bool))
        np.testing.assert_allclose(np.asarray(st2.normal), n0, atol=1e-7)
        assert int(st2.misses) == 1
