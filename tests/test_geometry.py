import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.geometry import se3, so3


def rand_rotvec(key, n, scale=2.0):
    """Random rotation vectors kept inside the principal domain (norm < 2.8),
    since log() returns principal values."""
    w = scale * jax.random.normal(key, (n, 3))
    norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    return jnp.where(norm > 2.8, w * (2.8 / norm), w)


class TestSO3:
    def test_exp_log_matrix_roundtrip(self):
        w = rand_rotvec(jax.random.PRNGKey(0), 64, scale=1.0)
        R = so3.exp_matrix(w)
        w2 = so3.log_matrix(R)
        np.testing.assert_allclose(w, w2, atol=1e-4)

    def test_exp_matrix_orthonormal(self):
        w = rand_rotvec(jax.random.PRNGKey(1), 32)
        R = so3.exp_matrix(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_quat_matches_matrix(self):
        w = rand_rotvec(jax.random.PRNGKey(2), 32, scale=1.5)
        R1 = so3.exp_matrix(w)
        R2 = so3.quat_to_matrix(so3.quat_exp(w))
        np.testing.assert_allclose(R1, R2, atol=1e-5)

    def test_quat_exp_log_roundtrip(self):
        w = rand_rotvec(jax.random.PRNGKey(3), 64, scale=1.0)
        np.testing.assert_allclose(so3.quat_log(so3.quat_exp(w)), w, atol=1e-4)

    def test_quat_rotate_matches_matrix(self):
        key = jax.random.PRNGKey(4)
        w = rand_rotvec(key, 16)
        v = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
        q = so3.quat_exp(w)
        np.testing.assert_allclose(
            so3.quat_rotate(q, v),
            jnp.einsum("nij,nj->ni", so3.quat_to_matrix(q), v),
            atol=1e-5,
        )

    def test_matrix_to_quat_roundtrip(self):
        w = rand_rotvec(jax.random.PRNGKey(6), 64, scale=2.5)
        q = so3.quat_exp(w)
        q2 = so3.matrix_to_quat(so3.quat_to_matrix(q))
        # quaternion double cover: compare up to sign
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_slerp_endpoints_and_midpoint(self):
        q0 = so3.quat_exp(jnp.asarray([0.0, 0.0, 0.0]))
        q1 = so3.quat_exp(jnp.asarray([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(so3.slerp(q0, q1, 0.0), q0, atol=1e-6)
        dot = jnp.abs(jnp.sum(so3.slerp(q0, q1, 1.0) * q1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-6)
        mid = so3.slerp(q0, q1, 0.5)
        np.testing.assert_allclose(so3.quat_log(mid), [0.0, 0.0, 0.5], atol=1e-5)

    def test_small_angle_stability(self):
        w = jnp.asarray([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
        assert jnp.all(jnp.isfinite(so3.exp_matrix(w)))
        assert jnp.all(jnp.isfinite(so3.quat_exp(w)))
        assert jnp.all(jnp.isfinite(so3.quat_log(so3.quat_exp(w))))

    def test_log_near_pi(self):
        w = jnp.asarray([[3.14, 0.0, 0.0]])
        R = so3.exp_matrix(w)
        w2 = so3.log_matrix(R)
        np.testing.assert_allclose(w, w2, atol=5e-3)


class TestSE3:
    def test_compose_inverse(self):
        k = jax.random.PRNGKey(7)
        p = se3.Pose(so3.quat_exp(rand_rotvec(k, 8)), jax.random.normal(k, (8, 3)))
        ident = se3.compose(p, se3.inverse(p))
        np.testing.assert_allclose(jnp.abs(ident.q[:, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(ident.t, 0.0, atol=1e-5)

    def test_apply_matches_matrix(self):
        k = jax.random.PRNGKey(8)
        p = se3.Pose(so3.quat_exp(rand_rotvec(k, 1))[0], jnp.asarray([1.0, 2.0, 3.0]))
        pts = jax.random.normal(jax.random.PRNGKey(9), (10, 3))
        M = p.matrix()
        expected = pts @ M[:3, :3].T + M[:3, 3]
        np.testing.assert_allclose(se3.apply(p, pts), expected, atol=1e-5)

    def test_boxplus_boxminus_roundtrip(self):
        k = jax.random.PRNGKey(10)
        p = se3.Pose(so3.quat_exp(rand_rotvec(k, 4, 1.0)), jax.random.normal(k, (4, 3)))
        delta = 0.1 * jax.random.normal(jax.random.PRNGKey(11), (4, 6))
        p2 = se3.boxplus(p, delta)
        np.testing.assert_allclose(se3.boxminus(p2, p), delta, atol=1e-4)

    def test_interpolate_endpoints(self):
        a = se3.Pose.identity()
        b = se3.Pose(so3.quat_exp(jnp.asarray([0.0, 0.0, 0.4])), jnp.asarray([1.0, 0.0, 0.0]))
        mid = se3.interpolate(a, b, 0.5)
        np.testing.assert_allclose(mid.t, [0.5, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(so3.quat_log(mid.q), [0.0, 0.0, 0.2], atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
