import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.fit.geometry_fit import eigh3x3, fit_lines, fit_planes


class TestEigh3x3:
    def test_matches_numpy(self):
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (64, 3, 3))
        S = A @ jnp.swapaxes(A, -1, -2)  # PSD
        vals, vecs = eigh3x3(S)
        ref_vals = np.sort(np.linalg.eigvalsh(np.asarray(S)), axis=-1)[:, ::-1]
        np.testing.assert_allclose(vals, ref_vals, rtol=1e-3, atol=1e-3)
        # eigenvector property: S v = lambda v
        for i in range(3):
            Sv = jnp.einsum("nij,nj->ni", S, vecs[:, i, :])
            lv = vals[:, i : i + 1] * vecs[:, i, :]
            np.testing.assert_allclose(Sv, lv, atol=5e-2)

    def test_descending_order(self):
        A = jax.random.normal(jax.random.PRNGKey(1), (16, 3, 3))
        S = A @ jnp.swapaxes(A, -1, -2)
        vals, _ = eigh3x3(S)
        assert bool(jnp.all(vals[:, 0] >= vals[:, 1] - 1e-5))
        assert bool(jnp.all(vals[:, 1] >= vals[:, 2] - 1e-5))


class TestLineFit:
    def test_recovers_line(self):
        t = jnp.linspace(-1, 1, 5)
        d = jnp.asarray([0.6, 0.8, 0.0])
        pts = (t[:, None] * d)[None] + jnp.asarray([1.0, 2.0, 3.0])
        fit = fit_lines(pts, jnp.ones((1, 5), dtype=bool), 3.0)
        assert bool(fit.ok[0])
        np.testing.assert_allclose(jnp.abs(jnp.dot(fit.direction[0], d)), 1.0, atol=1e-4)
        np.testing.assert_allclose(fit.centroid[0], [1.0, 2.0, 3.0], atol=1e-5)

    def test_ok_matches_eigen_ratio(self):
        # the ok flag must agree with the lambda_max > 3*lambda_mid criterion
        # computed independently via numpy (A-LOAM laserMapping.cpp:670)
        pts = jax.random.normal(jax.random.PRNGKey(2), (200, 5, 3))
        fit = fit_lines(pts, jnp.ones((200, 5), dtype=bool), 3.0)
        P = np.asarray(pts)
        c = P.mean(axis=1, keepdims=True)
        cov = np.einsum("nki,nkj->nij", P - c, P - c) / 5.0
        vals = np.sort(np.linalg.eigvalsh(cov), axis=-1)
        want = vals[:, 2] > 3.0 * vals[:, 1]
        got = np.asarray(fit.ok)
        # allow disagreement only on near-threshold cases
        margin = np.abs(vals[:, 2] - 3.0 * vals[:, 1]) > 1e-3 * vals[:, 2]
        assert (got == want)[margin].all()

    def test_rejects_isotropic_cube(self):
        # points at cube corners: perfectly isotropic covariance -> not a line
        pts = jnp.asarray(
            [[[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1], [0, 0, 0]]],
            dtype=jnp.float32,
        )
        fit = fit_lines(pts, jnp.ones((1, 5), dtype=bool), 3.0)
        assert not bool(fit.ok[0])

    def test_invalid_neighbors_reject(self):
        pts = jnp.zeros((1, 5, 3))
        valid = jnp.asarray([[True, True, True, True, False]])
        assert not bool(fit_lines(pts, valid, 3.0).ok[0])


class TestPlaneFit:
    def test_recovers_plane(self):
        # plane z = 0.5 -> normal (0,0,1), offset -0.5 (n.x + d = 0)
        xy = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 2))
        pts = jnp.concatenate([xy, jnp.full((1, 5, 1), 0.5)], axis=-1)
        fit = fit_planes(pts, jnp.ones((1, 5), dtype=bool), 0.2)
        assert bool(fit.ok[0])
        n = np.asarray(fit.normal[0])
        np.testing.assert_allclose(np.abs(n[2]), 1.0, atol=1e-3)
        np.testing.assert_allclose(n[2] * 0.5 + fit.offset[0], 0.0, atol=1e-3)

    def test_rejects_nonplanar(self):
        pts = 2.0 * jax.random.normal(jax.random.PRNGKey(4), (8, 5, 3))
        fit = fit_planes(pts, jnp.ones((8, 5), dtype=bool), 0.05)
        assert int(fit.ok.sum()) <= 1  # random blobs are almost never planar


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
