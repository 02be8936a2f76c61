"""Pallas fused gather+top-k kernel: interpret-mode parity vs the jnp path.

The kernel is experimental: exact in interpret mode (this test); device
enablement through the remote TPU toolchain is tracked for the next round
(see PARITY.md perf notes). It is not yet wired into nn.knn.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import agi_lidar_slam_tpu.nn.pallas_knn as pk
from agi_lidar_slam_tpu.nn.knn import _smallest_k


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))


def reference(points, occ, slots, queries, k):
    pts_ref = points[jnp.maximum(slots, 0)]
    occ_ref = occ[jnp.maximum(slots, 0)] & (slots >= 0)[..., None]
    d2 = jnp.where(occ_ref, jnp.sum((pts_ref - queries[:, None, None, :]) ** 2, -1), 1e30)
    return _smallest_k(d2.reshape(slots.shape[0], -1), k)


class TestPallasKnn:
    @pytest.mark.parametrize("B,density", [(8, 0.7), (64, 0.3)])
    def test_parity(self, B, density):
        rows, N, M, K = 512, 128, 8, 5
        key = jax.random.PRNGKey(0)
        points = jax.random.normal(key, (rows, B, 3))
        occ = jax.random.uniform(jax.random.PRNGKey(1), (rows, B)) < density
        slots = jax.random.randint(jax.random.PRNGKey(2), (N, M), -1, rows)
        queries = jax.random.normal(jax.random.PRNGKey(3), (N, 3))
        d, p = pk.pallas_gather_topk(points, occ, slots, queries, k=K, tile=64)
        dr, _ = reference(points, occ, slots, queries, K)
        np.testing.assert_allclose(np.sort(np.asarray(d), 1),
                                   np.sort(np.asarray(dr), 1), rtol=1e-5, atol=1e-5)

    def test_all_absent(self):
        rows, B, N, M, K = 64, 8, 64, 8, 5
        points = jnp.zeros((rows, B, 3))
        occ = jnp.zeros((rows, B), bool)
        slots = jnp.full((N, M), -1, jnp.int32)
        queries = jnp.zeros((N, 3))
        d, p = pk.pallas_gather_topk(points, occ, slots, queries, k=K, tile=64)
        assert bool((d > 1e29).all())


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
