"""Parity of the VMEM-resident Pallas KNN (nn/vmem_knn.py) against the XLA
gather KNN and the brute-force oracle, in interpret mode (CPU CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.config import MapConfig
from agi_lidar_slam_tpu.map.hash_map import empty_map, insert
from agi_lidar_slam_tpu.map.planar import build_planar
from agi_lidar_slam_tpu.nn.knn import knn, knn_brute
from agi_lidar_slam_tpu.nn.vmem_knn import knn_vmem

CFG = MapConfig(sub_voxel=0.5, block_sub=4, log2_slots=10, probes=8,
                neighborhood="octant8")


def _make_map(seed=0, n=3000, extent=12.0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-extent, extent, (n, 3)), jnp.float32)
    return insert(empty_map(CFG), pts, jnp.ones((n,), bool), CFG), pts


@pytest.mark.parametrize("nq", [64, 200])  # tile-aligned and ragged
def test_vmem_knn_matches_xla(nq):
    m, _ = _make_map()
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-11, 11, (nq, 3)), jnp.float32)
    qmask = jnp.asarray(rng.uniform(size=nq) > 0.2)

    ref = knn(m, q, qmask, 5, CFG)  # XLA gather path
    sq, pts, valid = knn_vmem(m, q, qmask, 5, CFG, interpret=True)

    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))
    v = np.asarray(ref.valid)
    # FMA/fusion differences between the two lowering paths cost ~1 ulp
    np.testing.assert_allclose(np.asarray(sq)[v], np.asarray(ref.sq_dists)[v],
                               rtol=3e-6, atol=3e-6)
    np.testing.assert_allclose(np.asarray(pts)[v], np.asarray(ref.points)[v],
                               rtol=1e-5, atol=1e-5)


def test_vmem_knn_exact_within_coverage():
    """Within the octant coverage radius (block_size/2) the kernel is exact
    vs brute force, like the XLA path."""
    m, pts = _make_map(seed=3)
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.uniform(-10, 10, (128, 3)), jnp.float32)
    qmask = jnp.ones((128,), bool)

    sq, nn_pts, valid = knn_vmem(m, q, qmask, 5, CFG, interpret=True)
    # oracle over the map's own contents (insert dedups per sub-voxel)
    occ = m.occ[:-1].reshape(-1)
    mp = m.points[:-1].reshape(-1, 3)
    bf = knn_brute(mp, occ, q, 5)

    cover = CFG.block_size / 2.0
    sq_n, bf_n = np.asarray(sq), np.asarray(bf.sq_dists)
    v = np.asarray(valid)
    within = bf_n < (cover * cover)
    # every brute-force neighbor within coverage must be found (ulp tolerance
    # for the differing f32 distance evaluation order)
    np.testing.assert_allclose(sq_n[within & v], bf_n[within & v],
                               rtol=3e-6, atol=3e-6)
    assert np.all(v[within])


def test_vmem_knn_empty_map_and_all_masked():
    m = empty_map(CFG)
    q = jnp.zeros((64, 3), jnp.float32)
    sq, pts, valid = knn_vmem(m, q, jnp.ones((64,), bool), 5, CFG,
                              interpret=True)
    assert not bool(jnp.any(valid))

    m2, _ = _make_map()
    sq, pts, valid = knn_vmem(m2, q, jnp.zeros((64,), bool), 5, CFG,
                              interpret=True)
    assert not bool(jnp.any(valid))


def test_vmem_knn_padded_plane_width():
    """block_sub=3 -> bucket 27 padded to a 32-lane plane: the pad lanes carry
    poison and must never surface as neighbors."""
    cfg = MapConfig(sub_voxel=0.8, block_sub=3, log2_slots=10, probes=8,
                    neighborhood="octant8")
    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.uniform(-12, 12, (3000, 3)), jnp.float32)
    m = insert(empty_map(cfg), pts, jnp.ones((3000,), bool), cfg)
    q = jnp.asarray(rng.uniform(-11, 11, (192, 3)), jnp.float32)
    qmask = jnp.ones((192,), bool)

    ref = knn(m, q, qmask, 5, cfg)  # XLA gather path
    sq, nn_pts, valid = knn_vmem(m, q, qmask, 5, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(sq)[v], np.asarray(ref.sq_dists)[v],
                               rtol=3e-6, atol=3e-6)
    np.testing.assert_allclose(np.asarray(nn_pts)[v], np.asarray(ref.points)[v],
                               rtol=1e-5, atol=1e-5)


def test_prebuilt_tab_equivalent():
    m, _ = _make_map(seed=7)
    q = jnp.asarray(np.random.default_rng(8).uniform(-10, 10, (64, 3)),
                    jnp.float32)
    qmask = jnp.ones((64,), bool)
    tab = build_planar(m, CFG)
    a = knn_vmem(m, q, qmask, 5, CFG, interpret=True)
    b = knn_vmem(m, q, qmask, 5, CFG, tab=tab, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
