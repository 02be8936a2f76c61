import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agi_lidar_slam_tpu.config import MapConfig
from agi_lidar_slam_tpu.map.hash_map import (
    block_coords,
    delete_outside_box,
    empty_map,
    insert,
    lookup,
)
from agi_lidar_slam_tpu.nn.knn import knn, knn_brute
from agi_lidar_slam_tpu.pointcloud.voxel import voxel_downsample

CFG = MapConfig(log2_slots=12, sub_voxel=0.5, block_sub=2, probes=8, claim_rounds=8)


def map_points(m):
    """Extract occupied map points as a dense array (host-side helper)."""
    pts = np.asarray(m.points[:-1]).reshape(-1, 3)
    occ = np.asarray(m.occ[:-1]).reshape(-1)
    return pts[occ]


class TestVoxelDownsample:
    def test_merges_within_voxel(self):
        xyz = jnp.asarray([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]])
        mask = jnp.ones(3, dtype=bool)
        out = voxel_downsample(xyz, mask, 1.0, 8)
        got = np.asarray(out.xyz[np.asarray(out.mask)])
        assert got.shape[0] == 2
        assert any(np.allclose(g, [0.15, 0.15, 0.15], atol=1e-6) for g in got)
        assert any(np.allclose(g, [5.0, 5.0, 5.0], atol=1e-6) for g in got)

    def test_respects_mask(self):
        xyz = jnp.asarray([[0.0, 0.0, 0.0], [9.0, 9.0, 9.0]])
        out = voxel_downsample(xyz, jnp.asarray([True, False]), 1.0, 4)
        assert int(out.mask.sum()) == 1

    def test_capacity_overflow_drops(self):
        xyz = jnp.arange(30, dtype=jnp.float32)[:, None] * jnp.ones((1, 3)) * 2.0
        out = voxel_downsample(xyz, jnp.ones(30, dtype=bool), 1.0, 10)
        assert int(out.mask.sum()) == 10


class TestHashMap:
    def test_insert_and_lookup(self):
        m = empty_map(CFG)
        pts = jnp.asarray([[0.1, 0.1, 0.1], [10.0, -3.0, 2.0], [0.6, 0.1, 0.1]])
        m = insert(m, pts, jnp.ones(3, dtype=bool), CFG)
        assert int(m.num_points()) == 3  # three distinct sub-voxels
        bc, _ = block_coords(pts, CFG)
        slots = lookup(m.keys, bc, CFG)
        assert np.all(np.asarray(slots) >= 0)

    def test_subvoxel_dedup(self):
        m = empty_map(CFG)
        # 10 points in the same 0.5 m sub-voxel -> exactly one survives
        pts = jnp.asarray([[0.2 + 0.01 * i, 0.2, 0.2] for i in range(10)])
        m = insert(m, pts, jnp.ones(10, dtype=bool), CFG)
        assert int(m.num_points()) == 1

    def test_first_point_kept_across_inserts(self):
        m = empty_map(CFG)
        m = insert(m, jnp.asarray([[0.2, 0.2, 0.2]]), jnp.ones(1, dtype=bool), CFG)
        m = insert(m, jnp.asarray([[0.3, 0.3, 0.3]]), jnp.ones(1, dtype=bool), CFG)
        got = map_points(m)
        assert got.shape[0] == 1
        np.testing.assert_allclose(got[0], [0.2, 0.2, 0.2], atol=1e-6)

    def test_mask_respected(self):
        m = empty_map(CFG)
        pts = jnp.asarray([[1.0, 1.0, 1.0], [2.0, 2.0, 2.0]])
        m = insert(m, pts, jnp.asarray([True, False]), CFG)
        assert int(m.num_points()) == 1

    def test_insert_many_random(self):
        # ~24% load factor (production configs stay <=25%): open addressing
        # can still lose a block to an unluckily full 8-probe chain, but the
        # loss rate must stay under 0.1% and everything stored must be exact
        cfg = MapConfig(log2_slots=13, sub_voxel=0.5, block_sub=2, probes=8, claim_rounds=8)
        m = empty_map(cfg)
        pts = jax.random.uniform(jax.random.PRNGKey(0), (2000, 3), minval=-20, maxval=20)
        m = insert(m, pts, jnp.ones(2000, dtype=bool), cfg)
        got = map_points(m)
        sv_in = set(map(tuple, np.floor(np.asarray(pts) / cfg.sub_voxel).astype(int).tolist()))
        sv_map = set(map(tuple, np.floor(got / cfg.sub_voxel).astype(int).tolist()))
        assert sv_map.issubset(sv_in)
        assert len(sv_map) >= 0.999 * len(sv_in)

    def test_overloaded_table_drops_gracefully(self):
        # at ~50% load linear probing may exhaust its chain: inserts may drop
        # (bounded lossiness, like the reference's queue drains) but every
        # stored point must still be correct
        m = empty_map(CFG)
        pts = jax.random.uniform(jax.random.PRNGKey(0), (2000, 3), minval=-20, maxval=20)
        m = insert(m, pts, jnp.ones(2000, dtype=bool), CFG)
        got = map_points(m)
        sv_in = set(map(tuple, np.floor(np.asarray(pts) / CFG.sub_voxel).astype(int).tolist()))
        sv_map = set(map(tuple, np.floor(got / CFG.sub_voxel).astype(int).tolist()))
        assert sv_map.issubset(sv_in)
        assert len(sv_map) > 0.99 * len(sv_in)

    def test_delete_outside_box(self):
        m = empty_map(CFG)
        pts = jnp.asarray([[0.5, 0.5, 0.5], [30.0, 30.0, 30.0]])
        m = insert(m, pts, jnp.ones(2, dtype=bool), CFG)
        m = delete_outside_box(m, jnp.asarray([-5.0] * 3), jnp.asarray([5.0] * 3), CFG)
        got = map_points(m)
        assert got.shape[0] == 1
        np.testing.assert_allclose(got[0], [0.5, 0.5, 0.5])

    def test_reinsert_after_delete(self):
        m = empty_map(CFG)
        m = insert(m, jnp.asarray([[0.5, 0.5, 0.5]]), jnp.ones(1, dtype=bool), CFG)
        m = delete_outside_box(m, jnp.asarray([10.0] * 3), jnp.asarray([20.0] * 3), CFG)
        assert int(m.num_points()) == 0
        m = insert(m, jnp.asarray([[0.6, 0.6, 0.6]]), jnp.ones(1, dtype=bool), CFG)
        assert int(m.num_points()) == 1


class TestKnn:
    @pytest.mark.parametrize("mode", ["full27", "octant8"])
    def test_knn_matches_brute_force_within_gate(self, mode):
        # octant8 only guarantees block_size/2 coverage, so use a finer
        # sub-voxel + denser cloud to make 5-NN-within-radius queries common
        sub = 0.5 if mode == "full27" else 0.25
        cfg = MapConfig(log2_slots=13, sub_voxel=sub, block_sub=2 if mode == "full27" else 4,
                        probes=8, claim_rounds=8, neighborhood=mode)
        key = jax.random.PRNGKey(1)
        n_ref = 6000 if mode == "full27" else 12000
        ref = jax.random.uniform(key, (n_ref, 3), minval=-5.0, maxval=5.0)
        m = empty_map(cfg)
        m = insert(m, ref, jnp.ones(n_ref, dtype=bool), cfg)
        mp = map_points(m)
        queries = jax.random.uniform(jax.random.PRNGKey(2), (256, 3), minval=-4.0, maxval=4.0)
        k = 5
        res = knn(m, queries, jnp.ones(256, dtype=bool), k, cfg)
        brute = knn_brute(jnp.asarray(mp), jnp.ones(mp.shape[0], dtype=bool), queries, k)
        # wherever all brute-force neighbors lie within the guaranteed coverage
        # radius (block_size for full27, block_size/2 for octant8), the
        # hashed-map KNN must agree exactly
        radius = cfg.block_size if mode == "full27" else cfg.block_size / 2
        guaranteed = np.asarray(brute.sq_dists[:, k - 1]) < radius**2
        assert guaranteed.sum() > 30  # test is meaningful
        got = np.sort(np.asarray(res.sq_dists), axis=1)[guaranteed]
        want = np.sort(np.asarray(brute.sq_dists), axis=1)[guaranteed]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_knn_empty_map(self):
        m = empty_map(CFG)
        res = knn(m, jnp.zeros((4, 3)), jnp.ones(4, dtype=bool), 5, CFG)
        assert not bool(res.valid.any())

    @pytest.mark.parametrize("offset", [1500.0, -3000.0])
    def test_knn_far_from_origin(self, offset):
        # regression (round-1 bug): the dedup pack clipped block coords to
        # +-512 blocks around the ORIGIN, so maps >1 km out aliased and the
        # KNN hit rate silently fell to zero while brute force stayed exact
        cfg = MapConfig(log2_slots=13, sub_voxel=0.5, block_sub=2,
                        probes=8, claim_rounds=8, neighborhood="full27")
        key = jax.random.PRNGKey(7)
        ref = jax.random.uniform(key, (4000, 3), minval=-5.0, maxval=5.0) + offset
        m = empty_map(cfg)
        m = insert(m, ref, jnp.ones(4000, dtype=bool), cfg)
        mp = map_points(m)
        queries = jax.random.uniform(jax.random.PRNGKey(8), (128, 3),
                                     minval=-4.0, maxval=4.0) + offset
        res = knn(m, queries, jnp.ones(128, dtype=bool), 5, cfg)
        brute = knn_brute(jnp.asarray(mp), jnp.ones(mp.shape[0], dtype=bool), queries, 5)
        guaranteed = np.asarray(brute.sq_dists[:, 4]) < cfg.block_size**2
        assert guaranteed.sum() > 30
        got = np.sort(np.asarray(res.sq_dists), axis=1)[guaranteed]
        want = np.sort(np.asarray(brute.sq_dists), axis=1)[guaranteed]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
