#!/usr/bin/env python
"""Ablation micro-bench: where do KNN and insert actually spend time?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import functools

import jax.numpy as jnp

from agi_lidar_slam_tpu.config import preset_aloam_kitti64
from agi_lidar_slam_tpu.geometry import so3
from agi_lidar_slam_tpu.map.hash_map import block_coords, lookup
from agi_lidar_slam_tpu.nn import knn as knn_mod
from agi_lidar_slam_tpu.nn.knn import _dedup_lookup, _neighbor_blocks, _smallest_k, knn
from agi_lidar_slam_tpu.runtime.pipeline import init_state, process_scan
from bench import make_scans

_BIG = jnp.float32(1e30)


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return out


def main():
    cfg = preset_aloam_kitti64()
    scans = [jax.device_put(s) for s in make_scans()]
    state = init_state(cfg)
    for s in scans[:4]:
        state, res = process_scan(state, s, cfg)
    float(res.pose.t[0])

    # dispatch overhead
    noop = jax.jit(lambda x: x + 1.0)
    timeit("jit dispatch (scalar add)", noop, jnp.float32(1.0))

    m = state.surf_map
    mc = cfg.surf_map
    pose = state.pose
    R = so3.quat_to_matrix(pose.q)
    # surf queries at the real operating point
    surfs = res.surfs
    sw = surfs.xyz @ R.T + pose.t
    qmask = surfs.mask
    k = cfg.solver.k_neighbors
    N = sw.shape[0]
    print(f"N={N} valid={int(qmask.sum())} M={'8' if mc.neighborhood=='octant8' else '27'} "
          f"B={mc.bucket} rows={m.n_rows}")

    timeit("knn full", jax.jit(functools.partial(knn, k=k, cfg=mc)), m, sw, qmask)

    @jax.jit
    def lookup_direct(m, q, qmask):
        bc, _ = block_coords(q, mc)
        nbr = _neighbor_blocks(q, bc, mc)
        return lookup(m.keys, nbr, mc)

    @jax.jit
    def lookup_dedup(m, q, qmask):
        bc, _ = block_coords(q, mc)
        nbr = _neighbor_blocks(q, bc, mc)
        return _dedup_lookup(m, nbr, qmask, mc)

    slot = timeit("lookup (dedup/argsort)", lookup_dedup, m, sw, qmask)
    timeit("lookup (direct, no dedup)", lookup_direct, m, sw, qmask)

    @jax.jit
    def gather_only(m, slot, q, qmask):
        dump = m.n_rows - 1
        slot_safe = jnp.where(slot >= 0, slot, dump)
        pts = m.points[slot_safe]
        occ = m.occ[slot_safe] & (slot >= 0)[..., None]
        d2 = jnp.sum((pts - q[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(occ & qmask[:, None, None], d2, _BIG)
        return jnp.min(d2.reshape(d2.shape[0], -1), axis=1)

    @jax.jit
    def gather_pts_only(m, slot, q, qmask):
        dump = m.n_rows - 1
        slot_safe = jnp.where(slot >= 0, slot, dump)
        pts = m.points[slot_safe]
        d2 = jnp.sum((pts - q[:, None, None, :]) ** 2, axis=-1)
        return jnp.min(d2.reshape(d2.shape[0], -1), axis=1)

    @jax.jit
    def full_from_slots(m, slot, q, qmask):
        dump = m.n_rows - 1
        slot_safe = jnp.where(slot >= 0, slot, dump)
        pts = m.points[slot_safe]
        occ = m.occ[slot_safe] & (slot >= 0)[..., None]
        d2 = jnp.sum((pts - q[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(occ & qmask[:, None, None], d2, _BIG)
        d2f = d2.reshape(d2.shape[0], -1)
        sq, idx = _smallest_k(d2f, k)
        nn_pts = jnp.take_along_axis(pts.reshape(pts.shape[0], -1, 3), idx[..., None], axis=1)
        return sq, nn_pts

    timeit("gather pts+occ + min", gather_only, m, slot, sw, qmask)
    timeit("gather pts only + min", gather_pts_only, m, slot, sw, qmask)
    timeit("gather + smallest_k + take", full_from_slots, m, slot, sw, qmask)

    # compact two-level gather: distinct rows once, then index the compact set
    @jax.jit
    def gather_compact(m, slot, q, qmask):
        Nq, M = slot.shape
        U = 2048
        dump = m.n_rows - 1
        sl = jnp.where(slot >= 0, slot, dump).reshape(-1)
        order = jnp.argsort(sl)
        ss = sl[order]
        first = jnp.concatenate([jnp.ones((1,), bool), ss[1:] != ss[:-1]])
        uid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
        ok = uid_sorted < U
        urows = jnp.full((U,), dump, jnp.int32).at[
            jnp.where(first & ok, uid_sorted, U - 1)].set(ss)
        cpts = m.points[urows]            # (U,B,3) compact gather
        cocc = m.occ[urows]
        uid = jnp.zeros((Nq * M,), jnp.int32).at[order].set(jnp.minimum(uid_sorted, U - 1))
        pts = cpts[uid].reshape(Nq, M, -1, 3)
        occ = cocc[uid].reshape(Nq, M, -1) & (slot >= 0)[..., None]
        d2 = jnp.sum((pts - q[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(occ & qmask[:, None, None], d2, _BIG)
        return jnp.min(d2.reshape(d2.shape[0], -1), axis=1)

    timeit("two-level compact gather + min", gather_compact, m, slot, sw, qmask)

    # smallest_k alone on resident candidates
    d2f = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (N, 8 * mc.bucket)))
    timeit("smallest_k alone (resident)", jax.jit(functools.partial(_smallest_k, k=k)), d2f)

    # insert ablation
    from agi_lidar_slam_tpu.map.hash_map import insert_with_stats
    timeit("insert surfs (full)",
           jax.jit(functools.partial(insert_with_stats, cfg=mc)), m, sw, qmask)

    @jax.jit
    def insert_no_claim(m, xyz, mask):
        # steady state: all blocks exist; skip claim loop entirely
        B = m.bucket
        dump = m.n_rows - 1
        bc, sub_id = block_coords(xyz, mc)
        slot = lookup(m.keys, bc, mc)
        placed = mask & (slot >= 0)
        flat = jnp.where(placed, slot * B + sub_id, dump * B)
        occupied_before = m.occ.reshape(-1)[flat]
        writeable = placed & ~occupied_before
        flat_w = jnp.where(writeable, flat, dump * B)
        Np = xyz.shape[0]
        pt_idx = jnp.arange(Np, dtype=jnp.int32)
        owner = jnp.full(m.n_rows * B, Np, dtype=jnp.int32).at[flat_w].min(
            jnp.where(writeable, pt_idx, Np))
        is_owner = writeable & (owner[flat_w] == pt_idx)
        flat_final = jnp.where(is_owner, flat, dump * B)
        points = m.points.reshape(-1, 3).at[flat_final].set(
            jnp.where(is_owner[:, None], xyz, 0.0))
        occ = m.occ.reshape(-1).at[flat_final].set(
            is_owner | m.occ.reshape(-1)[flat_final])
        return points[0, 0]

    timeit("insert steady-state (no claim loop)", insert_no_claim, m, sw, qmask)


if __name__ == "__main__":
    main()
