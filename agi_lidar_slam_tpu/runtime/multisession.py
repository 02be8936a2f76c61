"""Multi-session sharded mapping: merge independent SLAM sessions into one
globally-consistent map.

The reference has no multi-session machinery (each ROS launch maps one bag);
BASELINE.json names "multi-session sharded mapping" as a target configuration
of the TPU build: several sessions' keyframe banks are merged, inter-session
loop closures anchor them to each other, one joint pose-graph solve aligns
everything, and the merged map is rebuilt — optionally into the slot-sharded
device-mesh map (parallel/map_shard.py) when it exceeds one chip's HBM.

This is an offline/batch path (the analog of merging several recorded bags),
so host-side orchestration around the batched device kernels is appropriate;
the heavy steps — loop alignment (the engine's own scan-to-map GN), the
pose-graph solve, and the map rebuild — are the same jitted programs the
online drivers use.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry import se3, so3
from ..graph.keyframes import KeyframeBank, empty_bank
from ..graph.loop_closure import LoopConfig, align_loop
from ..graph.pose_graph import (EdgeSet, add_edge, between_measurement,
                                empty_edges, solve_pose_graph)
from ..map.hash_map import HashVoxelMap, empty_map, insert


def merge_banks(banks: List[KeyframeBank], capacity: Optional[int] = None
                ) -> Tuple[KeyframeBank, np.ndarray]:
    """Concatenate the live keyframes of several sessions into one bank.

    Returns (merged bank, session id per merged slot (K,) int32).
    """
    counts = [int(b.count) for b in banks]
    total = sum(counts)
    cap = capacity or max(total, 1)
    if total > cap:
        raise ValueError(f"{total} keyframes exceed merged capacity {cap}")
    nc = banks[0].corner_xyz.shape[1]
    ns = banks[0].surf_xyz.shape[1]
    out = empty_bank(cap, nc, ns)

    def cat(field):
        parts = [np.asarray(getattr(b, field)[:n]) for b, n in zip(banks, counts)]
        full = np.array(getattr(out, field))  # writable host copy
        full[:total] = np.concatenate(parts, axis=0)
        return jnp.asarray(full)

    merged = KeyframeBank(
        q=cat("q"), t=cat("t"), stamp=cat("stamp"),
        corner_xyz=cat("corner_xyz"), corner_mask=cat("corner_mask"),
        surf_xyz=cat("surf_xyz"), surf_mask=cat("surf_mask"),
        count=jnp.int32(total),
    )
    session = np.full(cap, -1, np.int32)
    ofs = 0
    for sid, n in enumerate(counts):
        session[ofs:ofs + n] = sid
        ofs += n
    return merged, session


def odometry_edges(banks: List[KeyframeBank], weights=(1e4, 1e4),
                   capacity: int = 4096) -> EdgeSet:
    """Within-session odometry BetweenFactors on the MERGED index space.

    One batched between_measurement per session + one array write for the
    whole edge set (a per-edge add_edge loop costs O(K) device launches —
    pathological at multi-session city scale)."""
    ii, jj, zq, zt = [], [], [], []
    ofs = 0
    for b in banks:
        n = int(b.count)
        if n >= 2:
            z = between_measurement(se3.Pose(b.q[: n - 1], b.t[: n - 1]),
                                    se3.Pose(b.q[1:n], b.t[1:n]))
            ii.append(np.arange(ofs, ofs + n - 1, dtype=np.int32))
            jj.append(np.arange(ofs + 1, ofs + n, dtype=np.int32))
            zq.append(np.asarray(z.q))
            zt.append(np.asarray(z.t))
        ofs += n
    edges = empty_edges(capacity)
    if not ii:
        return edges
    i_all = np.concatenate(ii)
    E = i_all.shape[0]
    if E > capacity:
        raise ValueError(f"{E} odometry edges exceed edge capacity {capacity}")
    return edges._replace(
        i=edges.i.at[:E].set(jnp.asarray(i_all)),
        j=edges.j.at[:E].set(jnp.asarray(np.concatenate(jj))),
        z_q=edges.z_q.at[:E].set(jnp.asarray(np.concatenate(zq))),
        z_t=edges.z_t.at[:E].set(jnp.asarray(np.concatenate(zt))),
        w_rot=edges.w_rot.at[:E].set(weights[0]),
        w_trans=edges.w_trans.at[:E].set(weights[1]),
        valid=edges.valid.at[:E].set(True),
        count=jnp.int32(E),
    )


def cross_session_candidates(bank: KeyframeBank, session: np.ndarray,
                             radius: float, max_pairs: int = 16
                             ) -> List[Tuple[int, int]]:
    """(cur, cand) keyframe pairs from DIFFERENT sessions within `radius`,
    greedily spread out (each keyframe used at most once per side)."""
    n = int(bank.count)
    t = np.asarray(bank.t[:n])
    sid = session[:n]
    d = np.linalg.norm(t[:, None, :] - t[None, :, :], axis=-1)
    cross = sid[:, None] != sid[None, :]
    cand = np.argwhere(cross & (d < radius))
    cand = cand[cand[:, 0] > cand[:, 1]]  # one direction per pair
    order = np.argsort(d[cand[:, 0], cand[:, 1]])
    used_a, used_b, pairs = set(), set(), []
    for a, b in cand[order]:
        if a in used_a or b in used_b:
            continue
        pairs.append((int(a), int(b)))
        used_a.add(a)
        used_b.add(b)
        if len(pairs) >= max_pairs:
            break
    return pairs


def merge_sessions(
    banks: List[KeyframeBank],
    loop_cfg: LoopConfig = LoopConfig(),
    pair_radius: float = 5.0,
    max_pairs: int = 16,
    odom_w: float = 1e4,
    loop_w: float = 1e4,
    n_gn_iters: int = 8,
) -> Tuple[KeyframeBank, np.ndarray, int]:
    """Full multi-session merge: banks -> (corrected merged bank,
    session ids, number of accepted inter-session closures).

    Session 0 is the reference frame (the joint solve anchors node 0); other
    sessions are pulled onto it by the accepted inter-session alignments.
    """
    bank, session = merge_banks(banks)
    edges = odometry_edges(banks, weights=(odom_w, odom_w))

    n_accepted = 0
    for cur, cand in cross_session_candidates(bank, session, pair_radius,
                                              max_pairs):
        z, fitness, ok = align_loop(bank, jnp.int32(cur), jnp.int32(cand),
                                    loop_cfg)
        if bool(ok):
            edges = add_edge(edges, jnp.int32(cand), jnp.int32(cur), z,
                             loop_w, loop_w, kind=0, do_add=jnp.bool_(True))
            n_accepted += 1

    new_poses = solve_pose_graph(bank.poses(), bank.count, edges,
                                 n_gn_iters=n_gn_iters)
    bank = bank._replace(q=new_poses.q, t=new_poses.t)
    return bank, session, n_accepted


def build_merged_map(bank: KeyframeBank, map_cfg, mesh=None) -> HashVoxelMap:
    """Rebuild one global map from the corrected merged bank (surf clouds).

    With `mesh`, the map arrays are slot-sharded over the mesh's "mp" axis
    and inserts run through parallel/map_shard.sharded_insert — the
    "sharded" half of multi-session sharded mapping (exact parity with the
    single-device insert is pinned by tests/test_map_shard.py).
    """
    K = bank.capacity
    live = (jnp.arange(K) < bank.count)[:, None]
    R = so3.quat_to_matrix(bank.q)
    world = jnp.einsum("kij,knj->kni", R, bank.surf_xyz) + bank.t[:, None, :]
    xyz = world.reshape(-1, 3)
    mask = (bank.surf_mask & live).reshape(-1)
    if mesh is None:
        return insert(empty_map(map_cfg), xyz, mask, map_cfg)
    from ..parallel.map_shard import shard_map_arrays, sharded_insert

    m = shard_map_arrays(empty_map(map_cfg), mesh)
    return sharded_insert(mesh, m, xyz, mask, map_cfg)
