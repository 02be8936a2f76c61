"""Pose-graph optimization: batched GN with matrix-free preconditioned CG.

Replaces GTSAM iSAM2 as used by LIO-SAM (mapOptmization.cpp:52-57, 1838-2127)
and LeGO-LOAM (:1628-1798). Instead of incremental Bayes-tree relinearization
(pointer-chasing, hostile to accelerators), each solve is a full Gauss-Newton
pass over the keyframe graph:

* residuals/Jacobians for every factor are built in one batched pass
  (prior + odometry/loop BetweenFactors + GPS position factors);
* the normal equations are never materialized: CG runs matrix-free with a
  gather -> 12x12 block product -> scatter-add Hv operator, preconditioned by
  the block-diagonal (block-Jacobi) inverse — the structure that shards over
  keyframe ranges with a psum (SURVEY.md section 5.7/5.8);
* node 0 is anchored by a strong prior (GTSAM PriorFactor analog).

Manifold: product SO(3) x R^3 per node, right rotation perturbation —
the same convention as the rest of the engine (geometry/se3.py).
Residuals: r_R = Log(Z_R^-1 R_i^-1 R_j), r_t = R_i^-1 (t_j - t_i) - Z_t.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry import se3, so3


class EdgeSet(NamedTuple):
    """Fixed-capacity factor storage. kind 0 = between (odom/loop),
    kind 1 = GPS/position prior on node i (z_t = world position, z_q unused)."""

    i: jnp.ndarray  # (E,) int32
    j: jnp.ndarray  # (E,) int32 (ignored for GPS)
    z_q: jnp.ndarray  # (E,4) measured relative rotation
    z_t: jnp.ndarray  # (E,3) measured relative translation / world position
    w_rot: jnp.ndarray  # (E,) rotation information weight (1/sigma^2)
    w_trans: jnp.ndarray  # (E,)
    kind: jnp.ndarray  # (E,) int32
    valid: jnp.ndarray  # (E,)
    count: jnp.ndarray  # ()

    @property
    def capacity(self) -> int:
        return self.i.shape[0]


def empty_edges(capacity: int) -> EdgeSet:
    return EdgeSet(
        i=jnp.zeros((capacity,), jnp.int32),
        j=jnp.zeros((capacity,), jnp.int32),
        z_q=jnp.tile(so3.quat_identity()[None], (capacity, 1)),
        z_t=jnp.zeros((capacity, 3)),
        w_rot=jnp.zeros((capacity,)),
        w_trans=jnp.zeros((capacity,)),
        kind=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), bool),
        count=jnp.int32(0),
    )


def add_edge(
    e: EdgeSet, i, j, z: se3.Pose, w_rot, w_trans, kind=0, do_add=True
) -> EdgeSet:
    idx = jnp.minimum(e.count, e.capacity - 1)
    write = jnp.asarray(do_add) & (e.count < e.capacity)
    w = jnp.where(write, idx, e.capacity - 1)

    def upd(arr, val):
        return arr.at[w].set(jnp.where(write, val, arr[w]))

    return EdgeSet(
        i=upd(e.i, jnp.int32(i)), j=upd(e.j, jnp.int32(j)),
        z_q=upd(e.z_q, z.q), z_t=upd(e.z_t, z.t),
        w_rot=upd(e.w_rot, jnp.float32(w_rot)), w_trans=upd(e.w_trans, jnp.float32(w_trans)),
        kind=upd(e.kind, jnp.int32(kind)),
        valid=upd(e.valid, write), count=e.count + write.astype(jnp.int32),
    )


def _edge_terms(q: jnp.ndarray, t: jnp.ndarray, e: EdgeSet):
    """Batched residuals and Jacobian blocks for all factors.

    Returns r (E,6), Ji (E,6,6), Jj (E,6,6), w (E,6) row weights.
    Between: r as in module docstring; Jacobian blocks use the standard
    small-residual approximation Jr^-1 ~ I (exact at convergence).
    GPS (kind 1): r_t = t_i - z_t (world), r_R = 0; only Ji translation block.
    """
    qi, ti = q[e.i], t[e.i]
    qj, tj = q[e.j], t[e.j]
    Ri = so3.quat_to_matrix(qi)
    R_ij = so3.quat_to_matrix(so3.quat_mul(so3.quat_conj(qi), qj))

    # between residuals
    r_R = so3.quat_log(
        so3.quat_mul(so3.quat_conj(e.z_q), so3.quat_mul(so3.quat_conj(qi), qj))
    )
    u = jnp.einsum("nij,nj->ni", jnp.swapaxes(Ri, -1, -2), tj - ti)  # R_i^T (t_j - t_i)
    r_t = u - e.z_t

    Z3 = jnp.zeros((e.capacity, 3, 3))
    I3 = jnp.broadcast_to(jnp.eye(3), (e.capacity, 3, 3))
    RiT = jnp.swapaxes(Ri, -1, -2)
    # between Jacobians (rows: [r_R, r_t], cols: [dtheta, dt])
    Ji_bet = jnp.concatenate([
        jnp.concatenate([-jnp.swapaxes(R_ij, -1, -2), Z3], axis=-1),
        jnp.concatenate([so3.hat(u), -RiT], axis=-1),
    ], axis=-2)
    Jj_bet = jnp.concatenate([
        jnp.concatenate([I3, Z3], axis=-1),
        jnp.concatenate([Z3, RiT], axis=-1),
    ], axis=-2)

    # GPS: r_t = t_i - z_t, world-frame position factor on node i
    r_R_gps = jnp.zeros_like(r_R)
    r_t_gps = ti - e.z_t
    Ji_gps = jnp.concatenate([
        jnp.concatenate([Z3, Z3], axis=-1),
        jnp.concatenate([Z3, I3], axis=-1),
    ], axis=-2)

    is_gps = (e.kind == 1)[:, None]
    r = jnp.where(is_gps, jnp.concatenate([r_R_gps, r_t_gps], -1),
                  jnp.concatenate([r_R, r_t], -1))
    Ji = jnp.where(is_gps[..., None], Ji_gps, Ji_bet)
    Jj = jnp.where(is_gps[..., None], jnp.zeros_like(Jj_bet), Jj_bet)

    w = jnp.concatenate(
        [jnp.tile(e.w_rot[:, None], (1, 3)), jnp.tile(e.w_trans[:, None], (1, 3))], -1
    )
    w = jnp.where(e.valid[:, None], w, 0.0)
    return r, Ji, Jj, w


def _solve_body(q0, t0, n_nodes, edges, n_gn_iters, n_cg_iters, anchor_weight,
                damping, axis_name=None):
    """GN body. With `axis_name`, the edge axis is SHARDED across that mesh
    axis: each device holds an edge range, and the per-node reductions (g,
    block-diagonal, Hv) complete with one psum — the keyframe-graph scale-out
    of SURVEY.md section 5.7/5.8 (iSAM2 has no analog of this). The CG state
    itself is replicated (identical deterministic iterations per device)."""
    K = q0.shape[0]
    live = (jnp.arange(K) < n_nodes)

    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    def gn_iter(_, carry):
        q, t = carry
        r, Ji, Jj, w = _edge_terms(q, t, edges)

        # gradient: g = sum_e J^T W r, scatter-added per node
        gi = jnp.einsum("eri,er->ei", Ji, w * r)
        gj = jnp.einsum("eri,er->ei", Jj, w * r)
        g = allsum(jnp.zeros((K, 6)).at[edges.i].add(gi).at[edges.j].add(gj))
        # anchor node 0 (strong prior at current estimate => zero residual,
        # contributes only to H's diagonal)
        anchor = jnp.zeros((K,)).at[0].set(anchor_weight)

        # block-diagonal of H for the preconditioner
        Hii = jnp.einsum("eri,er,erj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eri,er,erj->eij", Jj, w, Jj)
        D = allsum(jnp.zeros((K, 6, 6)).at[edges.i].add(Hii).at[edges.j].add(Hjj))
        D = D + (damping + anchor[:, None, None]) * jnp.eye(6)
        D_inv = jnp.linalg.inv(D + 1e-6 * jnp.eye(6))

        def Hv(v):  # v (K,6) -> H v, matrix-free
            vi = v[edges.i]
            vj = v[edges.j]
            Jv = jnp.einsum("erc,ec->er", Ji, vi) + jnp.einsum("erc,ec->er", Jj, vj)
            Jv = Jv * w
            out_i = jnp.einsum("erc,er->ec", Ji, Jv)
            out_j = jnp.einsum("erc,er->ec", Jj, Jv)
            out = allsum(
                jnp.zeros((K, 6)).at[edges.i].add(out_i).at[edges.j].add(out_j))
            return out + (damping + anchor[:, None]) * v

        def Mv(v):
            return jnp.einsum("kij,kj->ki", D_inv, v)

        delta, _ = jax.scipy.sparse.linalg.cg(Hv, -g, M=Mv, maxiter=n_cg_iters)
        delta = jnp.where(live[:, None], delta, 0.0)

        q_new = so3.quat_normalize(so3.quat_mul(q, so3.quat_exp(delta[:, :3])))
        t_new = t + delta[:, 3:]
        return q_new, t_new

    return jax.lax.fori_loop(0, n_gn_iters, gn_iter, (q0, t0))


def solve_pose_graph(
    poses: se3.Pose,  # (K,) batched
    n_nodes: jnp.ndarray,  # () live node count
    edges: EdgeSet,
    n_gn_iters: int = 5,
    n_cg_iters: int = 30,
    anchor_weight: float = 1e6,
    damping: float = 1e-3,
) -> se3.Pose:
    """Full GN re-solve of the graph. Nodes >= n_nodes are frozen."""
    q, t = _solve_body(poses.q, poses.t, n_nodes, edges, n_gn_iters,
                       n_cg_iters, anchor_weight, damping)
    return se3.Pose(q, t)


def sharded_solve_pose_graph(
    mesh,
    poses: se3.Pose,
    n_nodes: jnp.ndarray,
    edges: EdgeSet,
    axis: str = "dp",
    n_gn_iters: int = 5,
    n_cg_iters: int = 30,
    anchor_weight: float = 1e6,
    damping: float = 1e-3,
) -> se3.Pose:
    """Distributed graph solve: edges shard across `axis` (node state
    replicated), per-node reductions psum over ICI/DCN. Exact same result as
    `solve_pose_graph` (tested). Edge capacity must divide the axis size."""
    import functools

    from jax.sharding import PartitionSpec as P

    espec = EdgeSet(i=P(axis), j=P(axis), z_q=P(axis), z_t=P(axis),
                    w_rot=P(axis), w_trans=P(axis), kind=P(axis),
                    valid=P(axis), count=P())

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), espec), out_specs=(P(), P()),
        check_vma=False,  # outputs replicate via the psum'd reductions
    )
    def run(q0, t0, nn, e):
        return _solve_body(q0, t0, nn, e, n_gn_iters, n_cg_iters,
                           anchor_weight, damping, axis_name=axis)

    q, t = run(poses.q, poses.t, n_nodes, edges)
    return se3.Pose(q, t)


def between_measurement(pose_i: se3.Pose, pose_j: se3.Pose) -> se3.Pose:
    """Relative measurement Z_ij = T_i^-1 T_j (for odometry edges)."""
    return se3.compose(se3.inverse(pose_i), pose_j)
