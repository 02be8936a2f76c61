"""Iterated error-state Kalman filter update (FAST-LIO2 measurement model).

Re-designs S-FAST_LIO esekfom.hpp:
* h_share_model (:106-227): per-point body->world, map 5-NN, plane fit,
  residual + sparse H rows — here one batched pass over all points (the
  OpenMP loop becomes the vectorized point axis),
* update_iterated_dyn_share_modified (:270-346): the iterated update
  K = (H^T H / R + P^-1)^-1 H^T / R exploiting that H only touches the first
  12 error dims (pose + extrinsic), convergence on |dx|, Joseph-free
  P = (I - K H) P as in the reference.

The 24x24 solve uses Cholesky with jitter (f32-safe; the reference relies on
f64 Eigen inverses).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MapConfig, SolverConfig
from ..fit.geometry_fit import fit_planes
from ..geometry import so3
from ..imu.eskf import DIM, NavState, boxminus, boxplus
from ..map.hash_map import HashVoxelMap
from ..nn.knn import knn
from ..pointcloud.cloud import PointBatch


class IeskfConfig(NamedTuple):
    max_iters: int = 4  # esekfom.hpp:292 maximum_iter (launch: 4)
    meas_noise: float = 0.001  # LASER_POINT_COV (laserMapping.cpp:64)
    converge_eps: float = 0.001  # esekfom.hpp convergence epsilon
    k_neighbors: int = 5
    # association gates. NOTE: the reference gates the 5th NN at 5 m^2
    # (esekfom.hpp:137) and accepts residuals via s = 1 - 0.9|r|/sqrt(|p|)
    # > 0.9 (:163); the defaults here (1 m^2 gate, 0.5 m residual cap) were
    # tuned on the simulator, where the tighter gate tracks measurably
    # better. Both are config so a dataset run can restore the reference
    # values (gate_sq=5.0, max_resid from the s-form) for parity validation.
    gate_sq: float = 1.0
    max_resid: float = 0.5  # hard cap on |point-to-plane residual| (m)
    plane_tol: float = 0.1  # esti_plane threshold (common_lib.h:104)
    # residual acceptance form: "cap" gates |r| < max_resid; "sform" is the
    # reference's own s = 1 - 0.9 |r| / sqrt(||p_body||) > 0.9 (esekfom.hpp:163)
    # — range-adaptive (far points tolerate larger residuals)
    resid_gate: str = "cap"
    # online lidar-IMU extrinsic estimation (the reference's extrinsic_est_en,
    # laserMapping.cpp param, esekfom.hpp:150-160: H's dtheta_li/dt_li columns
    # are zeroed when off). Default OFF as in every reference launch file —
    # the extrinsic columns duplicate the pose columns on degenerate scenes
    # (e.g. a single plane), silently splitting corrections between them.
    est_extrinsic: bool = False


def _h_model(
    x: NavState,
    pts_l: PointBatch,
    smap: HashVoxelMap,
    map_cfg: MapConfig,
    cfg: IeskfConfig,
):
    """Batched h_share_model: returns (H12 (N,12), residual (N,), valid (N,))."""
    R_li = so3.quat_to_matrix(x.q_li)
    R = so3.quat_to_matrix(x.q)
    body = pts_l.xyz @ R_li.T + x.t_li
    world = body @ R.T + x.p

    res = knn(smap, world, pts_l.mask, cfg.k_neighbors, map_cfg)
    gate = res.sq_dists[:, cfg.k_neighbors - 1] < cfg.gate_sq
    plane = fit_planes(res.points, res.valid, cfg.plane_tol)
    r = jnp.einsum("ni,ni->n", plane.normal, world) + plane.offset
    # validity: plane ok + gate + residual acceptance (cap or reference s-form)
    if cfg.resid_gate == "sform":
        s = 1.0 - 0.9 * jnp.abs(r) / jnp.sqrt(
            jnp.maximum(jnp.linalg.norm(pts_l.xyz, axis=-1), 1e-6))
        resid_ok = s > 0.9
    else:
        resid_ok = jnp.abs(r) < cfg.max_resid
    ok = pts_l.mask & gate & plane.ok & resid_ok
    r = jnp.where(ok, r, 0.0)

    n = plane.normal
    if cfg.est_extrinsic:
        H_ext = [
            -jnp.einsum("ni,nij->nj", n @ R @ R_li, so3.hat(pts_l.xyz)),  # d/dtheta_li
            n @ R,  # d/dt_li
        ]
    else:  # extrinsic_est_en=false: frozen extrinsic, zero columns
        H_ext = [jnp.zeros_like(n), jnp.zeros_like(n)]
    H = jnp.concatenate(
        [
            n,  # d/dp
            -jnp.einsum("ni,nij->nj", n @ R, so3.hat(body)),  # d/dtheta (n^T R (-[body]x))
        ] + H_ext,
        axis=-1,
    )
    H = jnp.where(ok[:, None], H, 0.0)
    return H, r, ok


def update_iterated(
    x_prop: NavState,
    P_prop: jnp.ndarray,
    pts_l: PointBatch,
    smap: HashVoxelMap,
    map_cfg: MapConfig,
    cfg: IeskfConfig = IeskfConfig(),
):
    """Iterated measurement update. Returns (x, P, n_valid, final residual rms)."""
    inv_R = 1.0 / cfg.meas_noise
    Lp = jnp.linalg.cholesky(P_prop + 1e-8 * jnp.eye(DIM))
    P_inv = jax.scipy.linalg.cho_solve((Lp, True), jnp.eye(DIM))
    P_inv = 0.5 * (P_inv + P_inv.T)

    def body(carry):
        i, x, _, _ = carry
        H, r, ok = _h_model(x, pts_l, smap, map_cfg, cfg)
        HtH = (H.T @ H) * inv_R  # (12,12) effective, embedded in 24
        A = P_inv.at[:12, :12].add(HtH)
        # dx solves A dx = -(H^T r / Rm + P^-1 (x [-] x_prop))
        dxp = boxminus(x, x_prop)
        rhs = -(jnp.concatenate([H.T @ r * inv_R, jnp.zeros(DIM - 12)]) + P_inv @ dxp)
        L = jnp.linalg.cholesky(A + 1e-6 * jnp.eye(DIM))
        dx = jax.scipy.linalg.cho_solve((L, True), rhs)
        x_new = boxplus(x, dx)
        rms = jnp.sqrt(jnp.sum(r * r) / jnp.maximum(jnp.sum(ok), 1))
        return i + 1, x_new, jnp.sum(ok), jnp.linalg.norm(dx)

    def keep_going(carry):
        # the reference's convergence exit: stop once |dx| < eps, capped at
        # max_iters (update_iterated_dyn_share_modified, esekfom.hpp:292-334)
        i, _, _, dx_norm = carry
        return (i < cfg.max_iters) & ((i == 0) | (dx_norm >= cfg.converge_eps))

    _, x, n_ok, _ = jax.lax.while_loop(
        keep_going, body, (jnp.int32(0), x_prop, jnp.int32(0), jnp.float32(jnp.inf))
    )
    # final covariance from the last linearization. The reference uses
    # P = (I - K H) P (esekfom.hpp:342), which drifts non-PSD in f32 over long
    # runs; we use the Joseph form P = (I-KH) P (I-KH)^T + K Rm K^T, which is
    # PSD by construction (equal in exact arithmetic for the optimal K).
    H, r, ok = _h_model(x, pts_l, smap, map_cfg, cfg)
    n_ok = jnp.sum(ok)
    rms = jnp.sqrt(jnp.sum(r * r) / jnp.maximum(n_ok, 1))
    HtH = (H.T @ H) * inv_R
    A = P_inv.at[:12, :12].add(HtH)
    L = jnp.linalg.cholesky(A + 1e-6 * jnp.eye(DIM))
    # K = A^-1 H^T / Rm  (24xm), so K H = A^-1 embed(H^T H / Rm)
    M = jnp.pad(HtH, ((0, DIM - 12), (0, DIM - 12)))
    KH = jax.scipy.linalg.cho_solve((L, True), M)
    IKH = jnp.eye(DIM) - KH
    KRKt = jax.scipy.linalg.cho_solve((L, True), jax.scipy.linalg.cho_solve((L, True), M).T)
    P_new = IKH @ P_prop @ IKH.T + KRKt
    P_new = 0.5 * (P_new + P_new.T) + 1e-9 * jnp.eye(DIM)
    return x, P_new, n_ok, rms
