"""Sliding-window MAP estimator with Schur-complement marginalization
(LIO-Livox family).

Re-designs LIO-Livox's Estimator (Estimator.cpp:910-1301) + ceresfunc.h:
* per-frame lidar factors (point-to-line / point-to-plane against the map)
  — batched association reused from gn_scan2map,
* 15-dim IMU preintegration factors between consecutive window frames
  (Cost_NavState_PRV_Bias, ceresfunc.h:337-433) with first-order bias
  correction and full 15x15 sqrt-information weighting,
* a marginalization prior from Schur-complementing the dropped frame
  (MarginalizationInfo :96-273) — here 20 lines of dense linear algebra
  instead of pthread-parallel residual-block bookkeeping.

Window state: F frames x [theta(3), t(3), v(3), bg(3), ba(3)] = 15F error
dims. The inner Gauss-Newton linearizes the full residual stack with
jax.jacfwd on the manifold perturbation (association held fixed, as in the
reference's outer iterations) — dense (15F)-dim normal equations, trivially
solvable on-chip for F = 2..20.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig, SolverConfig
from ..fit.geometry_fit import fit_planes
from ..geometry import se3, so3
from ..imu.preintegration import Preintegrated
from ..map.hash_map import HashVoxelMap
from ..nn.knn import knn
from ..pointcloud.cloud import PointBatch
from .gn_scan2map import Correspondences, associate

D_FRAME = 15


class PlaneCorr(NamedTuple):
    """Point-to-plane correspondences for the non-feature class
    (Cost_NonFeature_ICP, LIO-Livox ceresfunc.h:624)."""

    n: jnp.ndarray  # (N,3) unit normals
    d: jnp.ndarray  # (N,) offsets
    ok: jnp.ndarray  # (N,)


def associate_nonfeature(pose: se3.Pose, pts: PointBatch, m: HashVoxelMap,
                         map_cfg: MapConfig, cfg: SolverConfig,
                         gate_sq: float = 4.0, tol: float = 0.5) -> PlaneCorr:
    """KNN + loose plane fit of non-feature points against their own map
    class (Estimator.cpp:1019-1050 runs this as the third residual thread)."""
    R = so3.quat_to_matrix(pose.q)
    w = pts.xyz @ R.T + pose.t
    nn = knn(m, w, pts.mask, cfg.k_neighbors, map_cfg)
    gate = nn.sq_dists[:, cfg.k_neighbors - 1] < gate_sq
    plane = fit_planes(nn.points, nn.valid, tol)
    ok = pts.mask & gate & plane.ok
    return PlaneCorr(plane.normal, plane.offset, ok)


def _nonfeature_residuals(ws: WindowState, frame: int, others: PointBatch,
                          corr: PlaneCorr, huber: float) -> jnp.ndarray:
    """Weighted point-to-plane residual rows for the non-feature class."""
    R = so3.quat_to_matrix(ws.q[frame])
    ow = others.xyz @ R.T + ws.t[frame]
    r = jnp.einsum("ni,ni->n", corr.n, ow) + corr.d
    r = jnp.where(corr.ok, r, 0.0)
    w = jnp.sqrt(jnp.minimum(1.0, huber / jnp.maximum(jnp.abs(r), 1e-12)))
    w = jax.lax.stop_gradient(jnp.where(corr.ok, w, 0.0))
    return r * w


class WindowState(NamedTuple):
    """F window frames: world poses + velocity + IMU biases (per frame)."""

    q: jnp.ndarray  # (F,4)
    t: jnp.ndarray  # (F,3)
    v: jnp.ndarray  # (F,3)
    bg: jnp.ndarray  # (F,3)
    ba: jnp.ndarray  # (F,3)

    @property
    def frames(self) -> int:
        return self.q.shape[0]


class MarginalPrior(NamedTuple):
    """Gaussian prior on the remaining window from marginalized history:
    r(dx) = sqrt_H (dx - dx0), linearized at the stored state."""

    H: jnp.ndarray  # ((F)*15, (F)*15) information
    b: jnp.ndarray  # ((F)*15,) information vector
    q0: jnp.ndarray  # (F,4) linearization poses
    t0: jnp.ndarray
    v0: jnp.ndarray
    bg0: jnp.ndarray
    ba0: jnp.ndarray


def empty_prior(n_frames: int) -> MarginalPrior:
    D = n_frames * D_FRAME
    return MarginalPrior(
        H=jnp.zeros((D, D)), b=jnp.zeros((D,)),
        q0=jnp.tile(so3.quat_identity()[None], (n_frames, 1)),
        t0=jnp.zeros((n_frames, 3)), v0=jnp.zeros((n_frames, 3)),
        bg0=jnp.zeros((n_frames, 3)), ba0=jnp.zeros((n_frames, 3)),
    )


def _apply_delta(ws: WindowState, dx: jnp.ndarray) -> WindowState:
    d = dx.reshape(ws.frames, D_FRAME)
    return WindowState(
        q=so3.quat_normalize(so3.quat_mul(ws.q, so3.quat_exp(d[:, 0:3]))),
        t=ws.t + d[:, 3:6],
        v=ws.v + d[:, 6:9],
        bg=ws.bg + d[:, 9:12],
        ba=ws.ba + d[:, 12:15],
    )


def _imu_residual(ws: WindowState, i: int, pre: Preintegrated, grav: jnp.ndarray):
    """15-dim preintegration residual between window frames i and i+1."""
    qi, ti, vi = ws.q[i], ws.t[i], ws.v[i]
    qj, tj, vj = ws.q[i + 1], ws.t[i + 1], ws.v[i + 1]
    dt = pre.dt
    # first-order bias correction at the current bias estimate
    dbg = ws.bg[i] - pre.bg
    dba = ws.ba[i] - pre.ba
    db = jnp.concatenate([dbg, dba])
    dq_c = so3.quat_mul(pre.dq, so3.quat_exp(pre.J_bias[0:3, 0:3] @ dbg))
    dv_c = pre.dv + pre.J_bias[3:6] @ db
    dp_c = pre.dp + pre.J_bias[6:9] @ db

    qi_c = so3.quat_conj(qi)
    r_R = so3.quat_log(so3.quat_mul(so3.quat_conj(dq_c), so3.quat_mul(qi_c, qj)))
    r_v = so3.quat_rotate(qi_c, vj - vi - grav * dt) - dv_c
    r_p = so3.quat_rotate(qi_c, tj - ti - vi * dt - 0.5 * grav * dt * dt) - dp_c
    r_bg = ws.bg[i + 1] - ws.bg[i]
    r_ba = ws.ba[i + 1] - ws.ba[i]
    return jnp.concatenate([r_R, r_v, r_p, r_bg, r_ba])


def _lidar_residuals(ws: WindowState, frame: int, corners: PointBatch,
                     surfs: PointBatch, corr: Correspondences, huber: float):
    """Weighted edge + plane residual vector for one window frame."""
    R = so3.quat_to_matrix(ws.q[frame])
    t = ws.t[frame]
    cw = corners.xyz @ R.T + t
    u = corr.line_dir
    P = jnp.eye(3) - u[:, :, None] * u[:, None, :]
    e = jnp.einsum("nij,nj->ni", P, cw - corr.line_centroid)
    e = jnp.where(corr.ok_c[:, None], e, 0.0)
    # IRLS weights are held constant per linearization (stop_gradient): the
    # residual is differentiated by jacfwd, and d|e|/de at masked zero rows
    # would otherwise inject NaN into the Jacobian
    w_c = jnp.sqrt(jnp.minimum(1.0, huber / jnp.maximum(jnp.linalg.norm(e, axis=-1), 1e-12)))
    w_c = jax.lax.stop_gradient(jnp.where(corr.ok_c, w_c, 0.0))
    sw = surfs.xyz @ R.T + t
    r_s = jnp.einsum("ni,ni->n", corr.plane_n, sw) + corr.plane_d
    r_s = jnp.where(corr.ok_s, r_s, 0.0)
    w_s = jnp.sqrt(jnp.minimum(1.0, huber / jnp.maximum(jnp.abs(r_s), 1e-12)))
    w_s = jax.lax.stop_gradient(jnp.where(corr.ok_s, w_s, 0.0))
    return jnp.concatenate([(e * w_c[:, None]).reshape(-1), r_s * w_s])


def _sqrt_info(cov: jnp.ndarray) -> jnp.ndarray:
    """Upper sqrt-information factor of a covariance (15x15)."""
    L = jnp.linalg.cholesky(cov + 1e-8 * jnp.eye(cov.shape[0]))
    return jax.scipy.linalg.solve_triangular(L, jnp.eye(cov.shape[0]), lower=True)


def solve_window(
    ws: WindowState,
    corners: PointBatch,  # (F, Nc, 3)/(F, Nc) stacked per-frame features
    surfs: PointBatch,
    corner_map: HashVoxelMap,
    surf_map: HashVoxelMap,
    preints: Preintegrated,  # batched (F-1,) preintegration between frames
    prior: MarginalPrior,
    grav: jnp.ndarray,
    cmap_cfg: MapConfig,
    smap_cfg: MapConfig,
    cfg: SolverConfig,
    lidar_weight: float = 30.0,
    others: PointBatch | None = None,  # (F, No, 3) non-feature class
    other_map: HashVoxelMap | None = None,
    omap_cfg: MapConfig | None = None,
    nonfeature_weight: float = 10.0,
) -> Tuple[WindowState, jnp.ndarray]:
    """Windowed MAP solve (LIO-Livox Estimate: 5 outer iterations).
    Returns (state, final residual norm)."""
    F = ws.frames
    D = F * D_FRAME
    sqrtW = jax.vmap(_sqrt_info)(preints.cov)  # (F-1,15,15)
    use_others = others is not None and other_map is not None

    def outer(_, carry):
        ws, _ = carry
        corrs = []
        ocorrs = []
        for f in range(F):
            corrs.append(
                associate(se3.Pose(ws.q[f], ws.t[f]),
                          PointBatch(corners.xyz[f], corners.mask[f]),
                          PointBatch(surfs.xyz[f], surfs.mask[f]),
                          corner_map, surf_map, cmap_cfg, smap_cfg, cfg)
            )
            if use_others:
                ocorrs.append(associate_nonfeature(
                    se3.Pose(ws.q[f], ws.t[f]),
                    PointBatch(others.xyz[f], others.mask[f]),
                    other_map, omap_cfg, cfg))

        def inner(_, carry2):
            ws_c, _ = carry2

            def residual(dx):
                # NOTE: must linearize around ws_c (the inner-loop state), not
                # the outer-loop state the correspondences were built at
                w = _apply_delta(ws_c, dx)
                parts = []
                for f in range(F):
                    parts.append(lidar_weight * _lidar_residuals(
                        w, f, PointBatch(corners.xyz[f], corners.mask[f]),
                        PointBatch(surfs.xyz[f], surfs.mask[f]), corrs[f],
                        cfg.huber_delta))
                    if use_others:
                        parts.append(nonfeature_weight * _nonfeature_residuals(
                            w, f, PointBatch(others.xyz[f], others.mask[f]),
                            ocorrs[f], cfg.huber_delta))
                for f in range(F - 1):
                    pre_f = jax.tree.map(lambda x: x[f], preints)
                    parts.append(sqrtW[f] @ _imu_residual(w, f, pre_f, grav))
                return jnp.concatenate(parts)

            dx0 = jnp.zeros(D)
            r0 = residual(dx0)
            J = jax.jacfwd(residual)(dx0)
            H = J.T @ J + 1e-4 * jnp.eye(D)
            g = J.T @ r0
            # marginalization prior: r_p = H_prior (x [-] x0) - b residual form
            dx_lin = _boxminus_flat(ws_c, prior)
            H = H + prior.H
            g = g + prior.H @ dx_lin - prior.b
            dx = -jnp.linalg.solve(H, g)
            return _apply_delta(ws_c, dx), jnp.linalg.norm(r0)

        ws, rn = jax.lax.fori_loop(0, cfg.n_inner, inner, (ws, jnp.float32(0.0)))
        return ws, rn

    return jax.lax.fori_loop(0, cfg.n_outer, outer, (ws, jnp.float32(0.0)))


def _boxminus_flat(ws: WindowState, prior: MarginalPrior) -> jnp.ndarray:
    """Flattened manifold difference between the state and the prior's
    linearization point."""
    dth = so3.quat_log(so3.quat_mul(so3.quat_conj(prior.q0), ws.q))
    d = jnp.concatenate(
        [dth, ws.t - prior.t0, ws.v - prior.v0, ws.bg - prior.bg0, ws.ba - prior.ba0],
        axis=-1,
    )
    return d.reshape(-1)


def marginalize_oldest(
    ws: WindowState,
    H_full: jnp.ndarray,  # (F*15, F*15) information at the solution
    b_full: jnp.ndarray,
) -> MarginalPrior:
    """Schur-complement frame 0 out of the window (Estimator.cpp:1188-1301).

    Returns a prior over frames 1..F-1 linearized at the current state; callers
    shift the window and pad a fresh frame with zero prior information.
    """
    m = D_FRAME
    Hmm = H_full[:m, :m] + 1e-6 * jnp.eye(m)
    Hmr = H_full[:m, m:]
    Hrr = H_full[m:, m:]
    bm = b_full[:m]
    br = b_full[m:]
    Hmm_inv = jnp.linalg.inv(Hmm)
    H_pr = Hrr - Hmr.T @ Hmm_inv @ Hmr
    b_pr = br - Hmr.T @ Hmm_inv @ bm
    # project to PSD: f32 roundoff in the Schur complement leaves tiny negative
    # eigenvalues (~1e-7 of the largest) that would poison later solves
    H_pr = 0.5 * (H_pr + H_pr.T)
    vals, vecs = jnp.linalg.eigh(H_pr)
    H_pr = (vecs * jnp.maximum(vals, 0.0)[None, :]) @ vecs.T
    # NOTE: b_full is the *negative* gradient (-J^T r, per window_information),
    # so the Schur-reduced b_pr keeps that convention; both consumers
    # (solve_window's `g + H dx_lin - b` and the livox fold) expect +b_pr.
    # Round-1 stored -b_pr, which drove the window to the negated optimum.
    return MarginalPrior(
        H=H_pr, b=b_pr,
        q0=ws.q[1:], t0=ws.t[1:], v0=ws.v[1:], bg0=ws.bg[1:], ba0=ws.ba[1:],
    )


def window_information(
    ws: WindowState,
    corners: PointBatch,
    surfs: PointBatch,
    corner_map: HashVoxelMap,
    surf_map: HashVoxelMap,
    preints: Preintegrated,
    grav: jnp.ndarray,
    cmap_cfg: MapConfig,
    smap_cfg: MapConfig,
    cfg: SolverConfig,
    lidar_weight: float = 30.0,
    others: PointBatch | None = None,
    other_map: HashVoxelMap | None = None,
    omap_cfg: MapConfig | None = None,
    nonfeature_weight: float = 10.0,
):
    """(H, b) of the full window at the current state (for marginalization)."""
    F = ws.frames
    D = F * D_FRAME
    sqrtW = jax.vmap(_sqrt_info)(preints.cov)
    use_others = others is not None and other_map is not None
    corrs = [
        associate(se3.Pose(ws.q[f], ws.t[f]),
                  PointBatch(corners.xyz[f], corners.mask[f]),
                  PointBatch(surfs.xyz[f], surfs.mask[f]),
                  corner_map, surf_map, cmap_cfg, smap_cfg, cfg)
        for f in range(F)
    ]
    ocorrs = [
        associate_nonfeature(se3.Pose(ws.q[f], ws.t[f]),
                             PointBatch(others.xyz[f], others.mask[f]),
                             other_map, omap_cfg, cfg)
        for f in range(F)
    ] if use_others else []

    def residual(dx):
        w = _apply_delta(ws, dx)
        parts = []
        for f in range(F):
            parts.append(lidar_weight * _lidar_residuals(
                w, f, PointBatch(corners.xyz[f], corners.mask[f]),
                PointBatch(surfs.xyz[f], surfs.mask[f]), corrs[f], cfg.huber_delta))
            if use_others:
                parts.append(nonfeature_weight * _nonfeature_residuals(
                    w, f, PointBatch(others.xyz[f], others.mask[f]),
                    ocorrs[f], cfg.huber_delta))
        for f in range(F - 1):
            pre_f = jax.tree.map(lambda x: x[f], preints)
            parts.append(sqrtW[f] @ _imu_residual(w, f, pre_f, grav))
        return jnp.concatenate(parts)

    dx0 = jnp.zeros(D)
    r0 = residual(dx0)
    J = jax.jacfwd(residual)(dx0)
    return J.T @ J, -(J.T @ r0)
