"""Dynamic (moving-start) MAP initialization of gravity / velocity / biases.

Re-designs LIO-Livox `TryMAPInitialization` (PoseEstimation.cpp:189-377):
the reference runs LiDAR-only odometry over a ~20-frame init window, then
Ceres-solves {gravity direction (Cost_Initial_G :682), per-frame velocities,
shared gyro/accel bias (Cost_Initialization_IMU :709)} against the IMU
preintegrations between frames, and accepts if the biases/velocities land in
bounds (:334-351). A stationary start is a special case (`imu/eskf.static_init`).

TPU-native formulation — the problem is (almost) linear, so no Ceres:
1. gyro bias: rotation-only linear least squares
   log(dq_i^-1 (q_i^-1 q_{i+1})) ≈ J_q^i dbg   (VINS-style),
2. {g, v_0..v_{F-1}, ba}: exactly linear in the dv/dp preintegration
   residuals given poses -> one dense lstsq,
3. gravity-magnitude constraint: re-solve with g = 9.81·ĝ + B(ĝ)w, w ∈ R²
   (2-dof tangent refinement, iterated twice).

All shapes static in the window length F; the whole init is one jitted call.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import so3
from .preintegration import Preintegrated

G_NORM = 9.81
BA_PRIOR_W = 2.0  # zero-mean accel-bias prior (sigma 0.5 m/s^2): tames the
# gravity/bias collinearity in low-rotation init windows


class InitResult(NamedTuple):
    grav: jnp.ndarray  # (3,) world gravity (magnitude G_NORM)
    v: jnp.ndarray  # (F,3) per-frame world velocities
    bg: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)
    rms: jnp.ndarray  # () residual RMS of the final solve (m/s, m mixed)
    ok: jnp.ndarray  # () bool: bounds check passed (PoseEstimation.cpp:334-351)


def _tangent_basis(g_dir: jnp.ndarray) -> jnp.ndarray:
    """(3,2) orthonormal basis of the plane perpendicular to g_dir."""
    ref = jnp.where(jnp.abs(g_dir[0]) < 0.9,
                    jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    b1 = jnp.cross(g_dir, ref)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-9)
    b2 = jnp.cross(g_dir, b1)
    return jnp.stack([b1, b2], axis=1)


def _solve_gyro_bias(qs: jnp.ndarray, preints: Preintegrated) -> jnp.ndarray:
    """dbg from rotation residuals (first-order in J_bias[0:3,0:3])."""
    qij = so3.quat_mul(so3.quat_conj(qs[:-1]), qs[1:])  # (F-1,4)
    e = so3.quat_log(so3.quat_mul(so3.quat_conj(preints.dq), qij))  # (F-1,3)
    J = preints.J_bias[:, 0:3, 0:3]  # (F-1,3,3)
    H = jnp.einsum("nij,nik->jk", J, J) + 1e-6 * jnp.eye(3)
    g = jnp.einsum("nij,ni->j", J, e)
    return jnp.linalg.solve(H, g)


def _linear_system(qs, ts, preints, bg_delta, g_fixed=None, g_basis=None,
                   ba_prior_w: float = 0.0):
    """Assemble A x = b for x = [g(3 or 2), v(3F), ba(3)].

    Rows per interval i (expressed in frame i's body axes):
      r_v: R_i^T (v_{i+1} - v_i - g dt)          = dv_i + J_v [dbg; ba]
      r_p: R_i^T (t_{i+1}-t_i - v_i dt - g dt²/2) = dp_i + J_p [dbg; ba]

    With little rotation in the window, gravity and accel bias are nearly
    collinear (both enter as a constant body-frame acceleration), so
    `ba_prior_w` adds a zero-mean prior row block on ba (the reference keeps
    the same degeneracy in check by fitting gravity first, Cost_Initial_G
    ceresfunc.h:682, and bounding the bias, PoseEstimation.cpp:334-351).
    """
    F = qs.shape[0]
    n = preints.dq.shape[0]  # F-1 intervals
    Ri_T = jnp.swapaxes(so3.quat_to_matrix(qs[:-1]), -1, -2)  # (n,3,3)
    dt = preints.dt  # (n,)
    Jv = preints.J_bias[:, 3:6]  # (n,3,6)
    Jp = preints.J_bias[:, 6:9]
    # rhs includes the known gyro-bias correction
    rhs_v = preints.dv + Jv[..., 0:3] @ bg_delta  # (n,3)
    rhs_p = preints.dp + Jp[..., 0:3] @ bg_delta
    ng = 2 if g_basis is not None else 3
    D = ng + 3 * F + 3
    A = jnp.zeros((n, 6, D))
    b = jnp.zeros((n, 6))
    ii = jnp.arange(n)
    # gravity columns
    Gv = -Ri_T * dt[:, None, None]  # d r_v / d g
    Gp = -0.5 * Ri_T * (dt**2)[:, None, None]
    if g_basis is not None:
        Gv = Gv @ g_basis
        Gp = Gp @ g_basis
        b = b.at[:, 0:3].add(jnp.einsum("nij,j->ni", Ri_T * dt[:, None, None], g_fixed))
        b = b.at[:, 3:6].add(jnp.einsum(
            "nij,j->ni", 0.5 * Ri_T * (dt**2)[:, None, None], g_fixed))
    A = A.at[:, 0:3, 0:ng].set(Gv)
    A = A.at[:, 3:6, 0:ng].set(Gp)

    # velocity columns: r_v has -R^T v_i + R^T v_{i+1}; r_p has -R^T dt v_i
    # (static-shape assembly: Python loop over the static window length)
    for i in range(n):
        col_i = ng + 3 * i
        col_j = ng + 3 * (i + 1)
        A = A.at[i, 0:3, col_i:col_i + 3].set(-Ri_T[i])
        A = A.at[i, 0:3, col_j:col_j + 3].set(Ri_T[i])
        A = A.at[i, 3:6, col_i:col_i + 3].set(-Ri_T[i] * dt[i])
    # accel-bias columns: dba enters the residual with -J_ba
    A = A.at[:, 0:3, D - 3:D].set(-Jv[..., 3:6])
    A = A.at[:, 3:6, D - 3:D].set(-Jp[..., 3:6])

    b = b.at[:, 0:3].add(rhs_v)
    b = b.at[:, 3:6].add(rhs_p - jnp.einsum("nij,nj->ni", Ri_T, (ts[1:] - ts[:-1])))
    A_flat, b_flat = A.reshape(n * 6, D), b.reshape(n * 6)
    if ba_prior_w > 0.0:
        prior = jnp.zeros((3, D)).at[:, D - 3:D].set(ba_prior_w * jnp.eye(3))
        A_flat = jnp.concatenate([A_flat, prior], axis=0)
        b_flat = jnp.concatenate([b_flat, jnp.zeros(3)], axis=0)
    return A_flat, b_flat


@functools.partial(jax.jit, static_argnames=())
def map_initialize(qs: jnp.ndarray, ts: jnp.ndarray,
                   preints: Preintegrated) -> InitResult:
    """MAP init over a window of F LiDAR-odometry poses (qs (F,4), ts (F,3))
    and the F-1 preintegrations between them (batched, integrated at the
    biases stored in `preints.bg/ba` — normally zero)."""
    F = qs.shape[0]
    dbg = _solve_gyro_bias(qs, preints)
    bg = preints.bg[0] + dbg

    # --- free-gravity linear solve -----------------------------------------
    A, b = _linear_system(qs, ts, preints, dbg, ba_prior_w=BA_PRIOR_W)
    x = jnp.linalg.lstsq(A, b)[0]
    g_est = x[0:3]

    # --- magnitude-constrained 2-dof refinement ----------------------------
    def refine(g_prev):
        g_dir = g_prev / jnp.maximum(jnp.linalg.norm(g_prev), 1e-9)
        g_fixed = G_NORM * g_dir
        B = _tangent_basis(g_dir)
        A2, b2 = _linear_system(qs, ts, preints, dbg, g_fixed=g_fixed, g_basis=B,
                                ba_prior_w=BA_PRIOR_W)
        x2 = jnp.linalg.lstsq(A2, b2)[0]
        g_new = g_fixed + B @ x2[0:2]
        resid = A2 @ x2 - b2
        return g_new, x2, jnp.sqrt(jnp.mean(resid**2))

    g_est, _, _ = refine(g_est)
    g_est, x2, rms = refine(g_est)  # (g_est, x2, rms) consistent: same basis
    v = x2[2:2 + 3 * F].reshape(F, 3)
    ba = preints.ba[0] + x2[-3:]

    # acceptance bounds (PoseEstimation.cpp:334-351: bias/velocity sanity)
    ok = (
        (jnp.linalg.norm(bg) < 0.5)
        & (jnp.linalg.norm(ba) < 1.0)
        & (jnp.max(jnp.linalg.norm(v, axis=-1)) < 30.0)
        & jnp.isfinite(rms)
    )
    return InitResult(g_est, v, bg, ba, rms, ok)
