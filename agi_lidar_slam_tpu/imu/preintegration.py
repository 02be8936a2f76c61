"""IMU preintegration (Forster-style, on-manifold) as a lax.scan.

Replaces:
* LIO-Livox IMUIntegrator (IMUIntegrator.h:11-100): midpoint-rule
  preintegration of {dq, dp, dv} with 15x15 covariance and 15x15 bias
  Jacobian,
* GTSAM PreintegratedImuMeasurements as used by LIO-SAM
  (imuPreintegration.cpp:206-207, 293-299).

Error-state ordering (15): [dtheta(0:3), dv(3:6), dp(6:9), dbg(9:12), dba(12:15)].

All inputs are fixed-size padded arrays with a validity mask, so one jitted
scan handles any number of IMU samples between two scans.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import so3


class ImuNoise(NamedTuple):
    """Continuous-time noise densities (LIO-Livox IMUIntegrator.h: acc_n=0.08,
    gyr_n=0.004, acc_w=2e-4, gyr_w=2e-5; LIO-SAM params.yaml imuAccNoise etc.)."""

    acc_n: float = 0.08
    gyr_n: float = 0.004
    acc_w: float = 2.0e-4
    gyr_w: float = 2.0e-5


class Preintegrated(NamedTuple):
    """Relative motion between two stamps, expressed in the first IMU frame."""

    dq: jnp.ndarray  # (4,) rotation i->j
    dp: jnp.ndarray  # (3,)
    dv: jnp.ndarray  # (3,)
    dt: jnp.ndarray  # () total time
    cov: jnp.ndarray  # (15,15) error covariance
    J_bias: jnp.ndarray  # (15,6) d[state]/d[bg, ba] for bias-correction updates
    bg: jnp.ndarray  # (3,) linearization gyro bias
    ba: jnp.ndarray  # (3,) linearization accel bias


def compose_ltv(F: jnp.ndarray, Qd: jnp.ndarray):
    """Compose a linear time-varying error recurrence cov' = F cov F^T + Qd.

    F (N,D,D), Qd (N,D,D) applied in order 1..N. Returns the prefix
    compositions (A (N,D,D), C (N,D,D)) with A_k = F_k ... F_1 and C_k the
    accumulated noise — via jax.lax.associative_scan: log2(N) levels of
    BATCHED small matmuls instead of N sequential steps (the lax.scan
    formulation is latency-bound on TPU: ~20 dependent 15x15/24x24 chains
    per IMU window)."""

    def op(a, b):
        Aa, Ca = a
        Ab, Cb = b
        return Ab @ Aa, Ab @ Ca @ jnp.swapaxes(Ab, -1, -2) + Cb

    return jax.lax.associative_scan(op, (F, Qd))


def quat_prefix(dqs: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix products of per-step quaternions (N,4):
    out_k = dq_1 * dq_2 * ... * dq_k (body-frame composition order)."""

    def op(a, b):
        return so3.quat_normalize(so3.quat_mul(a, b))

    return jax.lax.associative_scan(op, dqs)


def preintegrate(
    gyro: jnp.ndarray,  # (N,3) body rates
    acc: jnp.ndarray,  # (N,3) specific force
    dts: jnp.ndarray,  # (N,) sample intervals
    mask: jnp.ndarray,  # (N,) valid samples
    bg: jnp.ndarray,
    ba: jnp.ndarray,
    noise: ImuNoise = ImuNoise(),
) -> Preintegrated:
    """Integrate a padded IMU window. Invalid samples are skipped exactly
    (dt forced to 0).

    Batched formulation: per-step rotations / transitions are built for ALL
    samples at once, prefix-composed with associative scans (quat_prefix /
    compose_ltv), and the mean integrals reduce to cumsums — no sequential
    lax.scan chain. Parity with the step-by-step recurrence is pinned by
    tests/test_imu.py."""
    N = gyro.shape[0]
    dts = jnp.where(mask, dts, 0.0)

    w_c = gyro - bg[None, :]
    a_c = acc - ba[None, :]

    # --- mean: prefix rotations + cumsum integrals --------------------------
    dq_steps = so3.quat_exp(w_c * dts[:, None])  # (N,4)
    q_incl = quat_prefix(dq_steps)  # (N,4) rotation after step k
    q_excl = jnp.concatenate([so3.quat_identity()[None], q_incl[:-1]], axis=0)
    R_excl = so3.quat_to_matrix(q_excl)  # (N,3,3) frame-0 <- frame before k
    a0 = jnp.einsum("nij,nj->ni", R_excl, a_c)  # accel in frame 0
    dv_steps = a0 * dts[:, None]
    dv_excl = jnp.cumsum(dv_steps, axis=0) - dv_steps  # dv before step k
    dp = jnp.sum(dv_excl * dts[:, None] + 0.5 * a0 * dts[:, None] ** 2, axis=0)
    dv = jnp.sum(dv_steps, axis=0)
    dq = q_incl[-1]
    T = jnp.sum(dts)

    # --- covariance + bias Jacobian: batched (F, Qd) composition ------------
    dt1 = dts[:, None, None]
    I3 = jnp.broadcast_to(jnp.eye(3), (N, 3, 3))
    Rh = jnp.einsum("nij,njk->nik", R_excl, so3.hat(a_c))  # (N,3,3)
    F = jnp.broadcast_to(jnp.eye(15), (N, 15, 15))
    F = F.at[:, 0:3, 0:3].set(jax.vmap(so3.exp_matrix)(-w_c * dts[:, None]))
    F = F.at[:, 0:3, 9:12].set(-I3 * dt1)
    F = F.at[:, 3:6, 0:3].set(-Rh * dt1)
    F = F.at[:, 3:6, 12:15].set(-R_excl * dt1)
    F = F.at[:, 6:9, 3:6].set(I3 * dt1)
    F = F.at[:, 6:9, 0:3].set(-0.5 * Rh * dt1 * dt1)
    F = F.at[:, 6:9, 12:15].set(-0.5 * R_excl * dt1 * dt1)

    # Qd = G Qc G^T / dt with G block-sparse: assemble directly
    s = 1.0 / jnp.maximum(dts, 1e-6)[:, None, None]
    gn2 = noise.gyr_n**2
    an2 = noise.acc_n**2
    RRt = jnp.einsum("nij,nkj->nik", R_excl, R_excl)  # = I, but keep exact form
    Qd = jnp.zeros((N, 15, 15))
    Qd = Qd.at[:, 0:3, 0:3].set(I3 * gn2 * dt1 * dt1 * s)
    Qd = Qd.at[:, 3:6, 3:6].set(RRt * an2 * dt1 * dt1 * s)
    Qd = Qd.at[:, 3:6, 6:9].set(RRt * an2 * 0.5 * dt1**3 * s)
    Qd = Qd.at[:, 6:9, 3:6].set(RRt * an2 * 0.5 * dt1**3 * s)
    Qd = Qd.at[:, 6:9, 6:9].set(RRt * an2 * 0.25 * dt1**4 * s)
    Qd = Qd.at[:, 9:12, 9:12].set(I3 * noise.gyr_w**2 * dt1 * dt1 * s)
    Qd = Qd.at[:, 12:15, 12:15].set(I3 * noise.acc_w**2 * dt1 * dt1 * s)

    A, C = compose_ltv(F, Qd)
    cov = C[-1]
    # J propagates as J' = F J from the bias-identity init, so J_N = A_N J_0
    J0 = jnp.zeros((15, 6)).at[9:12, 0:3].set(jnp.eye(3)).at[12:15, 3:6].set(jnp.eye(3))
    J = A[-1] @ J0
    return Preintegrated(dq, dp, dv, T, cov, J, bg, ba)


def preintegrate_scan(
    gyro: jnp.ndarray,  # (N,3) body rates
    acc: jnp.ndarray,  # (N,3) specific force
    dts: jnp.ndarray,  # (N,) sample intervals
    mask: jnp.ndarray,  # (N,) valid samples
    bg: jnp.ndarray,
    ba: jnp.ndarray,
    noise: ImuNoise = ImuNoise(),
) -> Preintegrated:
    """Step-by-step lax.scan reference implementation (the oracle for the
    batched `preintegrate`; kept for the parity test and readability)."""
    dts = jnp.where(mask, dts, 0.0)

    Qc = jnp.zeros((12, 12))
    Qc = Qc.at[0:3, 0:3].set(jnp.eye(3) * noise.gyr_n**2)
    Qc = Qc.at[3:6, 3:6].set(jnp.eye(3) * noise.acc_n**2)
    Qc = Qc.at[6:9, 6:9].set(jnp.eye(3) * noise.gyr_w**2)
    Qc = Qc.at[9:12, 9:12].set(jnp.eye(3) * noise.acc_w**2)

    def step(carry, inp):
        dq, dp, dv, T, cov, J = carry
        w, a, dt = inp
        w_c = w - bg
        a_c = a - ba
        R = so3.quat_to_matrix(dq)
        dq_step = so3.quat_exp(w_c * dt)

        # midpoint-ish accel in the start frame
        a0 = R @ a_c
        dp_n = dp + dv * dt + 0.5 * a0 * dt * dt
        dv_n = dv + a0 * dt
        dq_n = so3.quat_normalize(so3.quat_mul(dq, dq_step))

        # error-state transition F (15x15)
        F = jnp.eye(15)
        Rstep = so3.exp_matrix(-w_c * dt)  # dtheta' = Exp(-w dt) dtheta - dt dbg
        F = F.at[0:3, 0:3].set(Rstep)
        F = F.at[0:3, 9:12].set(-jnp.eye(3) * dt)
        F = F.at[3:6, 0:3].set(-R @ so3.hat(a_c) * dt)
        F = F.at[3:6, 12:15].set(-R * dt)
        F = F.at[6:9, 3:6].set(jnp.eye(3) * dt)
        F = F.at[6:9, 0:3].set(-0.5 * R @ so3.hat(a_c) * dt * dt)
        F = F.at[6:9, 12:15].set(-0.5 * R * dt * dt)

        G = jnp.zeros((15, 12))
        G = G.at[0:3, 0:3].set(jnp.eye(3) * dt)
        G = G.at[3:6, 3:6].set(R * dt)
        G = G.at[6:9, 3:6].set(0.5 * R * dt * dt)
        G = G.at[9:12, 6:9].set(jnp.eye(3) * dt)
        G = G.at[12:15, 9:12].set(jnp.eye(3) * dt)

        # discrete noise: Qd = G Qc G^T / dt (Qc are continuous densities)
        cov_n = F @ cov @ F.T + G @ Qc @ G.T / jnp.maximum(dt, 1e-6)
        # bias sensitivity: biases live in the 15-state, so J (15x6, columns
        # [dbg, dba]) propagates with the same F; rows 9:15 stay identity
        J_n = F @ J
        return (dq_n, dp_n, dv_n, T + dt, cov_n, J_n), None

    init = (
        so3.quat_identity(),
        jnp.zeros(3),
        jnp.zeros(3),
        jnp.float32(0.0),
        jnp.zeros((15, 15)),
        jnp.zeros((15, 6)).at[9:12, 0:3].set(jnp.eye(3)).at[12:15, 3:6].set(jnp.eye(3)),
    )
    (dq, dp, dv, T, cov, J), _ = jax.lax.scan(step, init, (gyro, acc, dts))
    # J maps [dbg,dba] -> 15-dim error; downstream correction uses rows:
    #   dtheta: J[0:3,0:3], dv: J[3:6,:], dp: J[6:9,:]
    return Preintegrated(dq, dp, dv, T, cov, J[:, :6], bg, ba)


def bias_corrected(pre: Preintegrated, bg_new: jnp.ndarray, ba_new: jnp.ndarray):
    """First-order bias correction (the reference applies the same correction in
    Cost_NavState_PRV_Bias, ceresfunc.h:337-433): returns (dq, dp, dv) at the
    new bias estimate without re-integration."""
    dbg = bg_new - pre.bg
    dba = ba_new - pre.ba
    d = jnp.concatenate([dbg, dba])
    dq = so3.quat_mul(pre.dq, so3.quat_exp(pre.J_bias[0:3, 0:3] @ dbg))
    dv = pre.dv + pre.J_bias[3:6] @ d
    dp = pre.dp + pre.J_bias[6:9] @ d
    return so3.quat_normalize(dq), dp, dv
