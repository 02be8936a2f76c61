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
    (dt forced to 0)."""
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
