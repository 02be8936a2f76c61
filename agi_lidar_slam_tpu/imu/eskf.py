"""24-dim error-state Kalman filter state and propagation (FAST-LIO2 family).

TPU-native re-design of S-FAST_LIO's use-ikfom.hpp (state_ikfom :18-27,
get_f :57-75, df_dx :85-101, df_dw :111-123) and the predict step of
esekfom.hpp (:82-95).

State (manifold): p, q (world_R_imu), q_li/t_li (lidar->IMU extrinsic),
v, bg, ba, g. Error ordering matches use-ikfom:
  [dp(0:3), dtheta(3:6), dtheta_li(6:9), dt_li(9:12), dv(12:15),
   dbg(15:18), dba(18:21), dg(21:24)]
Rotation errors are right-multiplicative: q <- q * exp(dtheta).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geometry import so3

DIM = 24


class NavState(NamedTuple):
    p: jnp.ndarray  # (3,)
    q: jnp.ndarray  # (4,) world_R_imu
    q_li: jnp.ndarray  # (4,) imu_R_lidar
    t_li: jnp.ndarray  # (3,)
    v: jnp.ndarray  # (3,)
    bg: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)
    g: jnp.ndarray  # (3,) gravity in world (approx [0,0,-9.81])

    @staticmethod
    def identity() -> "NavState":
        return NavState(
            p=jnp.zeros(3), q=so3.quat_identity(), q_li=so3.quat_identity(),
            t_li=jnp.zeros(3), v=jnp.zeros(3), bg=jnp.zeros(3), ba=jnp.zeros(3),
            g=jnp.asarray([0.0, 0.0, -9.81]),
        )


def boxplus(x: NavState, dx: jnp.ndarray) -> NavState:
    """x [+] dx for the 24-dim error vector (esekfom.hpp boxplus :59-73)."""
    return NavState(
        p=x.p + dx[0:3],
        q=so3.quat_normalize(so3.quat_mul(x.q, so3.quat_exp(dx[3:6]))),
        q_li=so3.quat_normalize(so3.quat_mul(x.q_li, so3.quat_exp(dx[6:9]))),
        t_li=x.t_li + dx[9:12],
        v=x.v + dx[12:15],
        bg=x.bg + dx[15:18],
        ba=x.ba + dx[18:21],
        g=x.g + dx[21:24],
    )


def boxminus(a: NavState, b: NavState) -> jnp.ndarray:
    """a [-] b (esekfom.hpp boxminus :236-258)."""
    return jnp.concatenate([
        a.p - b.p,
        so3.quat_log(so3.quat_mul(so3.quat_conj(b.q), a.q)),
        so3.quat_log(so3.quat_mul(so3.quat_conj(b.q_li), a.q_li)),
        a.t_li - b.t_li,
        a.v - b.v,
        a.bg - b.bg,
        a.ba - b.ba,
        a.g - b.g,
    ])


class EskfNoise(NamedTuple):
    """Process noise densities (S-FAST_LIO laserMapping.cpp:627-630 defaults:
    gyr_cov 0.1, acc_cov 0.1, b_gyr_cov 1e-4, b_acc_cov 1e-4)."""

    gyr: float = 0.1
    acc: float = 0.1
    bg: float = 1e-4
    ba: float = 1e-4


def predict(
    x: NavState, P: jnp.ndarray, gyro: jnp.ndarray, acc: jnp.ndarray, dt,
    noise: EskfNoise = EskfNoise(),
):
    """One IMU interval: mean + covariance propagation. Returns (x', P').

    Mean: q <- q*exp(w dt); v <- v + (R(a-ba)+g) dt; p <- p + v dt + 1/2 a dt^2.
    F_x / F_w follow use-ikfom df_dx/df_dw (first-order, as the reference).
    dt == 0 is an exact no-op (masked samples).
    """
    w_c = gyro - x.bg
    a_c = acc - x.ba
    R = so3.quat_to_matrix(x.q)
    a_w = R @ a_c + x.g

    x_n = NavState(
        p=x.p + x.v * dt + 0.5 * a_w * dt * dt,
        q=so3.quat_normalize(so3.quat_mul(x.q, so3.quat_exp(w_c * dt))),
        q_li=x.q_li, t_li=x.t_li,
        v=x.v + a_w * dt,
        bg=x.bg, ba=x.ba, g=x.g,
    )

    F = jnp.eye(DIM)
    F = F.at[0:3, 12:15].set(jnp.eye(3) * dt)  # dp <- dv
    F = F.at[3:6, 3:6].set(so3.exp_matrix(-w_c * dt))  # dtheta propagation
    F = F.at[3:6, 15:18].set(-jnp.eye(3) * dt)  # dtheta <- dbg
    F = F.at[12:15, 3:6].set(-R @ so3.hat(a_c) * dt)  # dv <- dtheta
    F = F.at[12:15, 18:21].set(-R * dt)  # dv <- dba
    F = F.at[12:15, 21:24].set(jnp.eye(3) * dt)  # dv <- dg

    Fw = jnp.zeros((DIM, 12))
    Fw = Fw.at[3:6, 0:3].set(-jnp.eye(3) * dt)  # gyro noise -> dtheta
    Fw = Fw.at[12:15, 3:6].set(-R * dt)  # acc noise -> dv
    Fw = Fw.at[15:18, 6:9].set(jnp.eye(3) * dt)  # bias walks
    Fw = Fw.at[18:21, 9:12].set(jnp.eye(3) * dt)

    Q = jnp.zeros((12, 12))
    Q = Q.at[0:3, 0:3].set(jnp.eye(3) * noise.gyr)
    Q = Q.at[3:6, 3:6].set(jnp.eye(3) * noise.acc)
    Q = Q.at[6:9, 6:9].set(jnp.eye(3) * noise.bg)
    Q = Q.at[9:12, 9:12].set(jnp.eye(3) * noise.ba)

    P_n = F @ P @ F.T + Fw @ Q @ Fw.T / jnp.maximum(dt, 1e-6)
    P_n = jnp.where(dt > 0, P_n, P)
    return x_n, P_n


def lidar_to_world(x: NavState, pts_l: jnp.ndarray) -> jnp.ndarray:
    """Lidar-frame points (N,3) -> world via the full extrinsic chain."""
    R_li = so3.quat_to_matrix(x.q_li)
    R = so3.quat_to_matrix(x.q)
    body = pts_l @ R_li.T + x.t_li
    return body @ R.T + x.p
