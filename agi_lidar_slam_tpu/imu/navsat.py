"""GPS+IMU navsat fusion: the robot_localization `ekf_gps` analog.

The reference's LIO-SAM launch graph does not consume raw GPS: `run.launch`
includes robot_localization's navsat EKF (`ekf_gps`), which fuses IMU with
NavSatFix into a SMOOTHED local-frame odometry stream, and `gpsTopic:
"odometry/gpsz"` feeds THAT into addGPSFactor (LIO-SAM
config/params.yaml:23, launch/run.launch ekf_gps include). Round 3 ingested
raw ENU fixes directly; this module closes the gap: a 15-dim error-state KF
[dtheta, dv, dp, dbg, dba] that

  * predicts through each IMU window with the same batched associative-scan
    propagation the engines use (imu/preintegration.compose_ltv),
  * updates on each GPS fix with its reported position covariance,
  * emits a smoothed position + velocity + covariance stream — the
    "odometry/gpsz" equivalent to hand to LioSamDriver.process(gps=...) /
    slam_pipeline's GPS factors.

Host driver is a thin class; the per-window step is one jitted function.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import so3
from .preintegration import compose_ltv, quat_prefix


class NavsatState(NamedTuple):
    q: jnp.ndarray  # (4,) world_R_imu
    p: jnp.ndarray  # (3,)
    v: jnp.ndarray  # (3,)
    bg: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)
    P: jnp.ndarray  # (15,15) error cov [dtheta, dv, dp, dbg, dba]


class NavsatNoise(NamedTuple):
    """Continuous densities; defaults follow LIO-SAM's params.yaml IMU block
    (imuAccNoise 3.99e-2, imuGyrNoise 1.57e-3, walks 6.4e-5 / 3.5e-5)."""

    acc_n: float = 3.99e-2
    gyr_n: float = 1.57e-3
    acc_w: float = 6.4e-5
    gyr_w: float = 3.5e-5


def init_navsat(p0: jnp.ndarray | None = None,
                v0: jnp.ndarray | None = None,
                q0: jnp.ndarray | None = None,
                p0_sigma: float = 1.0,
                ori_sigma: float = 0.05,
                v_sigma: float = 0.2) -> NavsatState:
    # structured P0: a flat eye(15) would claim ~1 rad of attitude
    # uncertainty, and the first GPS update then launders position noise
    # into attitude/velocity corrections through the propagated
    # cross-covariances — the filter diverges instead of smoothing
    P0 = jnp.diag(jnp.concatenate([
        jnp.full(3, ori_sigma**2), jnp.full(3, v_sigma**2),
        jnp.full(3, p0_sigma**2), jnp.full(3, 1e-4), jnp.full(3, 1e-2),
    ]))
    return NavsatState(
        q=q0 if q0 is not None else so3.quat_identity(),
        p=p0 if p0 is not None else jnp.zeros(3),
        v=v0 if v0 is not None else jnp.zeros(3),
        bg=jnp.zeros(3), ba=jnp.zeros(3),
        P=P0,
    )


GRAV = jnp.asarray([0.0, 0.0, -9.81])


@functools.partial(jax.jit, static_argnames=("noise",))
def navsat_predict(st: NavsatState, gyro: jnp.ndarray, acc: jnp.ndarray,
                   dts: jnp.ndarray, mask: jnp.ndarray,
                   noise: NavsatNoise = NavsatNoise()) -> NavsatState:
    """Propagate through one padded IMU window (batched, no scan chain)."""
    M = gyro.shape[0]
    dts = jnp.where(mask, dts, 0.0)
    w_c = gyro - st.bg[None, :]
    a_c = acc - st.ba[None, :]

    dq_steps = so3.quat_exp(w_c * dts[:, None])
    q_incl = quat_prefix(dq_steps)
    qs = jnp.concatenate([st.q[None], so3.quat_normalize(
        so3.quat_mul(st.q[None], q_incl))], axis=0)
    R_excl = so3.quat_to_matrix(qs[:-1])
    a_w = jnp.einsum("nij,nj->ni", R_excl, a_c) + GRAV[None, :]
    dv_steps = a_w * dts[:, None]
    v_excl = st.v[None, :] + jnp.cumsum(dv_steps, axis=0) - dv_steps
    p_new = st.p + jnp.sum(v_excl * dts[:, None] + 0.5 * a_w * dts[:, None] ** 2,
                           axis=0)
    v_new = st.v + jnp.sum(dv_steps, axis=0)

    dt1 = dts[:, None, None]
    I3 = jnp.broadcast_to(jnp.eye(3), (M, 3, 3))
    Rh = jnp.einsum("nij,njk->nik", R_excl, so3.hat(a_c))
    F = jnp.broadcast_to(jnp.eye(15), (M, 15, 15))
    F = F.at[:, 0:3, 0:3].set(jax.vmap(so3.exp_matrix)(-w_c * dts[:, None]))
    F = F.at[:, 0:3, 9:12].set(-I3 * dt1)
    F = F.at[:, 3:6, 0:3].set(-Rh * dt1)
    F = F.at[:, 3:6, 12:15].set(-R_excl * dt1)
    F = F.at[:, 6:9, 3:6].set(I3 * dt1)
    s = 1.0 / jnp.maximum(dts, 1e-6)[:, None, None]
    Qd = jnp.zeros((M, 15, 15))
    Qd = Qd.at[:, 0:3, 0:3].set(I3 * noise.gyr_n**2 * dt1 * dt1 * s)
    Qd = Qd.at[:, 3:6, 3:6].set(I3 * noise.acc_n**2 * dt1 * dt1 * s)
    Qd = Qd.at[:, 9:12, 9:12].set(I3 * noise.gyr_w**2 * dt1 * dt1 * s)
    Qd = Qd.at[:, 12:15, 12:15].set(I3 * noise.acc_w**2 * dt1 * dt1 * s)
    A, C = compose_ltv(F, Qd)
    P_new = A[-1] @ st.P @ A[-1].T + C[-1]
    return NavsatState(qs[-1], p_new, v_new, st.bg, st.ba,
                       0.5 * (P_new + P_new.T))


@jax.jit
def navsat_update(st: NavsatState, fix: jnp.ndarray,
                  cov_diag: jnp.ndarray) -> NavsatState:
    """GPS position update (Joseph form). fix (3,) local-frame position,
    cov_diag (3,) the NavSatFix position_covariance diagonal."""
    H = jnp.zeros((3, 15)).at[:, 6:9].set(jnp.eye(3))
    Rm = jnp.diag(jnp.maximum(cov_diag, 1e-4))
    S = H @ st.P @ H.T + Rm
    K = st.P @ H.T @ jnp.linalg.inv(S)
    dx = K @ (fix - st.p)
    IKH = jnp.eye(15) - K @ H
    P_new = IKH @ st.P @ IKH.T + K @ Rm @ K.T
    return NavsatState(
        q=so3.quat_normalize(so3.quat_mul(st.q, so3.quat_exp(dx[0:3]))),
        v=st.v + dx[3:6],
        p=st.p + dx[6:9],
        bg=st.bg + dx[9:12],
        ba=st.ba + dx[12:15],
        P=0.5 * (P_new + P_new.T),
    )


class NavsatFilter:
    """Host driver: feed (IMU window, optional GPS fix) per sweep; read back
    the smoothed odometry (position + covariance diagonal) to hand to the
    engines' GPS factors — the `odometry/gpsz` stream of the reference's
    launch graph."""

    def __init__(self, p0=None, v0=None, q0=None,
                 noise: NavsatNoise = NavsatNoise()):
        self.state = init_navsat(p0=p0, v0=v0, q0=q0)
        self.noise = noise

    def step(self, gyro, acc, dts, mask,
             fix: Optional[jnp.ndarray] = None,
             fix_cov: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (smoothed position (3,), position cov diag (3,))."""
        self.state = navsat_predict(self.state, jnp.asarray(gyro),
                                    jnp.asarray(acc), jnp.asarray(dts),
                                    jnp.asarray(mask), self.noise)
        if fix is not None:
            cov = (jnp.asarray(fix_cov) if fix_cov is not None
                   else jnp.full(3, 4.0))
            self.state = navsat_update(self.state, jnp.asarray(fix, jnp.float32),
                                       cov.astype(jnp.float32))
        return self.state.p, jnp.diagonal(self.state.P)[6:9]
