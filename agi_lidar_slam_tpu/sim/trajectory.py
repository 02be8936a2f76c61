"""Analytic trajectories with exact IMU signals for LIO testing.

The reference has no way to generate ground-truth IMU data (it replays
recorded bags). A constant-rate circular trajectory has closed-form
position, velocity, acceleration, and body rates, so the simulated IMU is
exact to machine precision — ideal for validating preintegration and ESKF
propagation independently of sensor noise models.

Convention: gravity g_world = (0,0,-G); the IMU measures specific force
f_body = R^T (a_world - g_world) and body rates w_body.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import se3, so3

G = 9.81


def circle_pose(t, radius: float, omega: float) -> se3.Pose:
    """Pose on a CCW circle in the XY plane, body x tangent to the path.
    t may be scalar or (...,)."""
    t = jnp.asarray(t, dtype=jnp.float32)
    th = omega * t
    p = jnp.stack([radius * jnp.sin(th), radius * (1.0 - jnp.cos(th)),
                   jnp.zeros_like(th)], axis=-1)
    yaw = th
    q = so3.quat_exp(jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw], axis=-1))
    return se3.Pose(q, p)


def circle_velocity(t, radius: float, omega: float) -> jnp.ndarray:
    t = jnp.asarray(t, dtype=jnp.float32)
    th = omega * t
    v = radius * omega
    return jnp.stack([v * jnp.cos(th), v * jnp.sin(th), jnp.zeros_like(th)], axis=-1)


def circle_imu(t, radius: float, omega: float):
    """Exact IMU at time t: (gyro_body (...,3), acc_body specific force (...,3))."""
    t = jnp.asarray(t, dtype=jnp.float32)
    th = omega * t
    v = radius * omega
    a_world = jnp.stack(
        [-v * omega * jnp.sin(th), v * omega * jnp.cos(th), jnp.zeros_like(th)], axis=-1
    )
    # R^T (a_world - g): rotate by -yaw; the tangent/normal decomposition gives
    # body acc (0, v*omega, G)
    zeros = jnp.zeros_like(th)
    acc_body = jnp.stack([zeros, jnp.full_like(th, v * omega), jnp.full_like(th, G)], axis=-1)
    del a_world
    gyro_body = jnp.stack([zeros, zeros, jnp.full_like(th, omega)], axis=-1)
    return gyro_body, acc_body
