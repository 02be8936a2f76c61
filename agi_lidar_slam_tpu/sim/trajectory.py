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


def square_loop_pose(s, side: float, corner: float = 4.0) -> se3.Pose:
    """Pose at arc-length s along a CCW rounded square in the XY plane,
    centered at the origin, body x tangent to the path. `side` is the
    straight-segment length; `corner` the quarter-circle corner radius.
    The city-block driving pattern (KITTI urban loops): four straights with
    90-degree turns, closing on itself — exercises loop closure and turning
    at intersections."""
    s = jnp.asarray(s, dtype=jnp.float32)
    arc = 0.5 * jnp.pi * corner
    leg = side + arc  # one straight + one corner
    perim = 4.0 * leg
    s = jnp.mod(s, perim)
    k = jnp.floor(s / leg)  # which leg (0..3)
    u = s - k * leg  # arc length into the leg
    h = side / 2.0
    # leg-local: straight from (-h, -h-corner) towards +x, then corner turning left
    on_straight = u < side
    xs = jnp.where(on_straight, u - h, h)
    ys = jnp.full_like(s, -h - corner)
    ang = jnp.where(on_straight, 0.0, (u - side) / corner)  # turned angle
    cx, cy = h, -h  # corner circle center in leg frame
    xc = cx + corner * jnp.sin(ang)
    yc = cy - corner * jnp.cos(ang)
    x = jnp.where(on_straight, xs, xc)
    y = jnp.where(on_straight, ys, yc)
    yaw_local = jnp.where(on_straight, 0.0, ang)
    # rotate leg frame by k * 90 deg
    rot = k * 0.5 * jnp.pi
    cr, sr = jnp.cos(rot), jnp.sin(rot)
    p = jnp.stack([cr * x - sr * y, sr * x + cr * y, jnp.zeros_like(s)], axis=-1)
    yaw = yaw_local + rot
    q = so3.quat_exp(jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw],
                               axis=-1))
    return se3.Pose(q, p)


def square_loop_imu(t, side: float, corner: float = 4.0, speed: float = 3.5):
    """Exact IMU for square_loop_pose driven at constant speed: zero body
    rates on the straights, yaw rate v/r and centripetal v^2/r on the
    rounded corners. Piecewise-constant (discontinuous at segment joins,
    like a real vehicle's steering input). t scalar or (...,) seconds;
    arc length s = speed * t."""
    t = jnp.asarray(t, dtype=jnp.float32)
    s = jnp.mod(speed * t, 4.0 * (side + 0.5 * jnp.pi * corner))
    leg = side + 0.5 * jnp.pi * corner
    u = s - jnp.floor(s / leg) * leg
    on_corner = u >= side
    w = jnp.where(on_corner, speed / corner, 0.0)
    a_lat = jnp.where(on_corner, speed**2 / corner, 0.0)
    zeros = jnp.zeros_like(t)
    gyro = jnp.stack([zeros, zeros, w], axis=-1)
    acc = jnp.stack([zeros, a_lat, jnp.full_like(t, G)], axis=-1)
    return gyro, acc


def straight_imu(t, speed: float = 3.5):
    """Exact IMU for a constant-velocity straight drive (corridor world)."""
    t = jnp.asarray(t, dtype=jnp.float32)
    zeros = jnp.zeros_like(t)
    gyro = jnp.stack([zeros, zeros, zeros], axis=-1)
    acc = jnp.stack([zeros, zeros, jnp.full_like(t, G)], axis=-1)
    return gyro, acc
