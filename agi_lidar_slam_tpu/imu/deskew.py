"""IMU-interpolated sweep deskew (LeGO-LOAM `adjustDistortion`,
reference featureAssociation.cpp:617-806).

The reference buffers 9-axis IMU orientation over the sweep and, per point,
interpolates the accumulated rotation (and an accel-integrated shift) to map
each point into the sweep-start frame. The TPU-native re-expression:

* integrate the gyro window once into an orientation *track* q(t) relative to
  the sweep start (`lax.scan` over the IMU samples — the analog of LeGO's
  `imuRotX/Y/Z` accumulation arrays, featureAssociation.cpp:485-558),
* deskew the whole (R, W) grid in one vectorized pass: per-point slerp on the
  track + linearly interpolated translation.

Translation uses the constant-velocity prior rather than double-integrated
accelerometer shift: LeGO itself gates its accel shift out at normal speeds
(`imuShiftFromStart*` is noise-dominated over a 100 ms sweep); rotation is
where IMU interpolation genuinely beats the constant-velocity model (spinning
/ shaking platforms with non-uniform angular rate within a sweep).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import so3
from ..pointcloud.cloud import ScanGrid


def gyro_rotation_track(
    gyro: jnp.ndarray,  # (M, 3) rad/s body rates, time-ordered over the sweep
    dts: jnp.ndarray,  # (M,) seconds between consecutive samples
    mask: jnp.ndarray,  # (M,) valid-sample mask (fixed-capacity window)
) -> jnp.ndarray:
    """Integrate gyro into orientations relative to the sweep start.

    Returns qs (M+1, 4): qs[0] = identity, qs[i] = q_start_to_sample_i.
    Masked samples integrate as zero rotation, so the track is constant past
    the last valid sample (safe to interpolate into).
    """
    dtheta = jnp.where(mask[:, None], gyro * dts[:, None], 0.0)

    def step(q, dth):
        q_next = so3.quat_normalize(so3.quat_mul(q, so3.quat_exp(dth)))
        return q_next, q_next

    q0 = so3.quat_identity()
    _, qs = jax.lax.scan(step, q0, dtheta)
    return jnp.concatenate([q0[None], qs], axis=0)


def deskew_imu_rotation(
    scan: ScanGrid,
    gyro: jnp.ndarray,  # (M, 3)
    dts: jnp.ndarray,  # (M,)
    imu_mask: jnp.ndarray,  # (M,)
    rel_t: jnp.ndarray,  # (3,) predicted sweep translation (constant velocity)
) -> ScanGrid:
    """Map every point into the sweep-START frame using the IMU rotation
    track: p' = q(tau) * p + tau * rel_t.

    `scan.time` is the in-sweep fraction in [0, 1); the IMU window is assumed
    to cover the sweep (sample i sits at cumulative time sum(dts[:i+1])).
    """
    qs = gyro_rotation_track(gyro, dts, imu_mask)  # (M+1, 4)
    cum = jnp.cumsum(jnp.where(imu_mask, dts, 0.0))
    total = jnp.maximum(cum[-1], 1e-9)
    ts = jnp.concatenate([jnp.zeros((1,)), cum]) / total  # (M+1,) in [0,1]

    tau = scan.time.reshape(-1)
    idx = jnp.clip(jnp.searchsorted(ts, tau, side="right"), 1, ts.shape[0] - 1)
    t0 = ts[idx - 1]
    t1 = ts[idx]
    s = jnp.clip((tau - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    q_tau = so3.slerp(qs[idx - 1], qs[idx], s)  # (RW, 4)

    flat = scan.xyz.reshape(-1, 3)
    xyz = so3.quat_rotate(q_tau, flat) + tau[:, None] * rel_t
    return ScanGrid(xyz.reshape(scan.xyz.shape).astype(scan.xyz.dtype),
                    scan.mask, scan.time)


def fuse_imu_rate(pose_q: jnp.ndarray, pose_t: jnp.ndarray,
                  v_world: jnp.ndarray, gyro: jnp.ndarray, dt: jnp.ndarray,
                  mask: jnp.ndarray):
    """TransformFusion for the LiDAR-only engines (LeGO-LOAM
    transformFusion.cpp:35-288): compose the scan-rate fused pose with
    IMU-rate increments — rotation from the integrated gyro track, translation
    from the constant-velocity estimate (the same split the deskew path uses;
    LeGO's own 200 Hz fusion composes odometry increments the same way).

    Args: pose (q wxyz, t) at the sweep start, v_world (3,) scan-rate
    velocity estimate, gyro/dt/mask the (M,) IMU window covering the sweep.
    Returns (qs (M,4), ps (M,3), valid (M,)): one world pose per IMU sample.
    """
    dts = jnp.where(mask, dt, 0.0)

    def step(q, inp):
        w, d = inp
        q2 = so3.quat_normalize(so3.quat_mul(q, so3.quat_exp(w * d)))
        return q2, q2

    _, qs = jax.lax.scan(step, pose_q, (gyro, dts))
    ts = jnp.cumsum(dts)
    ps = pose_t[None, :] + ts[:, None] * v_world[None, :]
    return qs, ps, mask
