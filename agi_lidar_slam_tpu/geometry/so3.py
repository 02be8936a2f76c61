"""SO(3) primitives: rotation vectors, quaternions, matrices.

TPU-native replacement for the reference's Sophus/Eigen-quaternion/tf usage
(e.g. /root/reference/src/LIO-Livox/include/sophus/so3.hpp, and the
Eigen::Quaterniond state in A-LOAM laserOdometry.cpp / laserMapping.cpp).

All functions are batched over arbitrary leading dimensions and written with
small-angle-safe Taylor branches so they are differentiable and stable in f32.
Quaternion convention: (w, x, y, z), normalized, Hamilton product.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]x such that hat(w) @ v == cross(w, v). (...,3)->(...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat. (...,3,3)->(...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


# ---------------------------------------------------------------------------
# Rotation vector <-> matrix (Rodrigues)
# ---------------------------------------------------------------------------


def exp_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential: rotation vector (...,3) -> rotation matrix (...,3,3)."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * (W @ W)


def log_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) logarithm: rotation matrix (...,3,3) -> rotation vector (...,3).

    Safe for angles near 0; near pi it falls back to the diagonal-based
    extraction (accurate to ~1e-3 in f32, adequate for pose deltas in SLAM).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)
    axis_unnorm = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(t) * axis
    small = theta[..., None] < 1e-4
    # the generic branch divides by sin(theta); its f32 conditioning degrades
    # ~1/sin^2 near pi, so switch to diagonal extraction well before that
    near_pi = (jnp.pi - theta[..., None]) < 0.03
    # generic branch
    scale = jnp.where(
        small,
        0.5 + theta[..., None] ** 2 / 12.0,
        theta[..., None] / jnp.maximum(2.0 * sin_t[..., None], _EPS),
    )
    w_generic = scale * axis_unnorm
    # near-pi branch: axis from diagonal of R = 2 aa^T - I + cos-term
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag - cos_t[..., None]) / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0)
    axis_pi = jnp.sqrt(axis2)
    # fix signs using off-diagonal sums (a_i a_j sign)
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] >= 0, 1.0, -1.0)
    sy = jnp.where(R[..., 0, 2] - R[..., 2, 0] >= 0, 1.0, -1.0)
    sz = jnp.where(R[..., 1, 0] - R[..., 0, 1] >= 0, 1.0, -1.0)
    axis_pi = axis_pi * jnp.stack([sx, sy, sz], axis=-1)
    w_pi = theta[..., None] * axis_pi
    return jnp.where(near_pi, w_pi, w_generic)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, batched."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (...,3) -> unit quaternion (...,4)."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < 1e-8
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    qw = jnp.where(small[..., 0], 1.0 - theta2[..., 0] / 8.0, jnp.cos(half[..., 0]))
    return quat_normalize(jnp.concatenate([qw[..., None], k * w], axis=-1))


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector (...,3)."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # shortest arc
    vnorm = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    small = vnorm < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / jnp.maximum(vnorm, _EPS))
    return scale * q[..., 1:]


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(...,4) -> (...,3,3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> (...,4), branch-free Shepperd-style (stable in f32)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically largest pivot
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    c0 = jnp.stack([qw, (m21 - m12) / (4 * jnp.maximum(qw, _EPS)),
                    (m02 - m20) / (4 * jnp.maximum(qw, _EPS)),
                    (m10 - m01) / (4 * jnp.maximum(qw, _EPS))], axis=-1)
    c1 = jnp.stack([(m21 - m12) / (4 * jnp.maximum(qx, _EPS)), qx,
                    (m01 + m10) / (4 * jnp.maximum(qx, _EPS)),
                    (m02 + m20) / (4 * jnp.maximum(qx, _EPS))], axis=-1)
    c2 = jnp.stack([(m02 - m20) / (4 * jnp.maximum(qy, _EPS)),
                    (m01 + m10) / (4 * jnp.maximum(qy, _EPS)), qy,
                    (m12 + m21) / (4 * jnp.maximum(qy, _EPS))], axis=-1)
    c3 = jnp.stack([(m10 - m01) / (4 * jnp.maximum(qz, _EPS)),
                    (m02 + m20) / (4 * jnp.maximum(qz, _EPS)),
                    (m12 + m21) / (4 * jnp.maximum(qz, _EPS)), qz], axis=-1)
    mags = jnp.stack([qw, qx, qy, qz], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (...,4cand,4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (...,3) by quaternion q (...,4)."""
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[..., 0:1] * t + jnp.cross(qv, t)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions; t broadcastable (...,).

    Used for constant-velocity deskew (reference: A-LOAM TransformToStart,
    laserOdometry.cpp:124-145 uses Eigen slerp) and pose interpolation.
    """
    t = jnp.asarray(t)[..., None]
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    lin = dot > 0.9995
    w0 = jnp.where(lin, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_t, _EPS))
    w1 = jnp.where(lin, t, jnp.sin(t * theta) / jnp.maximum(sin_t, _EPS))
    return quat_normalize(w0 * q0 + w1 * q1)
