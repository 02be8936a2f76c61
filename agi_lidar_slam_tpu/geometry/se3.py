"""SE(3) pose pytree and operations.

Replaces the reference's mixed pose representations (Eigen::Quaterniond +
Vector3d in A-LOAM, float[6] Euler transforms in LeGO-LOAM/LIO-SAM
`transformTobeMapped`, Sophus::SE3d in LIO-Livox) with a single batched
quaternion+translation pytree used end-to-end.

Perturbation convention for all Gauss-Newton estimators in this package:
    R <- R @ Exp(dtheta)   (right / body-frame rotation perturbation)
    t <- t + dt            (additive world-frame translation)
so for a world point w = R p + t of a sensor point p:
    dw/dtheta = -R [p]x ,   dw/dt = I.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3


class Pose(NamedTuple):
    """Batched SE(3): quaternion (...,4) wxyz + translation (...,3)."""

    q: jnp.ndarray
    t: jnp.ndarray

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "Pose":
        return Pose(so3.quat_identity(shape, dtype), jnp.zeros(tuple(shape) + (3,), dtype))

    def matrix(self) -> jnp.ndarray:
        """(...,4,4) homogeneous matrix."""
        R = so3.quat_to_matrix(self.q)
        top = jnp.concatenate([R, self.t[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)


def compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b (apply b first, then a)."""
    return Pose(
        so3.quat_normalize(so3.quat_mul(a.q, b.q)),
        so3.quat_rotate(a.q, b.t) + a.t,
    )


def inverse(p: Pose) -> Pose:
    qc = so3.quat_conj(p.q)
    return Pose(qc, -so3.quat_rotate(qc, p.t))


def apply(p: Pose, pts: jnp.ndarray) -> jnp.ndarray:
    """Transform points (...,N,3) by pose (...). Uses matrix form (MXU-friendly)."""
    R = so3.quat_to_matrix(p.q)
    return pts @ jnp.swapaxes(R, -1, -2) + p.t[..., None, :]


def boxplus(p: Pose, delta: jnp.ndarray) -> Pose:
    """Apply 6-dof GN update delta = (dtheta(3), dt(3)) under the convention above."""
    dq = so3.quat_exp(delta[..., :3])
    return Pose(so3.quat_normalize(so3.quat_mul(p.q, dq)), p.t + delta[..., 3:])


def boxminus(a: Pose, b: Pose) -> jnp.ndarray:
    """delta such that boxplus(b, delta) == a (rotation part exact, translation additive)."""
    dq = so3.quat_mul(so3.quat_conj(b.q), a.q)
    return jnp.concatenate([so3.quat_log(dq), a.t - b.t], axis=-1)


def interpolate(a: Pose, b: Pose, s) -> Pose:
    """Pose interpolation (slerp + lerp): s=0 -> a, s=1 -> b. Used for deskew."""
    s = jnp.asarray(s)
    return Pose(so3.slerp(a.q, b.q, s), (1.0 - s)[..., None] * a.t + s[..., None] * b.t)


def apply_interpolated(rel: Pose, tau: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """p' = interp(I, rel, tau) . p — the constant-velocity deskew transform
    (A-LOAM TransformToStart, laserOdometry.cpp:124-145).

    Rotation interpolation is nlerp (normalized lerp) rather than slerp: for
    per-sweep rotations (<0.2 rad at any sane spin rate) the angular error is
    <1e-4 rad while avoiding per-point transcendentals."""
    tau = tau[..., None]
    ident = so3.quat_identity()
    q_rel = jnp.where(rel.q[0] < 0, -rel.q, rel.q)  # same hemisphere as identity
    q_i = so3.quat_normalize((1.0 - tau) * ident + tau * q_rel)
    return so3.quat_rotate(q_i, pts) + tau * rel.t
