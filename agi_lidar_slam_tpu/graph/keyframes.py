"""Keyframe bank: fixed-capacity store of poses + feature clouds.

Replaces the reference's keyframe machinery (LIO-SAM mapOptmization.cpp:81-87
cornerCloudKeyFrames/surfCloudKeyFrames + cloudKeyPoses3D/6D; LeGO-LOAM
equivalents): poses and per-keyframe feature clouds in preallocated arrays,
gated by the same distance/angle thresholds (saveFrame :1811-1832, 1 m /
0.2 rad)."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry import se3, so3
from ..pointcloud.cloud import PointBatch


class KeyframeBank(NamedTuple):
    q: jnp.ndarray  # (K,4) world_R_kf
    t: jnp.ndarray  # (K,3)
    stamp: jnp.ndarray  # (K,) scan index of each keyframe
    corner_xyz: jnp.ndarray  # (K,Nc,3) in keyframe (sensor) frame
    corner_mask: jnp.ndarray  # (K,Nc)
    surf_xyz: jnp.ndarray  # (K,Ns,3)
    surf_mask: jnp.ndarray  # (K,Ns)
    count: jnp.ndarray  # () int32 number of live keyframes

    @property
    def capacity(self) -> int:
        return self.q.shape[0]

    def poses(self) -> se3.Pose:
        return se3.Pose(self.q, self.t)


def empty_bank(capacity: int, n_corner: int, n_surf: int) -> KeyframeBank:
    return KeyframeBank(
        q=jnp.tile(so3.quat_identity()[None], (capacity, 1)),
        t=jnp.zeros((capacity, 3)),
        stamp=jnp.zeros((capacity,), jnp.int32),
        corner_xyz=jnp.zeros((capacity, n_corner, 3)),
        corner_mask=jnp.zeros((capacity, n_corner), bool),
        surf_xyz=jnp.zeros((capacity, n_surf, 3)),
        surf_mask=jnp.zeros((capacity, n_surf), bool),
        count=jnp.int32(0),
    )


def should_add(bank: KeyframeBank, pose: se3.Pose,
               dist_thresh: float = 1.0, angle_thresh: float = 0.2) -> jnp.ndarray:
    """Keyframe gate (LIO-SAM saveFrame :1811-1832). Always True when empty."""
    last = jnp.maximum(bank.count - 1, 0)
    dq = so3.quat_mul(so3.quat_conj(bank.q[last]), pose.q)
    dang = jnp.linalg.norm(so3.quat_log(dq))
    ddist = jnp.linalg.norm(pose.t - bank.t[last])
    return (bank.count == 0) | (ddist > dist_thresh) | (dang > angle_thresh)


def add_keyframe(
    bank: KeyframeBank,
    pose: se3.Pose,
    corners: PointBatch,
    surfs: PointBatch,
    stamp: jnp.ndarray,
    do_add: jnp.ndarray,
) -> Tuple[KeyframeBank, jnp.ndarray]:
    """Append (masked by do_add; no-op when full). Returns (bank, index used)."""
    idx = jnp.minimum(bank.count, bank.capacity - 1)
    write = do_add & (bank.count < bank.capacity)
    w = jnp.where(write, idx, bank.capacity - 1)  # overwrite last slot harmlessly if full

    def upd(arr, val):
        return arr.at[w].set(jnp.where(write, val, arr[w]))

    bank = KeyframeBank(
        q=upd(bank.q, pose.q),
        t=upd(bank.t, pose.t),
        stamp=upd(bank.stamp, stamp),
        corner_xyz=upd(bank.corner_xyz, corners.xyz),
        corner_mask=upd(bank.corner_mask, corners.mask),
        surf_xyz=upd(bank.surf_xyz, surfs.xyz),
        surf_mask=upd(bank.surf_mask, surfs.mask),
        count=bank.count + write.astype(jnp.int32),
    )
    return bank, idx
