"""Mount-angle self-calibration (LIO-Livox segment/pointsCorrect.cpp).

The reference corrects a mis-pitched/rolled sensor mount before segmentation:
  * FilterGndForPos_cor (:52-117): bin points into 2x2 m cells over a
    40x20 m box; a cell is "flat ground" when it has >3 points, its max-mean
    height spread < 0.4 m, and its mean height < 2 m;
  * CalGndPos_cor (:121-203): PCA normal of the retained ground points;
  * GetGndPos (:274-307): an exponentially-averaged normal with a
    consistency gate (|dn| < 0.1 folds the new estimate in at weight 0.5,
    otherwise a miss counter runs until a hard reset);
  * CorrectPoints_cor (:249-272): rotate the cloud by the rotation taking
    the ground normal to +z and subtract the ground height.

TPU-native formulation: the cell statistics are one small segment reduction
(fixed 2D grid, scatter-add into ~200 cells), the normal is the smallest
eigenvector of the centered covariance (fit.geometry_fit.eigvals/eigvec3x3 —
no iterative PCA), and the EMA gate is a pure functional state update. One
jitted call per frame; everything fixed-shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fit.geometry_fit import eigvals3x3, eigvec3x3

# grid geometry (pointsCorrect.cpp:53-60)
_DX = 2.0
_X_LEN, _Y_LEN = 20.0, 10.0
_NX = int(2 * _X_LEN / _DX)  # 20
_NY = int(2 * _Y_LEN / _DX)  # 10
_FLAT_THR = 0.4  # max-mean height spread (THR)
_MIN_CELL_PTS = 4  # "imgNumZ > 3"
_MAX_MEAN_Z = 2.0


class GroundEstimate(NamedTuple):
    normal: jnp.ndarray  # (3,) unit, oriented toward +z
    height: jnp.ndarray  # () mean ground height along the normal
    n_points: jnp.ndarray  # () int32 retained ground points
    ok: jnp.ndarray  # () bool: enough support for a trustworthy normal


class MountState(NamedTuple):
    """EMA'd ground estimate across frames (GetGndPos :274-307)."""

    normal: jnp.ndarray  # (3,)
    height: jnp.ndarray  # ()
    initialized: jnp.ndarray  # () bool
    misses: jnp.ndarray  # () int32 consecutive rejected frames


def init_mount_state() -> MountState:
    return MountState(jnp.array([0.0, 0.0, 1.0]), jnp.float32(0.0),
                      jnp.bool_(False), jnp.int32(0))


def estimate_ground(xyz: jnp.ndarray, mask: jnp.ndarray) -> GroundEstimate:
    """One-frame ground-plane estimate from flat grid cells. xyz (N,3)."""
    inb = (mask & (jnp.abs(xyz[:, 0]) < _X_LEN) & (jnp.abs(xyz[:, 1]) < _Y_LEN))
    ix = jnp.clip(((xyz[:, 0] + _X_LEN) / _DX).astype(jnp.int32), 0, _NX - 1)
    iy = jnp.clip(((xyz[:, 1] + _Y_LEN) / _DX).astype(jnp.int32), 0, _NY - 1)
    cell = jnp.where(inb, ix + iy * _NX, _NX * _NY)  # overflow bin for invalid

    C = _NX * _NY
    z = xyz[:, 2]
    n_c = jax.ops.segment_sum(inb.astype(jnp.float32), cell, num_segments=C + 1)[:C]
    zsum = jax.ops.segment_sum(jnp.where(inb, z, 0.0), cell, num_segments=C + 1)[:C]
    zmax = jax.ops.segment_max(jnp.where(inb, z, -jnp.inf), cell,
                               num_segments=C + 1)[:C]
    zmean = zsum / jnp.maximum(n_c, 1.0)
    flat = ((n_c >= _MIN_CELL_PTS) & ((zmax - zmean) < _FLAT_THR)
            & (zmean < _MAX_MEAN_Z))

    keep = inb & flat[jnp.minimum(cell, C - 1)]
    w = keep.astype(jnp.float32)[:, None]
    n_pts = jnp.sum(keep)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    centroid = jnp.sum(xyz * w, axis=0) / denom
    d = (xyz - centroid) * w
    cov = d.T @ d / denom
    vals = eigvals3x3(cov)
    normal = eigvec3x3(cov, vals[2])
    normal = jnp.where(normal[2] < 0, -normal, normal)  # toward +z
    height = jnp.dot(normal, centroid)
    # support gates: enough points, the plane is plane-like (smallest
    # eigenvalue well separated), and the tilt is physically plausible (<30deg)
    ok = (n_pts > 50) & (vals[1] > 10.0 * jnp.maximum(vals[2], 1e-9)) \
        & (normal[2] > 0.866)
    return GroundEstimate(normal, height, n_pts.astype(jnp.int32), ok)


@jax.jit
def update_mount(state: MountState, xyz: jnp.ndarray,
                 mask: jnp.ndarray) -> tuple[MountState, GroundEstimate]:
    """Per-frame EMA update with the reference's consistency gate."""
    est = estimate_ground(xyz, mask)
    close = (jnp.abs(state.normal[0] - est.normal[0]) < 0.1) & \
            (jnp.abs(state.normal[1] - est.normal[1]) < 0.1)
    accept_first = est.ok & ~state.initialized
    accept_ema = est.ok & state.initialized & close
    hard_reset = est.ok & (state.misses >= 10)  # frame_lenth_threshold analog

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-9)

    new_n = jnp.where(accept_first | hard_reset, est.normal,
                      jnp.where(accept_ema,
                                norm(0.5 * (state.normal + est.normal)),
                                state.normal))
    new_h = jnp.where(accept_first | hard_reset, est.height,
                      jnp.where(accept_ema, 0.5 * (state.height + est.height),
                                state.height))
    new_init = state.initialized | accept_first
    new_miss = jnp.where(accept_first | accept_ema | hard_reset, 0,
                         state.misses + 1).astype(jnp.int32)
    return MountState(new_n, new_h, new_init, new_miss), est


def mount_rotation(normal: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix taking `normal` to +z (GetRTMatrix_cor :206-247),
    built from the axis-angle closed form (Rodrigues)."""
    zaxis = jnp.array([0.0, 0.0, 1.0])
    v = jnp.cross(normal, zaxis)
    s = jnp.linalg.norm(v)
    c = jnp.dot(normal, zaxis)
    K = jnp.array([[0.0, -v[2], v[1]],
                   [v[2], 0.0, -v[0]],
                   [-v[1], v[0], 0.0]])
    # R = I + K + K^2 (1-c)/s^2; series-safe when s -> 0 (already aligned)
    k2 = jnp.where(s > 1e-6, (1.0 - c) / jnp.maximum(s * s, 1e-12), 0.5)
    return jnp.eye(3) + K + k2 * (K @ K)


def correct_points(xyz: jnp.ndarray, state: MountState) -> jnp.ndarray:
    """Apply the mount correction: rotate ground normal to +z and zero the
    ground height (CorrectPoints_cor :249-272). Identity until initialized."""
    R = mount_rotation(state.normal)
    h = state.height
    out = xyz @ R.T - jnp.array([0.0, 0.0, 1.0]) * h
    return jnp.where(state.initialized, out, xyz)
