"""Synthetic LiDAR simulator: axis-aligned box worlds + exact raycasting.

The reference validates only by replaying recorded bags (SURVEY.md section 4 —
it has no tests at all). We go further: a differentiable-friendly, ground-truth
simulator that raycasts a spinning multi-beam lidar through a box world, so
feature extraction, KNN, and the full odometry loop can be tested against
exact ground truth — on CPU in CI and on TPU for benchmarks.

Supports per-column sensor poses, i.e. true motion distortion, to exercise the
deskew path (reference analog: the rotating sensor during a sweep that
A-LOAM's TransformToStart and LIO-SAM's deskewPoint compensate).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, so3
from ..pointcloud.cloud import ScanGrid


class BoxWorld(NamedTuple):
    lo: jnp.ndarray  # (M,3) box minima
    hi: jnp.ndarray  # (M,3) box maxima


def default_world(seed: int = 0, n_pillars: int = 24, extent: float = 18.0) -> BoxWorld:
    """A walled arena with a ground slab and random pillars — enough edge and
    plane structure for LOAM-style features."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    e = extent
    boxes_lo = [
        [-e, -e, -1.2],  # ground slab (top at z=-1.0 -> sensor 1 m above ground)
        [-e, -e, -1.0], [e - 0.4, -e, -1.0],  # x walls
        [-e, -e, -1.0], [-e, e - 0.4, -1.0],  # y walls
    ]
    boxes_hi = [
        [e, e, -1.0],
        [-e + 0.4, e, 4.0], [e, e, 4.0],
        [e, -e + 0.4, 4.0], [e, e, 4.0],
    ]
    centers = jax.random.uniform(k1, (n_pillars, 2), minval=-0.8 * e, maxval=0.8 * e)
    sizes = jax.random.uniform(k2, (n_pillars, 2), minval=0.3, maxval=1.4)
    # keep a clear corridor along the +x axis so trajectories starting at the
    # origin and driving forward never enter a pillar
    centers = centers.at[:, 1].set(
        jnp.where(jnp.abs(centers[:, 1]) < 3.5,
                  centers[:, 1] + jnp.sign(centers[:, 1] + 0.1) * 3.5,
                  centers[:, 1])
    )
    p_lo = jnp.concatenate([centers - sizes, jnp.full((n_pillars, 1), -1.0)], axis=-1)
    p_hi = jnp.concatenate([centers + sizes, jnp.full((n_pillars, 1), 2.5)], axis=-1)
    lo = jnp.concatenate([jnp.asarray(boxes_lo, jnp.float32), p_lo], axis=0)
    hi = jnp.concatenate([jnp.asarray(boxes_hi, jnp.float32), p_hi], axis=0)
    return BoxWorld(lo, hi)


def ray_dirs(rings: int, width: int, fov_up_deg: float, fov_down_deg: float) -> jnp.ndarray:
    """Sensor-frame unit ray directions (R, W, 3); azimuth sweeps column-major."""
    elev = jnp.deg2rad(jnp.linspace(fov_down_deg, fov_up_deg, rings))
    azim = jnp.linspace(-jnp.pi, jnp.pi, width, endpoint=False)
    ce, se_ = jnp.cos(elev)[:, None], jnp.sin(elev)[:, None]
    ca, sa = jnp.cos(azim)[None, :], jnp.sin(azim)[None, :]
    return jnp.stack([ce * ca, ce * sa, jnp.broadcast_to(se_, (rings, width))], axis=-1)


def _raycast_boxes(origins: jnp.ndarray, dirs: jnp.ndarray, world: BoxWorld,
                   max_range: float) -> jnp.ndarray:
    """Slab-method AABB raycast. origins/dirs (...,3) -> hit range (...,), inf if miss."""
    o = origins[..., None, :]  # (...,1,3)
    d = dirs[..., None, :]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, jnp.where(d >= 0, 1e-9, -1e-9), d)
    t0 = (world.lo - o) * inv
    t1 = (world.hi - o) * inv
    t_enter = jnp.max(jnp.minimum(t0, t1), axis=-1)  # (...,M)
    t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (t_enter <= t_exit) & (t_exit > 0.0) & (t_enter > 1e-3)
    t = jnp.where(hit, t_enter, jnp.inf)
    t = jnp.min(t, axis=-1)
    return jnp.where(t < max_range, t, jnp.inf)


def simulate_scan(
    world: BoxWorld,
    pose_start: se3.Pose,
    pose_end: se3.Pose,
    rings: int = 16,
    width: int = 900,
    fov_up_deg: float = 15.0,
    fov_down_deg: float = -15.0,
    max_range: float = 80.0,
    noise_std: float = 0.0,
    seed: int = 0,
) -> ScanGrid:
    """One sweep with the sensor moving pose_start -> pose_end during the sweep.

    Each column is measured in the sensor's *instantaneous* frame and naively
    concatenated — exactly the motion-distorted raw cloud a real spinning lidar
    driver emits. A correct deskew maps column tau's points into the start
    frame via interp(I, start^-1 end, tau). With pose_start == pose_end the
    scan is rigid.
    """
    W = width
    tau = jnp.arange(W, dtype=jnp.float32) / W
    col_pose = se3.interpolate(pose_start, pose_end, tau)  # batched over W
    dirs_s = ray_dirs(rings, W, fov_up_deg, fov_down_deg)  # (R,W,3)
    Rw = so3.quat_to_matrix(col_pose.q)  # (W,3,3)
    dirs_w = jnp.einsum("wij,rwj->rwi", Rw, dirs_s)
    origins_w = jnp.broadcast_to(col_pose.t[None, :, :], (rings, W, 3))
    t_hit = _raycast_boxes(origins_w, dirs_w, world, max_range)
    if noise_std > 0.0:
        t_hit = t_hit + noise_std * jax.random.normal(jax.random.PRNGKey(seed), t_hit.shape)
    mask = jnp.isfinite(t_hit)
    rng = jnp.where(mask, t_hit, 0.0)
    pts_inst = dirs_s * rng[..., None]  # instantaneous-frame (motion-distorted) cloud
    time = jnp.broadcast_to(tau[None, :], (rings, W))
    return ScanGrid(pts_inst.astype(jnp.float32), mask, time)
