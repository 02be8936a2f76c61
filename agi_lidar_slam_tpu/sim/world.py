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
    # optional per-box velocity (M,3) m/s: moving objects (cars/pedestrians).
    # Boxes translate with world time — WITHIN a sweep (per-column box
    # positions, so movers smear exactly like a real rolling-shutter lidar
    # sees them) and ACROSS frames (pass t0 to simulate_scan).
    vel: jnp.ndarray | None = None


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


def city_world(seed: int = 0, blocks: int = 3, building: float = 16.0,
               street: float = 10.0, max_height: float = 14.0) -> BoxWorld:
    """Manhattan grid of buildings — the urban-canyon stress case real KITTI
    drives exercise (tall walls both sides, ground, repeated structure).
    `blocks` x `blocks` buildings, separated by `street`-wide streets; the
    sensor drives the street grid. Building faces provide planes, corners
    provide edges; heights vary so the skyline is not degenerate."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    pitch = building + street
    span = blocks * pitch + street
    half = span / 2.0
    # ground slab under everything (top at z=-1.0: sensor 1 m up)
    lo = [[-half - 5.0, -half - 5.0, -1.2]]
    hi = [[half + 5.0, half + 5.0, -1.0]]
    hts = 4.0 + (max_height - 4.0) * jax.random.uniform(k1, (blocks, blocks))
    # shrink each building footprint a touch so corners are distinct
    shr = jax.random.uniform(k2, (blocks, blocks, 2), minval=0.0, maxval=2.0)
    for i in range(blocks):
        for j in range(blocks):
            x0 = -half + street + i * pitch
            y0 = -half + street + j * pitch
            sx, sy = float(shr[i, j, 0]), float(shr[i, j, 1])
            lo.append([x0 + sx, y0 + sy, -1.0])
            hi.append([x0 + building - sx, y0 + building - sy, float(hts[i, j])])
    return BoxWorld(jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32))


def corridor_world(length: float = 120.0, width: float = 6.0,
                   height: float = 4.0, n_alcoves: int = 0,
                   seed: int = 0) -> BoxWorld:
    """Degenerate corridor/tunnel along +x (the LIO-Livox '4 km tunnel'
    robustness case, LIO-Livox/README.md:5-7): two side walls + ground +
    ceiling give NO constraint along x — scan-to-map J^T J is rank-deficient
    in that direction and the solver must detect/clamp it (degen_eig_thresh)
    rather than hallucinate. n_alcoves > 0 adds door-frame niches that
    restore weak x-observability (a real tunnel's emergency bays)."""
    w2 = width / 2.0
    lo = [
        [-5.0, -w2 - 0.4, -1.2],               # ground
        [-5.0, -w2 - 0.4, -1.0],               # left wall
        [-5.0, w2, -1.0],                      # right wall
        [-5.0, -w2 - 0.4, height],             # ceiling
        [-5.0, -w2 - 0.4, -1.0],               # back wall (behind start)
    ]
    hi = [
        [length, w2 + 0.4, -1.0],
        [length, -w2, height + 0.4],
        [length, w2 + 0.4, height + 0.4],
        [length, w2 + 0.4, height + 0.4],
        [-4.6, w2 + 0.4, height + 0.4],
    ]
    if n_alcoves:
        key = jax.random.PRNGKey(seed)
        xs = jax.random.uniform(key, (n_alcoves,), minval=5.0,
                                maxval=length - 5.0)
        for k in range(n_alcoves):
            x = float(xs[k])
            # a 1 m-deep, 1.5 m-wide pillar jutting INTO the corridor from
            # alternating walls: breaks the wall plane with two x-facing faces
            if k % 2 == 0:
                lo.append([x, w2 - 1.0, -1.0])
                hi.append([x + 1.5, w2, height * 0.6])
            else:
                lo.append([x, -w2, -1.0])
                hi.append([x + 1.5, -w2 + 1.0, height * 0.6])
    return BoxWorld(jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32))


def with_movers(world: BoxWorld, seed: int = 0, n: int = 4,
                speed: float = 3.0, lane_y: float = 0.0,
                x_range: tuple = (5.0, 15.0)) -> BoxWorld:
    """Add car-sized moving boxes oncoming along -x in a lane near y=lane_y
    (the LIO-Livox dynamic-vehicle case PCSeg removes, segment.hpp:118-125).
    Static world boxes get zero velocity. Spawn x in x_range — keep it inside
    the world's walls or the movers are occluded."""
    key = jax.random.PRNGKey(seed + 17)
    k1, k2 = jax.random.split(key)
    xs = jax.random.uniform(k1, (n,), minval=x_range[0], maxval=x_range[1])
    ys = lane_y + jax.random.uniform(k2, (n,), minval=-1.0, maxval=1.0)
    car = jnp.asarray([4.2, 1.8, 1.5])  # L x W x H
    lo_m = jnp.stack([xs, ys - car[1] / 2, jnp.full_like(xs, -1.0)], axis=-1)
    hi_m = lo_m + car
    vel_m = jnp.tile(jnp.asarray([[-speed, 0.0, 0.0]]), (n, 1))
    lo = jnp.concatenate([world.lo, lo_m], axis=0)
    hi = jnp.concatenate([world.hi, hi_m], axis=0)
    vel = jnp.concatenate([
        jnp.zeros_like(world.lo) if world.vel is None else world.vel, vel_m
    ], axis=0)
    return BoxWorld(lo, hi, vel)


def ray_dirs(rings: int, width: int, fov_up_deg: float, fov_down_deg: float) -> jnp.ndarray:
    """Sensor-frame unit ray directions (R, W, 3); azimuth sweeps column-major."""
    elev = jnp.deg2rad(jnp.linspace(fov_down_deg, fov_up_deg, rings))
    azim = jnp.linspace(-jnp.pi, jnp.pi, width, endpoint=False)
    ce, se_ = jnp.cos(elev)[:, None], jnp.sin(elev)[:, None]
    ca, sa = jnp.cos(azim)[None, :], jnp.sin(azim)[None, :]
    return jnp.stack([ce * ca, ce * sa, jnp.broadcast_to(se_, (rings, width))], axis=-1)


def _raycast_boxes(origins: jnp.ndarray, dirs: jnp.ndarray, world: BoxWorld,
                   max_range: float,
                   box_shift: jnp.ndarray | None = None) -> jnp.ndarray:
    """Slab-method AABB raycast. origins/dirs (...,3) -> hit range (...,), inf
    if miss. box_shift (broadcastable to (...,M,3)) translates each box —
    the moving-object path."""
    o = origins[..., None, :]  # (...,1,3)
    d = dirs[..., None, :]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, jnp.where(d >= 0, 1e-9, -1e-9), d)
    lo, hi = world.lo, world.hi
    if box_shift is not None:
        lo = lo + box_shift
        hi = hi + box_shift
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
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
    t0: float = 0.0,
    scan_period: float = 0.1,
) -> ScanGrid:
    """One sweep with the sensor moving pose_start -> pose_end during the sweep.

    Each column is measured in the sensor's *instantaneous* frame and naively
    concatenated — exactly the motion-distorted raw cloud a real spinning lidar
    driver emits. A correct deskew maps column tau's points into the start
    frame via interp(I, start^-1 end, tau). With pose_start == pose_end the
    scan is rigid.

    Worlds with movers (world.vel set): boxes sit at lo + vel * (t0 +
    tau * scan_period) when column tau fires — movers smear within the sweep
    and advance across frames via t0 (world time at sweep start, seconds).
    """
    W = width
    tau = jnp.arange(W, dtype=jnp.float32) / W
    col_pose = se3.interpolate(pose_start, pose_end, tau)  # batched over W
    dirs_s = ray_dirs(rings, W, fov_up_deg, fov_down_deg)  # (R,W,3)
    Rw = so3.quat_to_matrix(col_pose.q)  # (W,3,3)
    dirs_w = jnp.einsum("wij,rwj->rwi", Rw, dirs_s)
    origins_w = jnp.broadcast_to(col_pose.t[None, :, :], (rings, W, 3))
    shift = None
    if world.vel is not None:
        t_abs = t0 + tau * scan_period  # (W,)
        # (W,M,3), broadcast against origins (R,W,1,3) -> (R,W,M,3)
        shift = t_abs[:, None, None] * world.vel[None, :, :]
    t_hit = _raycast_boxes(origins_w, dirs_w, world, max_range, box_shift=shift)
    if noise_std > 0.0:
        t_hit = t_hit + noise_std * jax.random.normal(jax.random.PRNGKey(seed), t_hit.shape)
    mask = jnp.isfinite(t_hit)
    rng = jnp.where(mask, t_hit, 0.0)
    pts_inst = dirs_s * rng[..., None]  # instantaneous-frame (motion-distorted) cloud
    time = jnp.broadcast_to(tau[None, :], (rings, W))
    return ScanGrid(pts_inst.astype(jnp.float32), mask, time)
