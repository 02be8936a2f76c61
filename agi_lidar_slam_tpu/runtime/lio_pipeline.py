"""Tightly-coupled LIO engine: IESKF + direct point-to-plane (FAST-LIO2 family).

Re-designs S-FAST_LIO's single-process loop (laserMapping.cpp:590-838, SURVEY
section 3.3) as one jitted function per (scan, IMU window) pair:

  forward-propagate the 24-dim ESKF through the IMU window (lax.scan,
  recording per-sample poses)  ->  backward undistortion of all points to the
  scan-end frame (vectorized interpolation instead of the reference's
  per-point backward loop, IMU_Processing.hpp:360-401)  ->  voxel downsample
  ->  iterated IESKF update against the hashed voxel map  ->  map insert.

No feature extraction: FAST-LIO is direct — every downsampled point is a
point-to-plane constraint.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from ..estimators.ieskf import IeskfConfig, update_iterated
from ..geometry import so3
from ..imu.eskf import EskfNoise, NavState, predict
from ..map.hash_map import HashVoxelMap, bound_map, empty_map, insert_with_stats
from ..pointcloud.voxel import voxel_downsample


class LioConfig(NamedTuple):
    """Static config (hashable, closed over by jit)."""

    # 2.0 m blocks, octant8, 16k slots: the table fits VMEM so the Pallas
    # association kernel runs the IESKF's 5-NN (the dominant stage — 43 of
    # 80 ms/scan went to update_iterated on the 128k-slot XLA path). 16k
    # slots hold a ~80 m-range rolling surface map at ~30% load; overflow
    # inserts are counted in LioResult.n_dropped. The avia parity preset
    # (presets.lio_config_avia_ref) keeps a big full27 table instead: its
    # 450 m det_range needs the capacity more than the kernel.
    map: MapConfig = MapConfig(sub_voxel=0.5, block_sub=4, log2_slots=14)
    ieskf: IeskfConfig = IeskfConfig()
    noise: EskfNoise = EskfNoise()
    scan_voxel: float = 0.5  # filter_size_surf (laserMapping.cpp:621)
    max_scan_pts: int = 8192  # downsampled measurement budget
    # rolling local-map bound (lasermap_fov_segment + Delete_Point_Boxes,
    # S-FAST_LIO laserMapping.cpp:309-365). 0 disables.
    bound_radius: float = 150.0


class ImuWindow(NamedTuple):
    """Padded IMU samples covering one sweep. gyro/acc (M,3); dt (M,) interval
    AFTER each sample; mask (M,)."""

    gyro: jnp.ndarray
    acc: jnp.ndarray
    dt: jnp.ndarray
    mask: jnp.ndarray


class LioState(NamedTuple):
    x: NavState
    P: jnp.ndarray  # (24,24)
    map: HashVoxelMap
    frame: jnp.ndarray


class LioResult(NamedTuple):
    x: NavState
    n_matches: jnp.ndarray
    rms: jnp.ndarray
    n_dropped: jnp.ndarray = jnp.int32(0)  # map inserts lost to full chains


def init_lio_state(cfg: LioConfig, x0: NavState | None = None, p0_scale: float = 1e-3) -> LioState:
    return LioState(
        x=x0 if x0 is not None else NavState.identity(),
        P=jnp.eye(24, dtype=jnp.float32) * p0_scale,
        map=empty_map(cfg.map),
        frame=jnp.int32(0),
    )


def static_init(gyro: jnp.ndarray, acc: jnp.ndarray, mask: jnp.ndarray) -> NavState:
    """Initialize biases + gravity from a stationary window (IMU_Processing.hpp
    IMU_init :180-244): bg = mean gyro; gravity direction from mean specific
    force; orientation stays identity (gravity is estimated in-state)."""
    w = mask.astype(jnp.float32)[:, None]
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    bg = jnp.sum(gyro * w, axis=0) / cnt
    a_mean = jnp.sum(acc * w, axis=0) / cnt
    g = -9.81 * a_mean / jnp.maximum(jnp.linalg.norm(a_mean), 1e-6)
    x = NavState.identity()
    return x._replace(bg=bg, g=g)


def _propagate_window(x: NavState, P: jnp.ndarray, imu: ImuWindow, noise: EskfNoise):
    """Propagate the 24-dim ESKF over the IMU window. Returns final (x,P) and
    the per-sample pose track (qs (M+1,4), ps (M+1,3), ts (M+1,)) for
    undistortion.

    Batched formulation (same recurrence as imu.eskf.predict, parity pinned
    by tests/test_lio.py): prefix quaternion products give all sample
    rotations at once, the velocity/position integrals are cumsums, and the
    covariance composes the per-step (F, Qd) pairs with an associative scan
    — log2(M) batched 24x24 matmul levels instead of M sequential predicts
    (which are latency-bound on TPU)."""
    from ..geometry import so3
    from ..imu.preintegration import compose_ltv, quat_prefix

    M = imu.gyro.shape[0]
    dts = jnp.where(imu.mask, imu.dt, 0.0)
    w_c = imu.gyro - x.bg[None, :]
    a_c = imu.acc - x.ba[None, :]

    # --- mean track ---------------------------------------------------------
    dq_steps = so3.quat_exp(w_c * dts[:, None])
    q_incl = quat_prefix(dq_steps)  # body-frame increments composed 1..k
    qs = jnp.concatenate([x.q[None], so3.quat_normalize(
        so3.quat_mul(x.q[None], q_incl))], axis=0)  # (M+1,4)
    R_excl = so3.quat_to_matrix(qs[:-1])  # (M,3,3) world_R_body before step k
    a_w = jnp.einsum("nij,nj->ni", R_excl, a_c) + x.g[None, :]
    dv_steps = a_w * dts[:, None]
    v_excl = x.v[None, :] + jnp.cumsum(dv_steps, axis=0) - dv_steps  # (M,3)
    p_steps = v_excl * dts[:, None] + 0.5 * a_w * dts[:, None] ** 2
    ps = x.p[None, :] + jnp.concatenate(
        [jnp.zeros((1, 3)), jnp.cumsum(p_steps, axis=0)], axis=0)  # (M+1,3)
    v_end = x.v + jnp.sum(dv_steps, axis=0)
    x_end = x._replace(q=qs[-1], p=ps[-1], v=v_end)
    ts = jnp.concatenate([jnp.zeros(1), jnp.cumsum(dts)])

    # --- covariance: batched (F, Qd) composition ----------------------------
    dt1 = dts[:, None, None]
    I3 = jnp.broadcast_to(jnp.eye(3), (M, 3, 3))
    Rh = jnp.einsum("nij,njk->nik", R_excl, so3.hat(a_c))
    F = jnp.broadcast_to(jnp.eye(24), (M, 24, 24))
    F = F.at[:, 0:3, 12:15].set(I3 * dt1)
    F = F.at[:, 3:6, 3:6].set(jax.vmap(so3.exp_matrix)(-w_c * dts[:, None]))
    F = F.at[:, 3:6, 15:18].set(-I3 * dt1)
    F = F.at[:, 12:15, 3:6].set(-Rh * dt1)
    F = F.at[:, 12:15, 18:21].set(-R_excl * dt1)
    F = F.at[:, 12:15, 21:24].set(I3 * dt1)
    # Qd = Fw Q Fw^T / dt (Fw block-sparse as in eskf.predict)
    s = 1.0 / jnp.maximum(dts, 1e-6)[:, None, None]
    Qd = jnp.zeros((M, 24, 24))
    Qd = Qd.at[:, 3:6, 3:6].set(I3 * noise.gyr * dt1 * dt1 * s)
    Qd = Qd.at[:, 12:15, 12:15].set(
        jnp.einsum("nij,nkj->nik", R_excl, R_excl) * noise.acc * dt1 * dt1 * s)
    Qd = Qd.at[:, 15:18, 15:18].set(I3 * noise.bg * dt1 * dt1 * s)
    Qd = Qd.at[:, 18:21, 18:21].set(I3 * noise.ba * dt1 * dt1 * s)

    A, C = compose_ltv(F, Qd)
    P_end = A[-1] @ P @ A[-1].T + C[-1]
    return x_end, P_end, qs, ps, ts


def undistort_to_end(
    pts_l: jnp.ndarray,  # (N,3) lidar frame, captured at pts_t
    pts_t: jnp.ndarray,  # (N,) seconds from sweep start
    x_end: NavState,
    qs: jnp.ndarray, ps: jnp.ndarray, ts: jnp.ndarray,
) -> jnp.ndarray:
    """Map each point into the scan-END lidar frame using the recorded pose
    track:  p_end = T_il^-1 T_w_end^-1 T_w(t) T_il p.  Vectorized replacement
    for the reference's backward per-point loop."""
    idx = jnp.clip(jnp.searchsorted(ts, pts_t, side="right"), 1, ts.shape[0] - 1)
    t0 = ts[idx - 1]
    t1 = ts[idx]
    s = jnp.clip((pts_t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    q_t = so3.slerp(qs[idx - 1], qs[idx], s)
    p_t = (1.0 - s)[:, None] * ps[idx - 1] + s[:, None] * ps[idx]

    R_li = so3.quat_to_matrix(x_end.q_li)
    body = pts_l @ R_li.T + x_end.t_li
    world = so3.quat_rotate(q_t, body) + p_t
    # back into the end-of-sweep IMU frame, then lidar frame
    q_end_c = so3.quat_conj(x_end.q)
    body_end = so3.quat_rotate(q_end_c, world - x_end.p)
    return (body_end - x_end.t_li) @ R_li


def _process_lio_body(
    state: LioState,
    pts_l: jnp.ndarray,  # (N,3) raw lidar points (sweep frame as captured)
    pts_t: jnp.ndarray,  # (N,) per-point time from sweep start (s)
    pts_mask: jnp.ndarray,  # (N,)
    imu: ImuWindow,
    cfg: LioConfig,
    update_fn=None,  # update_iterated signature; the multi-chip hook
) -> Tuple[LioState, LioResult]:
    upd = update_fn if update_fn is not None else update_iterated
    x_prop, P_prop, qs, ps, ts = _propagate_window(state.x, state.P, imu, cfg.noise)

    und = undistort_to_end(pts_l, pts_t, x_prop, qs, ps, ts)
    ds = voxel_downsample(und, pts_mask, cfg.scan_voxel, cfg.max_scan_pts)

    x_new, P_new, n_ok, rms = upd(
        x_prop, P_prop, ds, state.map, cfg.map, cfg.ieskf
    )

    # failure detection (LIO-SAM imuPreintegration.cpp:580-600): a diverged
    # velocity or bias estimate resets biases and re-inflates covariance
    # instead of letting the filter run away
    diverged = (
        (jnp.linalg.norm(x_new.v) > 30.0)
        | (jnp.linalg.norm(x_new.ba) > 1.0)
        | (jnp.linalg.norm(x_new.bg) > 1.0)
        | ~jnp.all(jnp.isfinite(jnp.concatenate([x_new.p, x_new.v])))
    )
    fallback = x_prop._replace(v=jnp.zeros(3), bg=jnp.zeros(3), ba=jnp.zeros(3))
    x_new = jax.tree.map(
        lambda a, b: jnp.where(diverged, a, b), fallback, x_new
    )
    P_new = jnp.where(diverged, jnp.eye(24, dtype=P_new.dtype) * 1e-1, P_new)

    # map update in the corrected pose (map_incremental, laserMapping.cpp:382-433)
    from ..imu.eskf import lidar_to_world

    world_pts = lidar_to_world(x_new, ds.xyz)
    new_map, n_drop = insert_with_stats(state.map, world_pts, ds.mask, cfg.map)
    if cfg.bound_radius > 0:
        new_map = bound_map(new_map, x_new.p, cfg.bound_radius, cfg.map)

    return (
        LioState(x_new, P_new, new_map, state.frame + 1),
        LioResult(x_new, n_ok, rms, n_drop),
    )


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def process_lio_scan(
    state: LioState,
    pts_l: jnp.ndarray,
    pts_t: jnp.ndarray,
    pts_mask: jnp.ndarray,
    imu: ImuWindow,
    cfg: LioConfig,
) -> Tuple[LioState, LioResult]:
    """The single-chip jitted per-scan step (see _process_lio_body)."""
    return _process_lio_body(state, pts_l, pts_t, pts_mask, imu, cfg)
