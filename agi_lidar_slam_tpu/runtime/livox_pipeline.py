"""LIO-Livox-style engine: sliding-window MAP LIO with marginalization.

Re-designs the PoseEstimation driver (PoseEstimation.cpp:381-662) +
Estimator::EstimateLidarPose/Estimate (Estimator.cpp:838-1301):

per sweep: [optional dynamic-object removal] -> feature extraction ->
IMU-preintegration prediction of the new frame -> window shift ->
windowed MAP solve (lidar + IMU + marginalization prior) ->
marginalize the oldest frame -> map insert.

Window size 2 (SLIDEWINDOWSIZE, Estimator.h:29); the reference's 20-frame
initialization window maps to running `static_init` before engaging.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import FeatureConfig, MapConfig, SolverConfig
from ..estimators.window_map import (
    MarginalPrior,
    WindowState,
    marginalize_oldest,
    solve_window,
    window_information,
)
from ..features.curvature import extract_features
from ..features.dynamic_removal import DynamicRemovalConfig, remove_dynamic
from ..geometry import se3, so3
from ..imu.preintegration import ImuNoise, Preintegrated, preintegrate
from ..map.hash_map import HashVoxelMap, empty_map, insert
from ..pointcloud.cloud import PointBatch, ScanGrid
from ..pointcloud.voxel import voxel_downsample
from .lio_pipeline import ImuWindow


@dataclasses.dataclass(frozen=True)
class LivoxConfig:
    features: FeatureConfig = FeatureConfig(
        corners_per_sector=10, max_corners=1024, max_surfs=4096, surf_voxel=0.4
    )
    corner_map: MapConfig = MapConfig(sub_voxel=0.4, block_sub=4, log2_slots=15,
                                      neighborhood="full27")
    surf_map: MapConfig = MapConfig(sub_voxel=0.4, block_sub=2, log2_slots=16,
                                    neighborhood="full27")
    solver: SolverConfig = SolverConfig(n_outer=3, n_inner=2, degen_eig_thresh=10.0)
    corner_ds_voxel: float = 0.3
    surf_ds_voxel: float = 0.4
    use_dynamic_removal: bool = True
    dynamic: DynamicRemovalConfig = DynamicRemovalConfig()
    imu_noise: ImuNoise = ImuNoise()
    lidar_weight: float = 30.0


class LivoxState(NamedTuple):
    ws: WindowState  # 2 frames: [previous, current]
    prior: MarginalPrior  # embedded over the full window (zeros on new frame)
    corners: PointBatch  # (2, Nc, 3) per-window-frame sensor-frame features
    surfs: PointBatch
    corner_map: HashVoxelMap
    surf_map: HashVoxelMap
    grav: jnp.ndarray
    frame: jnp.ndarray


class LivoxResult(NamedTuple):
    pose: se3.Pose
    residual: jnp.ndarray


def _embedded_empty_prior() -> MarginalPrior:
    return MarginalPrior(
        H=jnp.zeros((30, 30)), b=jnp.zeros((30,)),
        q0=jnp.tile(so3.quat_identity()[None], (2, 1)),
        t0=jnp.zeros((2, 3)), v0=jnp.zeros((2, 3)),
        bg0=jnp.zeros((2, 3)), ba0=jnp.zeros((2, 3)),
    )


def init_livox_state(cfg: LivoxConfig, x0: se3.Pose | None = None,
                     v0: jnp.ndarray | None = None,
                     grav: jnp.ndarray | None = None) -> LivoxState:
    p = x0 if x0 is not None else se3.Pose.identity()
    f = cfg.features
    ws = WindowState(
        q=jnp.tile(p.q[None], (2, 1)), t=jnp.tile(p.t[None], (2, 1)),
        v=jnp.tile((v0 if v0 is not None else jnp.zeros(3))[None], (2, 1)),
        bg=jnp.zeros((2, 3)), ba=jnp.zeros((2, 3)),
    )
    empty_pb = PointBatch(jnp.zeros((2, f.max_corners, 3)),
                          jnp.zeros((2, f.max_corners), bool))
    empty_sb = PointBatch(jnp.zeros((2, f.max_surfs, 3)),
                          jnp.zeros((2, f.max_surfs), bool))
    return LivoxState(
        ws=ws, prior=_embedded_empty_prior(),
        corners=empty_pb, surfs=empty_sb,
        corner_map=empty_map(cfg.corner_map), surf_map=empty_map(cfg.surf_map),
        grav=grav if grav is not None else jnp.asarray([0.0, 0.0, -9.81]),
        frame=jnp.int32(0),
    )


def _embed_prior(small: MarginalPrior, ws_new: WindowState) -> MarginalPrior:
    """Pad an (F-1)-frame prior into a full-window prior: the freshly added
    frame carries zero prior information."""
    H = jnp.zeros((30, 30)).at[:15, :15].set(small.H)
    b = jnp.zeros((30,)).at[:15].set(small.b)
    return MarginalPrior(
        H=H, b=b,
        q0=jnp.concatenate([small.q0, ws_new.q[1:]], axis=0),
        t0=jnp.concatenate([small.t0, ws_new.t[1:]], axis=0),
        v0=jnp.concatenate([small.v0, ws_new.v[1:]], axis=0),
        bg0=jnp.concatenate([small.bg0, ws_new.bg[1:]], axis=0),
        ba0=jnp.concatenate([small.ba0, ws_new.ba[1:]], axis=0),
    )


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def process_livox_scan(
    state: LivoxState,
    scan: ScanGrid,
    imu: ImuWindow,
    cfg: LivoxConfig,
) -> Tuple[LivoxState, LivoxResult]:
    # --- preprocessing: dynamic removal + features --------------------------
    if cfg.use_dynamic_removal:
        keep = remove_dynamic(scan, cfg.dynamic)
        scan = ScanGrid(scan.xyz, scan.mask & keep, scan.time)
    feats = extract_features(scan, cfg.features)
    corners_new = voxel_downsample(feats.corners.xyz, feats.corners.mask,
                                   cfg.corner_ds_voxel, cfg.features.max_corners)
    surfs_new = voxel_downsample(feats.surfs.xyz, feats.surfs.mask,
                                 cfg.surf_ds_voxel, cfg.features.max_surfs)

    # --- IMU preintegration over the sweep + prediction ---------------------
    cur = jax.tree.map(lambda x: x[1], state.ws)
    pre = preintegrate(imu.gyro, imu.acc, jnp.where(imu.mask, imu.dt, 0.0),
                       imu.mask, cur.bg, cur.ba, cfg.imu_noise)
    q_pred = so3.quat_normalize(so3.quat_mul(state.ws.q[1], pre.dq))
    Ri = so3.quat_to_matrix(state.ws.q[1])
    t_pred = (state.ws.t[1] + state.ws.v[1] * pre.dt
              + 0.5 * state.grav * pre.dt**2 + Ri @ pre.dp)
    v_pred = state.ws.v[1] + state.grav * pre.dt + Ri @ pre.dv

    # --- shift the window: [cur, predicted new] -----------------------------
    ws = WindowState(
        q=jnp.stack([state.ws.q[1], q_pred]),
        t=jnp.stack([state.ws.t[1], t_pred]),
        v=jnp.stack([state.ws.v[1], v_pred]),
        bg=jnp.stack([state.ws.bg[1], state.ws.bg[1]]),
        ba=jnp.stack([state.ws.ba[1], state.ws.ba[1]]),
    )
    corners = PointBatch(
        jnp.stack([state.corners.xyz[1], corners_new.xyz]),
        jnp.stack([state.corners.mask[1], corners_new.mask]),
    )
    surfs = PointBatch(
        jnp.stack([state.surfs.xyz[1], surfs_new.xyz]),
        jnp.stack([state.surfs.mask[1], surfs_new.mask]),
    )
    preints = jax.tree.map(lambda x: x[None], pre)

    # --- windowed MAP solve + marginalization -------------------------------
    ws_opt, resid = solve_window(
        ws, corners, surfs, state.corner_map, state.surf_map, preints,
        state.prior, state.grav, cfg.corner_map, cfg.surf_map, cfg.solver,
        cfg.lidar_weight,
    )
    H, b = window_information(
        ws_opt, corners, surfs, state.corner_map, state.surf_map, preints,
        state.grav, cfg.corner_map, cfg.surf_map, cfg.solver, cfg.lidar_weight,
    )
    # fold the old prior in at the solution before Schur-complementing:
    # its information vector shifts by -H_prior (x_opt [-] x_lin)
    from ..estimators.window_map import _boxminus_flat

    dx_lin = _boxminus_flat(ws_opt, state.prior)
    small = marginalize_oldest(ws_opt, H + state.prior.H,
                               b + state.prior.b - state.prior.H @ dx_lin)
    prior = _embed_prior(small, ws_opt)

    # --- map update at the optimized new pose -------------------------------
    pose_new = se3.Pose(ws_opt.q[1], ws_opt.t[1])
    Rn = so3.quat_to_matrix(pose_new.q)
    cmap = insert(state.corner_map, corners_new.xyz @ Rn.T + pose_new.t,
                  corners_new.mask, cfg.corner_map)
    smap = insert(state.surf_map, surfs_new.xyz @ Rn.T + pose_new.t,
                  surfs_new.mask, cfg.surf_map)

    new_state = LivoxState(
        ws=ws_opt, prior=prior, corners=corners, surfs=surfs,
        corner_map=cmap, surf_map=smap, grav=state.grav, frame=state.frame + 1,
    )
    return new_state, LivoxResult(pose_new, resid)
