"""Single-program odometry+mapping pipeline (the engine's per-scan hot path).

Where the reference runs 3-4 ROS processes connected by lossy pub/sub
(A-LOAM scanRegistration -> laserOdometry -> laserMapping; SURVEY.md section
3.1), this engine is ONE jitted function per scan: deskew -> feature
extraction -> scan-to-map GN -> map insertion, all fused into a single XLA
program — stage overlap comes from XLA's scheduler instead of TCP queues.

Configuration `deskew=True` reproduces the constant-velocity distortion model
(A-LOAM TransformToStart, laserOdometry.cpp:124-145: interpolate the previous
relative motion by each point's intra-sweep time).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..estimators.gn_scan2map import GnStats, solve_scan2map
from ..estimators.two_step import solve_scan2map_two_step
from ..features.curvature import extract_features_timed
from ..geometry import se3, so3
from ..map.hash_map import HashVoxelMap, bound_map, empty_map, insert, insert_with_stats
from ..pointcloud.cloud import PointBatch, ScanGrid
from ..pointcloud.voxel import voxel_downsample_aux


class EngineState(NamedTuple):
    pose: se3.Pose  # world_T_sensor at the latest processed sweep start
    prev_pose: se3.Pose  # pose one sweep earlier (constant-velocity model)
    corner_map: HashVoxelMap
    surf_map: HashVoxelMap
    frame: jnp.ndarray  # int32 scan counter
    # previous scan's features (sensor frame) for the optional scan-to-scan
    # odometry stage (A-LOAM laserOdometry kd-tree swap :650-665)
    prev_corners: PointBatch
    prev_surfs: PointBatch


class ScanResult(NamedTuple):
    pose: se3.Pose
    stats: GnStats
    corners: "PointBatch"  # downsampled sensor-frame features of this scan
    surfs: "PointBatch"
    n_dropped: jnp.ndarray = jnp.int32(0)  # map inserts lost to full chains


def init_state(cfg: PipelineConfig) -> EngineState:
    f = cfg.features
    return EngineState(
        pose=se3.Pose.identity(),
        prev_pose=se3.Pose.identity(),
        corner_map=empty_map(cfg.corner_map),
        surf_map=empty_map(cfg.surf_map),
        frame=jnp.int32(0),
        prev_corners=PointBatch(jnp.zeros((f.max_corners, 3)),
                                jnp.zeros((f.max_corners,), bool)),
        prev_surfs=PointBatch(jnp.zeros((f.max_surfs, 3)),
                              jnp.zeros((f.max_surfs,), bool)),
    )


def deskew_constant_velocity(scan: ScanGrid, rel: se3.Pose) -> ScanGrid:
    """Whole-grid constant-velocity deskew (A-LOAM TransformToStart applied to
    every point). The hot path no longer uses this — process_scan extracts
    features on the distorted cloud and the SOLVER deskews the selected
    features at every association pass (se3.apply_interpolated), exactly the
    reference's structure (scanRegistration extracts on the raw cloud;
    laserOdometry deskews per feature point on the live estimate, :124-145).
    Kept for tests and grid-level consumers."""
    xyz = se3.apply_interpolated(rel, scan.time.reshape(-1),
                                 scan.xyz.reshape(-1, 3))
    return ScanGrid(xyz.reshape(scan.xyz.shape), scan.mask, scan.time)


def _process_scan_body(
    state: EngineState, scan: ScanGrid, cfg: PipelineConfig,
    solve_fn=solve_scan2map,
    solve_two_fn=solve_scan2map_two_step,
    insert_fn=insert_with_stats,
) -> Tuple[EngineState, ScanResult]:
    """The per-scan pipeline, parameterized over its solver/insert ops so the
    multi-chip variants (parallel/sharding.py) run the IDENTICAL math with the
    point axis sharded (dp) or the map slot-sharded (mp) — no forked step."""
    rel = se3.compose(se3.inverse(state.prev_pose), state.pose)

    # Features are extracted on the RAW (distorted) sweep — the reference's
    # structure: scanRegistration picks on the raw cloud, and deskew happens
    # per feature point INSIDE the optimization (TransformToStart on the live
    # estimate, laserOdometry.cpp:124-145). The solver re-deskews at every
    # association pass via the per-feature sweep times (voxel-mean over each
    # downsample cell, exactly as PCL centroids average the time-encoding
    # intensity field).
    feats = extract_features_timed(scan, cfg.features)
    corners, tau_c = voxel_downsample_aux(
        feats.corners.xyz, feats.corners.mask, cfg.corner_ds_voxel,
        cfg.features.max_corners, aux=feats.corner_tau,
    )
    surfs, tau_s = voxel_downsample_aux(
        feats.surfs.xyz, feats.surfs.mask, cfg.surf_ds_voxel,
        cfg.features.max_surfs, aux=feats.surf_tau,
    )

    if cfg.odometry_stage:
        # scan-to-scan refinement of the motion prediction: register this
        # scan's features against the previous scan's features (built into a
        # throwaway hashed map in the previous sensor frame). With
        # odom_two_tier the queries are the small SHARP/FLAT tiers and the
        # targets the previous dense tiers — the reference's asymmetric
        # sharp->less-sharp matching (laserOdometry.cpp:341-573)
        if cfg.odom_two_tier:
            q_c, q_s = feats.sharp, feats.flat
            qtau_c, qtau_s = feats.sharp_tau, feats.flat_tau
        else:
            q_c, q_s = corners, surfs
            qtau_c, qtau_s = tau_c, tau_s
        ocmap = insert(empty_map(cfg.odom_map), state.prev_corners.xyz,
                       state.prev_corners.mask, cfg.odom_map)
        osmap = insert(empty_map(cfg.odom_map), state.prev_surfs.xyz,
                       state.prev_surfs.mask, cfg.odom_map)
        rel_opt, _ = solve_fn(
            rel, q_c, q_s, ocmap, osmap, cfg.odom_map, cfg.odom_map,
            cfg.odom_solver,
            deskew=(qtau_c, qtau_s, se3.Pose.identity()) if cfg.deskew else None,
        )
        pred = se3.compose(state.pose, rel_opt)
    else:
        pred = se3.compose(state.pose, rel)  # constant-velocity initial guess

    # On an empty map (first frames) every eigenvalue of H is below the
    # degeneracy threshold, so the solver is a no-op and the pose stays at the
    # prediction — no special first-frame branch needed.
    dsk = (tau_c, tau_s, state.pose) if cfg.deskew else None
    solver_fn = solve_two_fn if cfg.two_step else solve_fn
    pose_opt, stats = solver_fn(
        pred, corners, surfs, state.corner_map, state.surf_map,
        cfg.corner_map, cfg.surf_map, cfg.solver, deskew=dsk,
    )

    if cfg.deskew:
        # final motion compensation at the optimized estimate (what the map
        # stores, the keyframe bank keeps, and the odometry stage reuses)
        rel_opt = se3.compose(se3.inverse(state.pose), pose_opt)
        corners = PointBatch(se3.apply_interpolated(rel_opt, tau_c, corners.xyz),
                             corners.mask)
        surfs = PointBatch(se3.apply_interpolated(rel_opt, tau_s, surfs.xyz),
                           surfs.mask)

    R = so3.quat_to_matrix(pose_opt.q)
    cmap, drop_c = insert_fn(state.corner_map, corners.xyz @ R.T + pose_opt.t,
                             corners.mask, cfg.corner_map)
    smap, drop_s = insert_fn(state.surf_map, surfs.xyz @ R.T + pose_opt.t,
                             surfs.mask, cfg.surf_map)
    if cfg.bound_radius > 0:
        cmap = bound_map(cmap, pose_opt.t, cfg.bound_radius, cfg.corner_map)
        smap = bound_map(smap, pose_opt.t, cfg.bound_radius, cfg.surf_map)

    new_state = EngineState(pose_opt, state.pose, cmap, smap, state.frame + 1,
                            corners, surfs)
    return new_state, ScanResult(pose_opt, stats, corners, surfs, drop_c + drop_s)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def process_scan(
    state: EngineState, scan: ScanGrid, cfg: PipelineConfig
) -> Tuple[EngineState, ScanResult]:
    """Process one sweep. Pure function: jit once, stream scans through it."""
    return _process_scan_body(state, scan, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def process_scan_chunk(
    state: EngineState, scans: ScanGrid, cfg: PipelineConfig
) -> Tuple[EngineState, ScanResult]:
    """Process a CHUNK of scans (leading axis C) in one XLA launch via
    lax.scan — mathematically identical to C sequential process_scan calls
    (exact pose parity, tested). Measured on the tunneled v5e backend the
    per-scan path is FASTER (136 vs 128 scans/s at C=5): the async dispatch
    queue already hides per-launch latency, while lax.scan stacks every
    per-scan ScanResult into chunk-axis outputs (extra HBM writes). Kept for
    backends/embeddings where dispatch cannot run ahead (e.g. host-driven
    step-lock loops); per-scan latency consumers use process_scan."""

    def body(st, scan):
        st2, res = process_scan(st, scan, cfg)
        return st2, res

    return jax.lax.scan(body, state, scans)


def run_sequence(scans, cfg: PipelineConfig, state: EngineState | None = None):
    """Host driver: stream a list/iterator of ScanGrids through the engine.
    Returns (final state, list of ScanResults)."""
    if state is None:
        state = init_state(cfg)
    results = []
    for scan in scans:
        state, res = process_scan(state, scan, cfg)
        results.append(res)
    return state, results
