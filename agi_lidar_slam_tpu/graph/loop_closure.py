"""Loop-closure detection and alignment.

Replaces the reference's loop-closure thread (LIO-SAM mapOptmization.cpp:
686-707 loopClosureThread, detectLoopClosureDistance :836-881,
performLoopClosure + pcl ICP :698-707; LeGO-LOAM :844-1023):

* detection: nearest keyframe by Euclidean distance with a minimum scan-index
  separation (the reference's 30 s time gate);
* alignment: instead of pcl::IterativeClosestPoint, the candidate's +-half
  window of keyframe clouds is assembled into a small hashed voxel map and the
  current keyframe's features are registered against it with the SAME
  batched scan-to-map GN used for odometry — one engine, reused;
* acceptance: residual-RMS fitness gate (historyKeyframeFitnessScore 0.3).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig, SolverConfig
from ..estimators.gn_scan2map import solve_scan2map
from ..geometry import se3, so3
from ..map.hash_map import empty_map, insert
from ..pointcloud.cloud import PointBatch
from .keyframes import KeyframeBank


class LoopConfig(NamedTuple):
    radius: float = 5.0  # historyKeyframeSearchRadius (LIO-SAM params.yaml)
    min_stamp_sep: int = 100  # scan-index analog of the 30 s time gate
    submap_half: int = 12  # historyKeyframeSearchNum = 25
    fitness_thresh: float = 0.3  # historyKeyframeFitnessScore
    min_matches: int = 100
    map_cfg: MapConfig = MapConfig(sub_voxel=0.4, block_sub=4, log2_slots=14,
                                   neighborhood="full27")
    solver: SolverConfig = SolverConfig(n_outer=5, n_inner=3, surf_gate_sq=2.0,
                                        corner_gate_sq=2.0, degen_eig_thresh=10.0)


def detect_loop(bank: KeyframeBank, cur_idx: jnp.ndarray,
                cfg: LoopConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest old keyframe within radius and stamp separation.
    Returns (candidate index, found flag)."""
    K = bank.capacity
    ids = jnp.arange(K)
    live = ids < bank.count
    sep = jnp.abs(bank.stamp - bank.stamp[cur_idx]) >= cfg.min_stamp_sep
    d = jnp.linalg.norm(bank.t - bank.t[cur_idx], axis=-1)
    d = jnp.where(live & sep & (ids != cur_idx), d, jnp.inf)
    cand = jnp.argmin(d)
    found = d[cand] < cfg.radius
    return cand.astype(jnp.int32), found


def _window_cloud(xyz: jnp.ndarray, mask: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray,
                  start: jnp.ndarray, size: int, count: jnp.ndarray):
    """Gather `size` keyframes' clouds from `start`, world-transformed."""
    K = xyz.shape[0]
    w_xyz = jax.lax.dynamic_slice_in_dim(xyz, start, size, axis=0)  # (S,N,3)
    w_mask = jax.lax.dynamic_slice_in_dim(mask, start, size, axis=0)
    w_q = jax.lax.dynamic_slice_in_dim(q, start, size, axis=0)
    w_t = jax.lax.dynamic_slice_in_dim(t, start, size, axis=0)
    idx_valid = (start + jnp.arange(size)) < count
    R = so3.quat_to_matrix(w_q)  # (S,3,3)
    world = jnp.einsum("sij,snj->sni", R, w_xyz) + w_t[:, None, :]
    m = w_mask & idx_valid[:, None]
    return world.reshape(-1, 3), m.reshape(-1)


def align_loop(
    bank: KeyframeBank,
    cur_idx: jnp.ndarray,
    cand_idx: jnp.ndarray,
    cfg: LoopConfig,
):
    """Register the current keyframe against the candidate's submap.

    Returns (z_rel: candidate_T_current measurement, fitness rms, ok flag).
    Jittable; window size is static.
    """
    size = 2 * cfg.submap_half + 1
    start = jnp.clip(cand_idx - cfg.submap_half, 0, jnp.maximum(bank.count - size, 0))

    c_xyz, c_mask = _window_cloud(bank.corner_xyz, bank.corner_mask, bank.q, bank.t,
                                  start, size, bank.count)
    s_xyz, s_mask = _window_cloud(bank.surf_xyz, bank.surf_mask, bank.q, bank.t,
                                  start, size, bank.count)
    cmap = insert(empty_map(cfg.map_cfg), c_xyz, c_mask, cfg.map_cfg)
    smap = insert(empty_map(cfg.map_cfg), s_xyz, s_mask, cfg.map_cfg)

    cur_pose = se3.Pose(bank.q[cur_idx], bank.t[cur_idx])
    corners = PointBatch(bank.corner_xyz[cur_idx], bank.corner_mask[cur_idx])
    surfs = PointBatch(bank.surf_xyz[cur_idx], bank.surf_mask[cur_idx])

    pose_ref, stats = solve_scan2map(
        cur_pose, corners, surfs, cmap, smap, cfg.map_cfg, cfg.map_cfg, cfg.solver
    )

    ok = (
        (stats.rms < cfg.fitness_thresh)
        & ((stats.n_corner + stats.n_surf) > cfg.min_matches)
        & jnp.all(jnp.isfinite(pose_ref.t))
    )
    cand_pose = se3.Pose(bank.q[cand_idx], bank.t[cand_idx])
    z_rel = se3.compose(se3.inverse(cand_pose), pose_ref)
    return z_rel, stats.rms, ok
