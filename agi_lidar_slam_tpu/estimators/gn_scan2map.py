"""Scan-to-map Gauss-Newton: batched association + fused normal equations.

This is the L6 local estimator of SURVEY.md for the LOAM family, replacing:
* A-LOAM laserMapping.cpp:637-817 (per-point kd-tree 5-NN, Ceres auto-diff
  edge/plane factors, 2 outer x 4 inner LM iterations),
* LIO-SAM mapOptmization.cpp:1303-1700 (OpenMP corner/surf loops + hand-rolled
  LMOptimization with eigenvalue degeneracy projection, 30 iterations),
* livox_mapping laserMapping.cpp:821-1105 (cv::solve 6-dof GN).

TPU-native shape, mirroring the reference's own outer/inner structure:
* OUTER iterations re-associate all features in parallel (batched voxel-map
  KNN + closed-form line/plane fits) — the expensive gathers;
* INNER iterations re-linearize and step against the FIXED geometric
  primitives (line centroid/direction, plane normal/offset) — pure einsum
  work, nearly free.
The 6x6 normal equations reduce with one einsum (a `psum` when the point axis
is sharded across chips), degenerate directions are clamped LIO-SAM-style, and
the pose updates on the SE(3) manifold.

Perturbation convention: see geometry/se3.py — right rotation perturbation,
additive translation:  dw/dtheta = -R [p]x,  dw/dt = I.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MapConfig, SolverConfig
from ..fit.geometry_fit import fit_lines, fit_planes
from ..geometry import se3, so3
from ..map.hash_map import HashVoxelMap
from ..map.planar import build_planar
from ..nn.knn import (KnnResult, _vmem_kernel_mode, knn, knn_cand,
                      knn_reselect, make_cand)


def _first_k(res: KnnResult, k: int) -> KnnResult:
    """First k of an ascending-by-distance KnnResult (free k-NN extraction
    from a cand_k-wide probe)."""
    return KnnResult(res.points[:, :k], res.sq_dists[:, :k], res.valid[:, :k])
from ..pointcloud.cloud import PointBatch


def _maybe_tab(m: HashVoxelMap, cfg: MapConfig):
    """Planar table for the VMEM association kernel, or None on XLA paths.
    Built once per map epoch so every association pass reuses it."""
    return build_planar(m, cfg) if _vmem_kernel_mode(cfg)[0] else None


class GnStats(NamedTuple):
    n_corner: jnp.ndarray  # valid edge correspondences in the final iteration
    n_surf: jnp.ndarray
    rms: jnp.ndarray  # robust residual RMS in the final iteration
    degenerate: jnp.ndarray  # bool: any clamped direction in the final iteration


class Correspondences(NamedTuple):
    """Fixed geometric primitives from one association pass."""

    line_centroid: jnp.ndarray  # (Nc,3)
    line_dir: jnp.ndarray  # (Nc,3) unit
    ok_c: jnp.ndarray  # (Nc,)
    plane_n: jnp.ndarray  # (Ns,3) unit
    plane_d: jnp.ndarray  # (Ns,)
    ok_s: jnp.ndarray  # (Ns,)


def _huber_sqrt_weight(r_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """sqrt of the Huber IRLS weight: 1 inside |r|<delta, sqrt(delta/|r|) outside."""
    return jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(r_norm, 1e-12)))


def associate(
    pose: se3.Pose,
    corners: PointBatch,
    surfs: PointBatch,
    corner_map: HashVoxelMap,
    surf_map: HashVoxelMap,
    cmap_cfg: MapConfig,
    smap_cfg: MapConfig,
    cfg: SolverConfig,
    corner_tab: jnp.ndarray | None = None,
    surf_tab: jnp.ndarray | None = None,
    knn_fn=None,
) -> Correspondences:
    """One association pass: KNN + line/plane fits at the current pose.

    `knn_fn` overrides the map lookup (same signature as nn.knn.knn) — the
    hook that lets the mp-sharded map (parallel/map_shard.sharded_knn) serve
    association when the map exceeds one chip's HBM."""
    lookup = knn_fn if knn_fn is not None else knn
    R = so3.quat_to_matrix(pose.q)
    k = cfg.k_neighbors

    cw = corners.xyz @ R.T + pose.t
    nc = lookup(corner_map, cw, corners.mask, k, cmap_cfg, tab=corner_tab)
    gate_c = nc.sq_dists[:, k - 1] < cfg.corner_gate_sq
    line = fit_lines(nc.points, nc.valid, cfg.line_eig_ratio)
    ok_c = corners.mask & gate_c & line.ok

    sw = surfs.xyz @ R.T + pose.t
    ns = lookup(surf_map, sw, surfs.mask, k, smap_cfg, tab=surf_tab)
    gate_s = ns.sq_dists[:, k - 1] < cfg.surf_gate_sq
    plane = fit_planes(ns.points, ns.valid, cfg.plane_tol)
    ok_s = surfs.mask & gate_s & plane.ok

    return Correspondences(line.centroid, line.direction, ok_c,
                           plane.normal, plane.offset, ok_s)


def _cache_motion(pose: se3.Pose, q_ref: jnp.ndarray, t_ref: jnp.ndarray,
                  lever: float = 30.0) -> jnp.ndarray:
    """Effective motion since a cached probe: |dt| + lever * |dtheta| (the
    worst-case query displacement at `lever` meters range)."""
    dth = so3.quat_log(so3.quat_mul(so3.quat_conj(q_ref), pose.q))
    return jnp.linalg.norm(pose.t - t_ref) + lever * jnp.linalg.norm(dth)


def associate_cached(
    pose: se3.Pose,
    corners: PointBatch,
    surfs: PointBatch,
    corner_map: HashVoxelMap,
    surf_map: HashVoxelMap,
    cmap_cfg: MapConfig,
    smap_cfg: MapConfig,
    cfg: SolverConfig,
    cand: tuple | None = None,
    corner_tab: jnp.ndarray | None = None,
    surf_tab: jnp.ndarray | None = None,
    knn_fn=None,
) -> tuple[Correspondences, tuple]:
    """Association with a candidate cache (SolverConfig.cand_k).

    First call (cand=None): ONE map probe per class for cand_k candidates,
    returned as the cache (plus the probe pose). Later calls re-rank the
    cached world-frame candidate points at the updated pose (knn_reselect) —
    no table traffic — unless the pose moved more than SolverConfig.
    cand_refresh since the probe, in which case a lax.cond re-probes (the
    neighbor-list "skin distance": protects cold starts and bad initial
    guesses). Fits/gates are identical to `associate`."""
    R = so3.quat_to_matrix(pose.q)
    k = cfg.k_neighbors

    cw = corners.xyz @ R.T + pose.t
    sw = surfs.xyz @ R.T + pose.t

    def probe():
        """Map probe for the candidate cache + the k-NN of THIS pass for
        free (the candidate list is ascending by distance)."""
        if knn_fn is None:
            cc, nc = knn_cand(corner_map, cw, corners.mask, cfg.cand_k,
                              cmap_cfg, tab=corner_tab, k=k)
            cs, ns = knn_cand(surf_map, sw, surfs.mask, cfg.cand_k,
                              smap_cfg, tab=surf_tab, k=k)
        else:
            fc = knn_fn(corner_map, cw, corners.mask, cfg.cand_k, cmap_cfg, tab=corner_tab)
            fs = knn_fn(surf_map, sw, surfs.mask, cfg.cand_k, smap_cfg, tab=surf_tab)
            cc, nc = make_cand(fc), _first_k(fc, k)
            cs, ns = make_cand(fs), _first_k(fs, k)
        return (cc, cs, pose.q, pose.t), nc, ns

    if cand is None:
        cand, nc, ns = probe()
    else:
        def reuse():
            return (cand,
                    knn_reselect(cand[0], cw, corners.mask, k),
                    knn_reselect(cand[1], sw, surfs.mask, k))

        moved = _cache_motion(pose, cand[2], cand[3])
        cand, nc, ns = jax.lax.cond(moved > cfg.cand_refresh, probe, reuse)
    gate_c = nc.sq_dists[:, k - 1] < cfg.corner_gate_sq
    line = fit_lines(nc.points, nc.valid, cfg.line_eig_ratio)
    ok_c = corners.mask & gate_c & line.ok
    gate_s = ns.sq_dists[:, k - 1] < cfg.surf_gate_sq
    plane = fit_planes(ns.points, ns.valid, cfg.plane_tol)
    ok_s = surfs.mask & gate_s & plane.ok

    corr = Correspondences(line.centroid, line.direction, ok_c,
                           plane.normal, plane.offset, ok_s)
    return corr, cand


def normal_equations(
    pose: se3.Pose,
    corners: PointBatch,
    surfs: PointBatch,
    corr: Correspondences,
    cfg: SolverConfig,
):
    """Linearize at `pose` against fixed correspondences. Returns (H, g, stats).

    Per-point H/g contributions are exact sums over points, so a psum over a
    point-shard axis (parallel/sharding.py) completes them — the TPU analog of
    the reference's OpenMP parallel-for (mapOptmization.cpp:1307,1442).
    """
    R = so3.quat_to_matrix(pose.q)

    # ---- edge (corner) rows -------------------------------------------------
    cw = corners.xyz @ R.T + pose.t
    u = corr.line_dir
    P = jnp.eye(3) - u[:, :, None] * u[:, None, :]  # (N,3,3) projector
    e = jnp.einsum("nij,nj->ni", P, cw - corr.line_centroid)
    # zero invalid rows BEFORE weighting: invalid fits can carry inf/nan and
    # inf * 0-weight = nan would poison the H/g reductions
    e = jnp.where(corr.ok_c[:, None], e, 0.0)
    Jr = jnp.einsum("nij,njk->nik", P, -jnp.einsum("ij,njk->nik", R, so3.hat(corners.xyz)))
    Jc = jnp.concatenate([Jr, P], axis=-1)  # (N,3,6)
    w_c = _huber_sqrt_weight(jnp.linalg.norm(e, axis=-1), cfg.huber_delta)
    w_c = jnp.where(corr.ok_c, w_c, 0.0)
    e_w = e * w_c[:, None]
    J_w = Jc * w_c[:, None, None]
    H = jnp.einsum("nri,nrj->ij", J_w, J_w)
    g = jnp.einsum("nri,nr->i", J_w, e_w)
    sq_sum = jnp.sum(e_w * e_w)
    n_rows = 3.0 * jnp.sum(corr.ok_c)

    # ---- plane (surf) rows --------------------------------------------------
    sw = surfs.xyz @ R.T + pose.t
    r_s = jnp.einsum("ni,ni->n", corr.plane_n, sw) + corr.plane_d
    r_s = jnp.where(corr.ok_s, r_s, 0.0)  # see edge-row comment
    Jr_s = jnp.einsum(
        "ni,nij->nj", corr.plane_n, -jnp.einsum("ij,njk->nik", R, so3.hat(surfs.xyz))
    )
    Js = jnp.concatenate([Jr_s, corr.plane_n], axis=-1)  # (N,6)
    w_s = _huber_sqrt_weight(jnp.abs(r_s), cfg.huber_delta)
    w_s = jnp.where(corr.ok_s, w_s, 0.0)
    r_sw = r_s * w_s
    Js_w = Js * w_s[:, None]
    H = H + jnp.einsum("ni,nj->ij", Js_w, Js_w)
    g = g + jnp.einsum("ni,n->i", Js_w, r_sw)
    sq_sum = sq_sum + jnp.sum(r_sw * r_sw)
    n_rows = n_rows + jnp.sum(corr.ok_s)

    stats = (jnp.sum(corr.ok_c), jnp.sum(corr.ok_s), sq_sum, n_rows)
    return H, g, stats


def solve_delta(H: jnp.ndarray, g: jnp.ndarray, cfg: SolverConfig):
    """Degeneracy-aware 6x6 solve: eigen-decompose H, zero update components
    along eigendirections with eigenvalue below the threshold (LIO-SAM
    LMOptimization :1552-1700 matP projection; LeGO eigThre logic)."""
    vals, vecs = jnp.linalg.eigh(H)  # ascending
    good = vals > cfg.degen_eig_thresh
    inv = jnp.where(good, 1.0 / jnp.where(good, vals, 1.0), 0.0)
    delta = -(vecs * inv[None, :]) @ (vecs.T @ g)
    # stability guard against pathological association (far outliers)
    dt_norm = jnp.linalg.norm(delta[3:])
    scale = jnp.minimum(1.0, cfg.translation_clip / jnp.maximum(dt_norm, 1e-12))
    return delta * scale, ~jnp.all(good)


def solve_scan2map(
    pose0: se3.Pose,
    corners: PointBatch,
    surfs: PointBatch,
    corner_map: HashVoxelMap,
    surf_map: HashVoxelMap,
    cmap_cfg: MapConfig,
    smap_cfg: MapConfig,
    cfg: SolverConfig,
    deskew: tuple | None = None,
    axis_name: str | None = None,
    knn_fn=None,
):
    """Iterated GN from initial guess pose0. Returns (pose, GnStats).

    With `axis_name` (inside shard_map) the feature point axis is SHARDED
    over that mesh axis: each device associates and linearizes its local
    shard and the 6x6 normal equations complete with one psum — the exact
    OpenMP-to-collective mapping of the reference's parallel-for
    (mapOptmization.cpp:1307,1442). The solve and pose update replicate.

    `deskew = (corner_tau, surf_tau, prev_pose)` enables in-loop motion
    compensation: at each OUTER pass the raw (distorted) feature points are
    re-deskewed with the CURRENT relative-motion estimate
    rel = prev_pose^-1 . pose before association/linearization. This is the
    reference's own formulation — A-LOAM's TransformToStart runs inside the
    cost functor on the live optimization variables (laserOdometry.cpp:
    124-145, lidarFactor.hpp:28-40) — and it matters dynamically: a one-shot
    deskew at the predicted motion feeds each scan's estimate error into the
    next scan's deskew, which alternates sign and grows into a lateral
    sawtooth on straight fast motion. In-loop deskew corrects the warp within
    the same scan's optimization, killing the feedback path.
    """
    corner_tab = _maybe_tab(corner_map, cmap_cfg) if knn_fn is None else None
    surf_tab = _maybe_tab(surf_map, smap_cfg) if knn_fn is None else None
    use_cache = cfg.cand_k >= cfg.k_neighbors

    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    def deskewed(pose):
        if deskew is None:
            return corners, surfs
        tau_c, tau_s, prev_pose = deskew
        rel = se3.compose(se3.inverse(prev_pose), pose)
        c_i = PointBatch(se3.apply_interpolated(rel, tau_c, corners.xyz),
                         corners.mask)
        s_i = PointBatch(se3.apply_interpolated(rel, tau_s, surfs.xyz),
                         surfs.mask)
        return c_i, s_i

    pose = pose0
    stats = GnStats(jnp.int32(0), jnp.int32(0), jnp.float32(0.0), jnp.bool_(False))
    cand = None
    # outer loop unrolled (n_outer is 2-5): pass 1 probes the map, later
    # passes re-rank the candidate cache (SolverConfig.cand_k)
    for io in range(cfg.n_outer):
        c_i, s_i = deskewed(pose)
        if use_cache:
            corr, cand = associate_cached(
                pose, c_i, s_i, corner_map, surf_map, cmap_cfg, smap_cfg, cfg,
                cand=cand, corner_tab=corner_tab, surf_tab=surf_tab,
                knn_fn=knn_fn)
        else:
            corr = associate(pose, c_i, s_i, corner_map, surf_map,
                             cmap_cfg, smap_cfg, cfg, corner_tab, surf_tab,
                             knn_fn=knn_fn)

        def inner(_, carry2):
            pose, _ = carry2
            H, g, (n_c, n_s, sq, n_rows) = normal_equations(pose, c_i, s_i, corr, cfg)
            H, g = allsum(H), allsum(g)
            n_c, n_s = allsum(n_c), allsum(n_s)
            sq, n_rows = allsum(sq), allsum(n_rows)
            delta, degen = solve_delta(H, g, cfg)
            pose = se3.boxplus(pose, delta)
            rms = jnp.sqrt(sq / jnp.maximum(n_rows, 1.0))
            return pose, GnStats(n_c, n_s, rms, degen)

        pose, stats = jax.lax.fori_loop(0, cfg.n_inner, inner, (pose, stats))
    return pose, stats
