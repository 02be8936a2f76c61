"""LeGO-LOAM two-step Gauss-Newton: planar step then rotational step.

Re-designs featureAssociation.cpp's split optimization:
* calculateTransformationSurf (:1573-1696): surf correspondences constrain
  (z, roll, pitch),
* calculateTransformationCorner (:1705-1815): corner correspondences constrain
  (x, y, yaw),
each 25 iterations with degeneracy projection (eigThre=10).

Here both steps reuse the engine's batched association + normal equations and
simply restrict the 6x6 system to the relevant 3-dof sub-blocks. In our
delta ordering (dtheta_x, dtheta_y, dtheta_z, dt_x, dt_y, dt_z):
  surf step   -> indices (0, 1, 5)  = roll, pitch, z
  corner step -> indices (2, 3, 4)  = yaw, x, y
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MapConfig, SolverConfig
from ..geometry import se3
from ..map.hash_map import HashVoxelMap
from ..pointcloud.cloud import PointBatch
from .gn_scan2map import GnStats, associate, normal_equations

_SURF_IDX = jnp.asarray([0, 1, 5])
_CORNER_IDX = jnp.asarray([2, 3, 4])


def _solve_subset(H: jnp.ndarray, g: jnp.ndarray, idx: jnp.ndarray,
                  eig_thresh: float):
    """Solve the 3-dof restriction of H d = -g with eigenvalue clamping;
    returns (full 6-vector with zeros elsewhere, any-direction-clamped bool —
    the matP degeneracy flag of featureAssociation.cpp:1651-1678)."""
    Hs = H[jnp.ix_(idx, idx)]
    gs = g[idx]
    vals, vecs = jnp.linalg.eigh(Hs)
    good = vals > eig_thresh
    inv = jnp.where(good, 1.0 / jnp.where(good, vals, 1.0), 0.0)
    d = -(vecs * inv[None, :]) @ (vecs.T @ gs)
    return jnp.zeros(6, dtype=H.dtype).at[idx].set(d), ~jnp.all(good)


def solve_scan2map_two_step(
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
    """Iterated two-step GN (LeGO configuration). Returns (pose, GnStats).

    `deskew = (corner_tau, surf_tau, prev_pose)` re-deskews the raw feature
    points at every outer pass with the current motion estimate (see
    solve_scan2map — LeGO's adjustDistortion runs upfront with IMU data, but
    the constant-velocity fallback benefits from the in-loop form).
    `axis_name`/`knn_fn` shard the point axis / the map exactly as in
    solve_scan2map."""
    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    def outer(_, carry):
        pose, _ = carry
        if deskew is not None:
            tau_c, tau_s, prev_pose = deskew
            rel = se3.compose(se3.inverse(prev_pose), pose)
            c_i = PointBatch(se3.apply_interpolated(rel, tau_c, corners.xyz),
                             corners.mask)
            s_i = PointBatch(se3.apply_interpolated(rel, tau_s, surfs.xyz),
                             surfs.mask)
        else:
            c_i, s_i = corners, surfs
        corr = associate(pose, c_i, s_i, corner_map, surf_map,
                         cmap_cfg, smap_cfg, cfg, knn_fn=knn_fn)
        # row selection happens through the correspondence validity masks
        # (normal_equations weights rows by corr.ok_*)
        corr_surf = corr._replace(ok_c=jnp.zeros_like(corr.ok_c))
        corr_corner = corr._replace(ok_s=jnp.zeros_like(corr.ok_s))

        def inner(_, carry2):
            pose, _ = carry2
            # step 1: surf rows only -> (roll, pitch, z)
            Hs, gs, (_, n_s, sq_s, nr_s) = normal_equations(pose, c_i, s_i, corr_surf, cfg)
            Hs, gs, n_s, sq_s, nr_s = (allsum(x) for x in (Hs, gs, n_s, sq_s, nr_s))
            d_s, degen_s = _solve_subset(Hs, gs, _SURF_IDX, cfg.degen_eig_thresh)
            pose = se3.boxplus(pose, d_s)
            # step 2: corner rows only -> (yaw, x, y)
            Hc, gc, (n_c, _, sq_c, nr_c) = normal_equations(pose, c_i, s_i, corr_corner, cfg)
            Hc, gc, n_c, sq_c, nr_c = (allsum(x) for x in (Hc, gc, n_c, sq_c, nr_c))
            d_c, degen_c = _solve_subset(Hc, gc, _CORNER_IDX, cfg.degen_eig_thresh)
            pose = se3.boxplus(pose, d_c)
            rms = jnp.sqrt((sq_s + sq_c) / jnp.maximum(nr_s + nr_c, 1.0))
            return pose, GnStats(n_c, n_s, rms, degen_s | degen_c)

        return jax.lax.fori_loop(0, cfg.n_inner, inner, carry)

    init = (pose0, GnStats(jnp.int32(0), jnp.int32(0), jnp.float32(0.0), jnp.bool_(False)))
    return jax.lax.fori_loop(0, cfg.n_outer, outer, init)
