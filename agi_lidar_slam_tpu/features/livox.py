"""LIO-Livox 3-class feature extraction: corner / surf / non-feature.

Re-designs LidarFeatureExtractor (LIO-Livox LidarFeatureExtractor.h:13-135,
1.5k LoC): small-FOV Livox patterns get
* distance-adaptive curvature thresholds (DistanceFaraway: a fixed angular
  window subtends more metres at range, so raw curvature grows ~r^2 — the
  thresholds scale accordingly),
* break-corner detection (depth discontinuities whose NEAR side is a real
  physical edge — unlike the far-side silhouette points the occlusion mask
  rejects),
* a third "non-feature" class: everything valid that is neither corner nor
  planar, kept (downsampled) as weak point-to-plane constraints
  (Cost_NonFeature_ICP, ceresfunc.h:624).

Labels in the reference travel in normal_z (1=corner, 2=surf, 3=non);
here they are three PointBatches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..pointcloud.cloud import PointBatch, ScanGrid
from ..pointcloud.voxel import voxel_downsample
from .curvature import occlusion_mask


class LivoxFeatureConfig(NamedTuple):
    curvature_window: int = 2  # NumCurvSize
    n_sectors: int = 24  # PartNum is 150 over ~70 deg; 24 per ring-revolution
    corners_per_sector: int = 6
    corner_thresh: float = 0.02  # at reference range (10 m)
    surf_thresh: float = 0.01
    faraway: float = 30.0  # DistanceFaraway: thresholds scale above this
    nms_window: int = 3
    break_gap: float = 1.0  # depth step (m) marking a break corner
    max_corners: int = 1024
    max_surfs: int = 4096
    max_others: int = 2048
    other_voxel: float = 1.0
    surf_voxel: float = 0.4
    min_range: float = 0.5
    max_range: float = 150.0


class LivoxFeatures(NamedTuple):
    corners: PointBatch
    surfs: PointBatch
    others: PointBatch  # non-feature class (weak constraints)


def extract_livox_features(scan: ScanGrid, cfg: LivoxFeatureConfig) -> LivoxFeatures:
    R, W = scan.rings, scan.width
    xyz, mask = scan.xyz, scan.mask
    r = jnp.linalg.norm(xyz, axis=-1)
    valid = mask & (r > cfg.min_range) & (r < cfg.max_range)

    # curvature over a +-w window along the line axis
    w = cfg.curvature_window
    acc = -2.0 * w * xyz
    all_valid = valid
    for j in range(1, w + 1):
        for s in (j, -j):
            acc = acc + jnp.roll(xyz, s, axis=1)
            all_valid = all_valid & jnp.roll(valid, s, axis=1)
    c = jnp.where(all_valid, jnp.sum(acc * acc, axis=-1), 0.0)

    # distance-adaptive thresholds: scale ~ (r / faraway)^2 beyond faraway
    scale = jnp.maximum(1.0, (r / cfg.faraway) ** 2)
    c_thr = cfg.corner_thresh * scale
    s_thr = cfg.surf_thresh * scale

    occl = occlusion_mask(scan, _OcclProxy(cfg))
    pickable = all_valid & ~occl

    # break corners: a depth step whose NEAR side is a physical edge — the
    # nearer endpoint of a large gap is kept as a corner candidate
    gap_r = jnp.roll(r, -1, axis=1) - r
    gap_ok = valid & jnp.roll(valid, -1, axis=1)
    break_here = gap_ok & (gap_r > cfg.break_gap)  # this point is the near side
    break_next = gap_ok & (gap_r < -cfg.break_gap)  # next point is the near side
    break_corner = (break_here | jnp.roll(break_next, 1, axis=1)) & valid

    # corner pick: local max of curvature above the adaptive threshold
    cmax = c
    for j in range(1, cfg.nms_window + 1):
        cmax = jnp.maximum(cmax, jnp.maximum(jnp.roll(c, j, axis=1), jnp.roll(c, -j, axis=1)))
    corner_cand = (pickable & (c > c_thr) & (c >= cmax)) | (break_corner & pickable)

    S = cfg.n_sectors
    Ws = W // S
    k = cfg.corners_per_sector
    score = jnp.where(corner_cand, c + 1e-3, -1.0)[:, : S * Ws].reshape(R, S, Ws)
    top, idx = jax.lax.top_k(score, k)
    col = idx + (jnp.arange(S, dtype=jnp.int32) * Ws)[None, :, None]
    corner_xyz = jnp.take_along_axis(xyz, col.reshape(R, S * k)[..., None], axis=1
                                     ).reshape(-1, 3)
    corner_mask = (top > 0.0).reshape(-1)
    corners = voxel_downsample(corner_xyz, corner_mask, 0.2, cfg.max_corners)

    picked = jnp.zeros((R, W), dtype=bool).at[
        jnp.repeat(jnp.arange(R, dtype=jnp.int32), S * k), col.reshape(-1)
    ].set(corner_mask)

    surf_cand = pickable & (c < s_thr) & ~picked
    surfs = voxel_downsample(xyz.reshape(-1, 3), surf_cand.reshape(-1),
                             cfg.surf_voxel, cfg.max_surfs)

    other_cand = valid & ~surf_cand & ~picked
    others = voxel_downsample(xyz.reshape(-1, 3), other_cand.reshape(-1),
                              cfg.other_voxel, cfg.max_others)
    return LivoxFeatures(corners, surfs, others)


class _OcclProxy:
    """Adapter giving occlusion_mask the two fields it reads."""

    def __init__(self, cfg: LivoxFeatureConfig):
        self.min_range = cfg.min_range
        self.max_range = cfg.max_range
