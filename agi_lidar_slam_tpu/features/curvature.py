"""Curvature-based edge/planar feature extraction (A-LOAM / LIO-SAM family).

Reference behavior being reproduced (not ported):
* 11-point curvature  c = || sum_{j=-5..5, j!=0} (p_j - p_0) ||^2 computed per
  ring (A-LOAM scanRegistration.cpp:254-278; LIO-SAM featureExtraction.cpp:
  108-131 uses range differences — same construct).
* each ring is split into 6 sectors; per sector the top corners by curvature
  above a threshold are picked with +-5-point non-max suppression
  (scanRegistration.cpp:289-432 pick loops).
* remaining low-curvature points form the planar ("less flat") cloud, voxel
  downsampled (scanRegistration.cpp:421-427).

TPU-native formulation: curvature via rolled sums along the ring axis (the
azimuth axis wraps, which is correct for 360-degree sweeps), sequential NMS
replaced by a local-max mask + per-sector top-k — branch-free and fully
parallel over (ring, sector).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import FeatureConfig
from ..pointcloud.cloud import PointBatch, ScanGrid
from ..pointcloud.voxel import voxel_downsample_aux


class ScanFeatures(NamedTuple):
    corners: PointBatch  # edge features (capacity R * n_sectors * corners_per_sector)
    surfs: PointBatch  # planar features (capacity cfg.max_surfs)


class TimedFeatures(NamedTuple):
    """Features plus their in-sweep time fractions (for post-extraction
    deskew, the reference's TransformToStart-per-feature-point pattern).

    Two-tier structure (A-LOAM scanRegistration.cpp:289-432): `corners`/`surfs`
    are the DENSE tiers (less-sharp / less-flat) that feed map inserts and
    serve as association targets; `sharp`/`flat` are the small per-sector
    query tiers (2 sharpest / 4 flattest) the scan-to-scan odometry stage
    matches against the previous scan's dense tiers (laserOdometry.cpp:341-573
    matches cornerPointsSharp -> laserCloudCornerLast)."""

    corners: PointBatch
    corner_tau: jnp.ndarray  # (Nc,) in [0,1)
    surfs: PointBatch
    surf_tau: jnp.ndarray  # (Ns,) voxel-mean time (PCL centroids average time)
    sharp: PointBatch  # (R * n_sectors * sharp_per_sector,)
    sharp_tau: jnp.ndarray
    flat: PointBatch  # (R * n_sectors * flat_per_sector,)
    flat_tau: jnp.ndarray


def curvature(scan: ScanGrid, cfg: FeatureConfig):
    """Per-point curvature and candidate validity. Returns (c (R,W), valid (R,W)).

    The +-w windowed sum is computed with one wrapped cumulative sum and two
    shifted slices instead of 2w rolls (the azimuth axis wraps, correct for
    360-degree sweeps)."""
    xyz, mask = scan.xyz, scan.mask
    r = jnp.linalg.norm(xyz, axis=-1)
    valid = mask & (r > cfg.min_range) & (r < cfg.max_range)
    w = cfg.curvature_window
    W = xyz.shape[1]
    # wrap-pad by w on both sides, prefix-sum, then window = S[i+2w] - S[i-1]
    ext = jnp.concatenate([xyz[:, W - w:], xyz, xyz[:, :w]], axis=1)
    vext = jnp.concatenate([valid[:, W - w:], valid, valid[:, :w]], axis=1)
    S = jnp.cumsum(ext, axis=1)
    Sv = jnp.cumsum(vext.astype(jnp.int32), axis=1)
    zero3 = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
    zero1 = jnp.zeros((xyz.shape[0], 1), jnp.int32)
    S = jnp.concatenate([zero3, S], axis=1)  # S[k] = sum of first k
    Sv = jnp.concatenate([zero1, Sv], axis=1)
    win_sum = S[:, 2 * w + 1:] - S[:, : W]  # (R,W,3): sum over the 2w+1 window
    win_cnt = Sv[:, 2 * w + 1:] - Sv[:, : W]
    acc = win_sum - (2.0 * w + 1.0) * xyz
    all_valid = valid & (win_cnt == 2 * w + 1)
    c = jnp.sum(acc * acc, axis=-1)
    return jnp.where(all_valid, c, 0.0), all_valid


def occlusion_mask(scan: ScanGrid, cfg: FeatureConfig) -> jnp.ndarray:
    """True where a point must NOT be picked as a feature.

    Reproduces LIO-SAM featureExtraction.cpp:137-177 markOccludedPoints:
    * occlusion: across a depth gap > 0.3 m between azimuth neighbors, the 6
      points on the FAR side of the gap are silhouette artifacts (their edge
      moves with viewpoint) and are excluded;
    * parallel beam: points whose range jumps on both sides (> 2% of range)
      lie on surfaces nearly parallel to the beam and are unstable.
    """
    r = jnp.linalg.norm(scan.xyz, axis=-1)
    valid = scan.mask
    gap = jnp.roll(r, -1, axis=1) - r  # range step from col i to i+1
    gap_valid = valid & jnp.roll(valid, -1, axis=1)
    far_here = gap_valid & (gap < -0.3)  # i is far side, i+1 near: mark i-5..i
    far_next = gap_valid & (gap > 0.3)  # i+1 far side: mark i+1..i+6
    marked = jnp.zeros_like(valid)
    for j in range(6):
        # trigger at i marks i-j (the far side BEHIND the gap): marked[m] |=
        # far_here[m+j], i.e. a backward shift
        marked = marked | jnp.roll(far_here, -j, axis=1)
        marked = marked | jnp.roll(far_next, j + 1, axis=1)  # marks i+1..i+6
    diff1 = jnp.abs(jnp.roll(r, 1, axis=1) - r)
    diff2 = jnp.abs(jnp.roll(r, -1, axis=1) - r)
    parallel = (diff1 > 0.02 * r) & (diff2 > 0.02 * r)
    return marked | parallel


def extract_features(scan: ScanGrid, cfg: FeatureConfig) -> ScanFeatures:
    t = extract_features_timed(scan, cfg)
    return ScanFeatures(t.corners, t.surfs)


def extract_features_timed(scan: ScanGrid, cfg: FeatureConfig) -> TimedFeatures:
    R, W = scan.rings, scan.width
    S = cfg.n_sectors
    Ws = W // S
    k = cfg.corners_per_sector

    c, valid = curvature(scan, cfg)
    valid = valid & ~occlusion_mask(scan, cfg)

    if cfg.segmentation:
        # LeGO-LOAM mode: corners only from valid (big) clusters; planar
        # candidates from ground + clusters (featureAssociation consumes the
        # segmented cloud + ground flags from imageProjection)
        from .segmentation import segment_scan

        seg = segment_scan(scan)
        corner_allowed = seg.segmented & ~seg.ground
        surf_allowed = seg.segmented | seg.ground
    else:
        corner_allowed = jnp.ones_like(valid)
        surf_allowed = jnp.ones_like(valid)

    # --- corners: local-max over +-nms_window, then per-sector top-k ---------
    cmax = c
    for j in range(1, cfg.nms_window + 1):
        cmax = jnp.maximum(cmax, jnp.maximum(jnp.roll(c, j, axis=1), jnp.roll(c, -j, axis=1)))
    corner_cand = valid & corner_allowed & (c > cfg.corner_thresh) & (c >= cmax)

    score = jnp.where(corner_cand, c, -1.0)[:, : S * Ws].reshape(R, S, Ws)
    top, idx = jax.lax.top_k(score, k)  # (R,S,k)
    col = idx + (jnp.arange(S, dtype=jnp.int32) * Ws)[None, :, None]
    corner_xyz = jnp.take_along_axis(
        scan.xyz, col.reshape(R, S * k)[..., None], axis=1
    ).reshape(-1, 3)
    corner_tau = jnp.take_along_axis(
        scan.time, col.reshape(R, S * k), axis=1
    ).reshape(-1)
    corner_mask = (top > 0.0).reshape(-1)
    picked = jnp.zeros((R, W), dtype=bool).at[
        jnp.repeat(jnp.arange(R, dtype=jnp.int32), S * k), col.reshape(-1)
    ].set(corner_mask)

    # --- sharp tier: the sharpest sharp_per_sector of each sector's picks ----
    # top_k returns scores in descending order, so the first columns ARE the
    # per-sector sharpest (scanRegistration.cpp:295-317 picks 2 before the 20)
    ks = min(cfg.sharp_per_sector, k)
    col_s = col[:, :, :ks].reshape(R, S * ks)
    sharp_xyz = jnp.take_along_axis(scan.xyz, col_s[..., None], axis=1).reshape(-1, 3)
    sharp_tau = jnp.take_along_axis(scan.time, col_s, axis=1).reshape(-1)
    sharp_mask = (top[:, :, :ks] > 0.0).reshape(-1)

    # --- surfs: low-curvature, not corner-picked, voxel downsampled ----------
    surf_cand = valid & surf_allowed & (c < cfg.surf_thresh) & ~picked
    surfs, surf_tau = voxel_downsample_aux(
        scan.xyz.reshape(-1, 3), surf_cand.reshape(-1), cfg.surf_voxel,
        cfg.max_surfs, aux=scan.time.reshape(-1),
    )

    # --- flat tier: flat_per_sector LOWEST-curvature candidates per sector ---
    # (scanRegistration.cpp:389-419 picks 4 flat before the less-flat rest)
    kf = cfg.flat_per_sector
    score_f = jnp.where(surf_cand, -c, -jnp.inf)[:, : S * Ws].reshape(R, S, Ws)
    top_f, idx_f = jax.lax.top_k(score_f, kf)  # (R,S,kf): least curvature first
    col_f = (idx_f + (jnp.arange(S, dtype=jnp.int32) * Ws)[None, :, None]
             ).reshape(R, S * kf)
    flat_xyz = jnp.take_along_axis(scan.xyz, col_f[..., None], axis=1).reshape(-1, 3)
    flat_tau = jnp.take_along_axis(scan.time, col_f, axis=1).reshape(-1)
    flat_mask = jnp.isfinite(top_f).reshape(-1)

    return TimedFeatures(PointBatch(corner_xyz, corner_mask), corner_tau,
                         surfs, surf_tau,
                         PointBatch(sharp_xyz, sharp_mask), sharp_tau,
                         PointBatch(flat_xyz, flat_mask), flat_tau)
