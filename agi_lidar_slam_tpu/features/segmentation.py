"""Range-image ground removal and segment clustering (LeGO-LOAM layer L2).

Re-designs LeGO-LOAM's imageProjection node:
* ground removal: inter-ring pitch test <= 10 degrees on the low beams
  (groundRemoval, imageProjection.cpp:291-348);
* cluster segmentation: LeGO labels components with a per-pixel BFS using the
  angle criterion atan2(d2 sin a, d1 - d2 cos a) > 60 deg
  (labelComponents :429-538) and rejects clusters < 30 points unless they
  span >= 3 rings.

The BFS is inherently sequential; the TPU formulation is parallel
connected-components by iterated min-label propagation with pointer jumping
(label <- min(label, label[label])), which converges in O(log diameter)
rounds over the whole image at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..pointcloud.cloud import ScanGrid


class SegmentationConfig(NamedTuple):
    ground_rings: int = 7  # groundScanInd: only low beams can seed ground
    ground_angle_deg: float = 10.0  # sensorMountAngle tolerance
    cluster_angle_deg: float = 60.0  # segmentTheta
    min_cluster: int = 30  # feasibleSegment size threshold
    min_cluster_lines: int = 3  # or >=5 points spanning >=3 rings
    min_cluster_small: int = 5
    n_prop_rounds: int = 12  # label-propagation rounds (log2 diameter + slack)


class SegmentedScan(NamedTuple):
    ground: jnp.ndarray  # (R,W) bool
    segmented: jnp.ndarray  # (R,W) bool: member of a valid (big) cluster
    labels: jnp.ndarray  # (R,W) int32 cluster representative index


def ground_removal(scan: ScanGrid, cfg: SegmentationConfig) -> jnp.ndarray:
    """Ground mask: for the low rings, the vector to the next ring up is
    within ground_angle of horizontal (imageProjection.cpp:291-348)."""
    xyz, mask = scan.xyz, scan.mask
    up = jnp.roll(xyz, -1, axis=0)  # ring i+1, same column
    up_mask = jnp.roll(mask, -1, axis=0)
    d = up - xyz
    angle = jnp.degrees(
        jnp.arctan2(d[..., 2], jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2) + 1e-9)
    )
    pair_ok = mask & up_mask & (jnp.abs(angle) <= cfg.ground_angle_deg)
    rings = jnp.arange(scan.rings)[:, None]
    low = rings < cfg.ground_rings
    g = pair_ok & low
    # both endpoints of a qualifying pair are ground (the reference marks i and i+1)
    g = g | jnp.roll(g, 1, axis=0)
    return g & mask


def _connected(r_a: jnp.ndarray, r_b: jnp.ndarray, alpha: float, thresh_rad: float):
    """LeGO angle criterion between two neighboring range pixels."""
    d1 = jnp.maximum(r_a, r_b)
    d2 = jnp.minimum(r_a, r_b)
    beta = jnp.arctan2(d2 * jnp.sin(alpha), d1 - d2 * jnp.cos(alpha) + 1e-9)
    return beta > thresh_rad


def segment_clusters(scan: ScanGrid, ground: jnp.ndarray,
                     cfg: SegmentationConfig) -> SegmentedScan:
    R, W = scan.rings, scan.width
    r = jnp.linalg.norm(scan.xyz, axis=-1)
    valid = scan.mask & ~ground

    alpha_h = 2.0 * jnp.pi / W
    alpha_v = jnp.deg2rad(2.0)  # approx vertical resolution; criterion is robust to it
    th = jnp.deg2rad(cfg.cluster_angle_deg)

    # connectivity to the 4 neighbors (azimuth wraps, rings clamp)
    right = jnp.roll(r, -1, axis=1)
    right_ok = valid & jnp.roll(valid, -1, axis=1) & _connected(r, right, alpha_h, th)
    up = jnp.roll(r, -1, axis=0)
    up_ok = valid & jnp.roll(valid, -1, axis=0) & _connected(r, up, alpha_v, th)
    up_ok = up_ok.at[-1, :].set(False)  # no ring wraparound

    lin = jnp.arange(R * W, dtype=jnp.int32).reshape(R, W)
    labels = jnp.where(valid, lin, jnp.int32(R * W))  # invalid -> sentinel max

    def prop(_, labels):
        l_right = jnp.roll(labels, -1, axis=1)
        l_left = jnp.roll(labels, 1, axis=1)
        l_up = jnp.roll(labels, -1, axis=0)
        l_down = jnp.roll(labels, 1, axis=0)
        left_ok = jnp.roll(right_ok, 1, axis=1)  # symmetric edges
        down_ok = jnp.roll(up_ok, 1, axis=0)
        m = labels
        m = jnp.minimum(m, jnp.where(right_ok, l_right, m))
        m = jnp.minimum(m, jnp.where(left_ok, l_left, m))
        m = jnp.minimum(m, jnp.where(up_ok, l_up, m))
        m = jnp.minimum(m, jnp.where(down_ok, l_down, m))
        # pointer jumping: follow the representative's own label
        flat = m.reshape(-1)
        padded = jnp.concatenate([flat, jnp.asarray([R * W], jnp.int32)])
        m = jnp.minimum(m, padded[m])
        return jnp.where(valid, m, jnp.int32(R * W))

    labels = jax.lax.fori_loop(0, cfg.n_prop_rounds, prop, labels)

    # cluster statistics (sizes and ring spans) via segment reductions
    flat_labels = labels.reshape(-1)
    ones = valid.reshape(-1).astype(jnp.int32)
    sizes = jax.ops.segment_sum(ones, flat_labels, num_segments=R * W + 1)
    ring_id = jnp.broadcast_to(jnp.arange(R)[:, None], (R, W)).reshape(-1)
    rmin = jax.ops.segment_min(jnp.where(ones > 0, ring_id, R), flat_labels,
                               num_segments=R * W + 1)
    rmax = jax.ops.segment_max(jnp.where(ones > 0, ring_id, -1), flat_labels,
                               num_segments=R * W + 1)
    span = rmax - rmin + 1
    big = sizes >= cfg.min_cluster
    tall = (sizes >= cfg.min_cluster_small) & (span >= cfg.min_cluster_lines)
    good = big | tall
    segmented = valid & good[flat_labels].reshape(R, W)
    return SegmentedScan(ground, segmented, labels)


def segment_scan(scan: ScanGrid, cfg: SegmentationConfig = SegmentationConfig()):
    g = ground_removal(scan, cfg)
    return segment_clusters(scan, g, cfg)
