"""Voxel-grid downsampling as a sort + segment-reduce.

TPU-native replacement for pcl::VoxelGrid (used throughout the reference:
A-LOAM scanRegistration.cpp:421-427 downSizeFilter, laserMapping per-cube
filters :876-893, LIO-SAM downsampleCurrentScan, S-FAST_LIO laserMapping
:737-738). Produces the centroid of each occupied voxel, like PCL.

Everything is fixed-shape: output capacity is a static argument; overflow
voxels are dropped (mirroring the reference's own lossy real-time behavior).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cloud import PointBatch

# Coordinates are clipped to a 1024^3 voxel lattice centered at the origin so a
# voxel key packs into one int32 (10 bits/axis). With >=0.2 m voxels this spans
# >=102 m in every direction — beyond every range gate in the reference.
_HALF_GRID = 512
_INVALID_KEY = jnp.int32(2**31 - 1)


def voxel_keys(xyz: jnp.ndarray, mask: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """Packed int32 voxel id per point; invalid points get a sort-last sentinel."""
    vc = jnp.clip(
        jnp.floor(xyz / voxel_size).astype(jnp.int32) + _HALF_GRID, 0, 2 * _HALF_GRID - 1
    )
    key = (vc[..., 0] << 20) | (vc[..., 1] << 10) | vc[..., 2]
    return jnp.where(mask, key, _INVALID_KEY)


def voxel_downsample(
    xyz: jnp.ndarray, mask: jnp.ndarray, voxel_size: float, capacity: int
) -> PointBatch:
    """Centroid-per-voxel downsample of a padded point set. (N,3),(N) -> (capacity,3)."""
    out, _ = voxel_downsample_aux(xyz, mask, voxel_size, capacity, aux=None)
    return out


def voxel_downsample_aux(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    voxel_size: float,
    capacity: int,
    aux: jnp.ndarray | None = None,
) -> tuple[PointBatch, jnp.ndarray | None]:
    """Centroid downsample that also carries an auxiliary per-point scalar
    (e.g. the in-sweep time fraction) through the reduction as a mean.

    This mirrors pcl::VoxelGrid exactly: PCL centroids average *all* fields,
    including the intensity channel the reference encodes point time into
    (A-LOAM scanRegistration.cpp:421-427 downSizeFilter on less-flat, then
    laserOdometry TransformToStart :124-145 reads the averaged time back).

    The coordinates ride the key sort as extra sort operands (one multi-operand
    lax.sort) instead of being gathered by argsort order afterwards — on TPU
    the 115k-row payload gather costs more than carrying the extra f32 lanes
    through the sort network (measured 3.8 -> 2.2 ms at HDL-64 scale).
    Validity needs no separate operand: invalid points carry the sort-last
    sentinel key."""
    key = voxel_keys(xyz, mask, voxel_size)
    ops = (key, xyz[..., 0], xyz[..., 1], xyz[..., 2])
    if aux is not None:
        ops = ops + (aux,)
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    key_s, x_s, y_s, z_s = sorted_ops[:4]
    mask_s = key_s != _INVALID_KEY
    xyz_s = jnp.stack([x_s, y_s, z_s], axis=-1)
    start = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), key_s[1:] != key_s[:-1]]
    )
    seg = jnp.cumsum(start.astype(jnp.int32)) - 1
    seg = jnp.where(mask_s, seg, capacity)  # out-of-range segments are dropped
    sums = jax.ops.segment_sum(
        jnp.where(mask_s[:, None], xyz_s, 0.0), seg, num_segments=capacity
    )
    cnts = jax.ops.segment_sum(mask_s.astype(jnp.float32), seg, num_segments=capacity)
    denom = jnp.maximum(cnts, 1.0)
    out = sums / denom[:, None]
    aux_mean = None
    if aux is not None:
        aux_sums = jax.ops.segment_sum(
            jnp.where(mask_s, sorted_ops[4], 0.0), seg, num_segments=capacity
        )
        aux_mean = aux_sums / denom
    return PointBatch(out, cnts > 0.5), aux_mean
