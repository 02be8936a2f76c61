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
    sentinel key.

    Per-voxel sums use NO scatter: after the key sort, segments are
    contiguous runs, so segment sums are differences of an inclusive prefix
    sum taken at run ends — and the run ends of the first `capacity`
    segments, in order, are exactly the sorted positions of all run-end
    indices (one small int sort). A 115k-row scatter-add (segment_sum)
    costs ~1 ms on TPU; the cumsum + diff formulation measures ~4x cheaper
    (profiled: the two scatter-adds were ~1.9 ms of the 9.3 ms HDL-64 scan
    program)."""
    N = xyz.shape[0]
    key = voxel_keys(xyz, mask, voxel_size)
    ops = (key, xyz[..., 0], xyz[..., 1], xyz[..., 2])
    if aux is not None:
        ops = ops + (aux,)
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    key_s, x_s, y_s, z_s = sorted_ops[:4]
    mask_s = key_s != _INVALID_KEY

    # f32 prefix sums over 115k raw coordinates would lose ~0.25 m at the
    # tail (eps at |prefix| ~ 2e6); accumulate residuals from each point's
    # voxel CENTER instead (|residual| <= leaf/2, prefix stays small) and
    # add the exactly-reconstructable center back at the end.
    def _centers(k):
        safe = jnp.where(k == _INVALID_KEY, 0, k)
        vc = jnp.stack([(safe >> 20) & 0x3FF, (safe >> 10) & 0x3FF, safe & 0x3FF],
                       axis=-1)
        return (vc.astype(jnp.float32) - _HALF_GRID + 0.5) * voxel_size

    ctr = _centers(key_s)
    lanes = [x_s - ctr[:, 0], y_s - ctr[:, 1], z_s - ctr[:, 2],
             mask_s.astype(jnp.float32)]
    if aux is not None:
        lanes.append(sorted_ops[4])
    vals = jnp.stack(lanes, axis=-1)  # (N, 4|5)
    csum = jnp.cumsum(jnp.where(mask_s[:, None], vals, 0.0), axis=0)

    # run ends: last element of each key run (valid keys only)
    is_end = mask_s & jnp.concatenate(
        [key_s[:-1] != key_s[1:], jnp.ones((1,), bool)]
    )
    # positions of the first `capacity` run ends, ascending; N = "no segment"
    endpos = jnp.where(is_end, jnp.arange(N, dtype=jnp.int32), N)
    ends = jax.lax.sort(endpos)[:capacity]  # (capacity,)
    have = ends < N
    ends_c = jnp.minimum(ends, N - 1)
    totals = csum[ends_c]  # (capacity, L) inclusive prefix at run end
    prev = jnp.concatenate([jnp.zeros((1, vals.shape[1])), totals[:-1]], axis=0)
    sums = jnp.where(have[:, None], totals - prev, 0.0)

    cnts = sums[:, 3]
    denom = jnp.maximum(cnts, 1.0)
    out = _centers(key_s[ends_c]) + sums[:, :3] / denom[:, None]
    out = jnp.where(have[:, None], out, 0.0)
    aux_mean = sums[:, 4] / denom if aux is not None else None
    return PointBatch(out, cnts > 0.5), aux_mean
