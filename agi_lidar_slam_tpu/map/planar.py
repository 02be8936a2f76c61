"""Planar (kernel-friendly) view of the hashed voxel-block map.

The association hot path (nn/vmem_knn.py) keeps the WHOLE map table resident
in VMEM and probes it with on-chip reads — the TPU-native answer to the
reference's per-point kd-tree descents (S-FAST_LIO ikd_Tree.cpp:370 /
A-LOAM laserMapping.cpp:645). That requires a lane-aligned, single-array
layout instead of HashVoxelMap's (rows, B, 3) + (rows, B) pair:

    row r (one voxel block), lanes (PW = B padded up to a multiple of 8, so
    every coordinate-plane slice in the kernel is lane-aligned):
      [0,    0+B)    X coordinates of the B sub-voxel points
      [PW,   PW+B)   Y
      [2PW,  2PW+B)  Z
      [3PW,  3PW+3)  block coordinate key, int32 bitcast to f32
      pad lanes ([B, PW) of each plane and [3PW+3, L)) hold the poison
      coordinate, so they fall out of the distance gate like empty sub-voxels

Empty sub-voxels hold the poison coordinate -1e9 so their squared distance
to any real query is ~1e18 — masking by distance instead of by an occupancy
plane saves a third of the in-kernel work. Queries are poisoned at +1e9 by
the caller, so (invalid query, empty slot) pairs still produce huge
distances instead of an accidental zero.

Building the view is pure elementwise/concat work (no gathers): ~tens of µs
for the production table sizes, done once per scan and reused by every
association pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from .hash_map import EMPTY_KEY, HashVoxelMap, pack_key

POISON_POINT = -1.0e9  # empty sub-voxel coordinate
POISON_QUERY = 1.0e9  # invalid-query coordinate (callers)
# any candidate with sq_dist above this is a poison pairing, not geometry
VALID_SQ_LIMIT = 1.0e17


def plane_width(cfg: MapConfig) -> int:
    """Per-coordinate plane width: the bucket padded to a multiple of 8 so
    kernel lane slices at {0, PW, 2PW} stay aligned."""
    return ((cfg.bucket + 7) // 8) * 8


def planar_lanes(cfg: MapConfig) -> int:
    """Lane width of one planar row: 3 coordinate planes + 3 key lanes,
    padded to the f32 lane tile (128)."""
    need = 3 * plane_width(cfg) + 3
    return max(128, ((need + 127) // 128) * 128)


class PlanarTab(NamedTuple):
    """The VMEM point-plane table + the SMEM packed-key row index.

    `tab` (rows, L) f32 is the kernel-resident candidate store; `ktab`
    (rows,) int32 holds each row's pack_key (-1 where the row is empty) so
    the kernel's scalar core can resolve a probe window to the ONE matching
    row before copying anything (nn/vmem_knn.py)."""

    tab: jnp.ndarray
    ktab: jnp.ndarray


def build_planar(m: HashVoxelMap, cfg: MapConfig) -> PlanarTab:
    """HashVoxelMap -> PlanarTab (see module docstring)."""
    B = m.bucket
    PW = plane_width(cfg)
    L = planar_lanes(cfg)
    ppad = jnp.full((m.n_rows, PW - B), POISON_POINT, jnp.float32)
    coords = []
    for i in range(3):
        coords.append(jnp.where(m.occ, m.points[:, :, i], POISON_POINT))
        if PW > B:
            coords.append(ppad)
    keys_f = jax.lax.bitcast_convert_type(m.keys, jnp.float32)  # (rows, 3)
    tail = jnp.full((m.n_rows, L - 3 * PW - 3), POISON_POINT, jnp.float32)
    tab = jnp.concatenate(coords + [keys_f, tail], axis=1)
    live = m.keys[:, 0] != EMPTY_KEY
    ktab = jnp.where(live, pack_key(m.keys), jnp.int32(-1))
    return PlanarTab(tab, ktab)
