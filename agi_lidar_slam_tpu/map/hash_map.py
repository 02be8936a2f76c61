"""Hashed voxel-block map — the TPU-native replacement for every spatial index
in the reference:

* S-FAST_LIO's ikd-Tree (ikd_Tree.h:45-299, 1.9k LoC incremental kd-tree with a
  rebuild thread),
* A-LOAM / livox_mapping's 21x21x11 cube-of-clouds with per-frame kd-tree
  rebuilds (laserMapping.cpp:72-113, 617-618),
* LIO-Livox's cube map with a kd-tree per cube (Map_Manager.h:103-146).

Design (SURVEY.md section 7.1 item 4): an open-addressing hash table of voxel
*blocks*. Each block is a `block_sub`^3 lattice of sub-voxels holding at most
one point each — this reproduces ikd-Tree's downsample-on-insert semantics
(one representative point per `filter_size_map` cell) with O(1) insert and no
tree, no rebuild thread, no locks. K-nearest-neighbor queries gather the
neighboring blocks and take a top-k — contiguous block rows make the gather
HBM-friendly.

Performance-critical layout choices (measured on TPU v5e):
* probe chains are CONTIGUOUS: the table has `probes` overflow rows past the
  hashed range instead of wrapping mod C, so a whole chain loads as one
  (probes, 3) window gather (vmapped dynamic_slice) instead of `probes`
  scattered row gathers;
* lookups scan the whole window for a key match rather than early-terminating
  at the first empty slot, so box-deletion can clear keys without tombstones.

All operations are pure functions on fixed-shape arrays and fully batched, so
they jit, vmap, and shard (block slots can be sharded across devices by slot
range).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import MapConfig

EMPTY_KEY = jnp.int32(-(2**31) + 1)  # sentinel block coordinate (all three axes)


class HashVoxelMap(NamedTuple):
    """keys: (C + probes + 1, 3) int32 block coords (last row is scatter dump).
    points: (C + probes + 1, B, 3) f32 one point per sub-voxel slot.
    occ: (C + probes + 1, B) bool sub-voxel occupancy.

    Hashes land in [0, C); probe chains extend to [h, h+probes) without
    wrap; row C+probes is write-trash for masked scatters.
    """

    keys: jnp.ndarray
    points: jnp.ndarray
    occ: jnp.ndarray

    @property
    def n_rows(self) -> int:
        return self.keys.shape[0]

    @property
    def bucket(self) -> int:
        return self.points.shape[1]

    def num_points(self) -> jnp.ndarray:
        return jnp.sum(self.occ[:-1].astype(jnp.int32))

    def num_blocks(self) -> jnp.ndarray:
        return jnp.sum((self.keys[:-1, 0] != EMPTY_KEY).astype(jnp.int32))


def empty_map(cfg: MapConfig) -> HashVoxelMap:
    # rows = hashed range + probe overflow + dump, rounded up to a multiple of
    # 256 so the slot axis shards evenly over any reasonable device mesh
    # (parallel/map_shard.py); rows between slots+probes and the final dump
    # row are simply never probed
    rows = ((cfg.slots + cfg.probes + 1 + 255) // 256) * 256
    B = cfg.bucket
    return HashVoxelMap(
        keys=jnp.full((rows, 3), EMPTY_KEY, dtype=jnp.int32),
        points=jnp.zeros((rows, B, 3), dtype=jnp.float32),
        occ=jnp.zeros((rows, B), dtype=bool),
    )


def _hash(bc: jnp.ndarray, log2_slots: int) -> jnp.ndarray:
    """Spatial hash of integer block coords (...,3) -> slot in [0, 2**log2_slots).
    Classic large-prime XOR hash; int32 wraparound is deterministic on XLA."""
    h = (
        bc[..., 0] * jnp.int32(73856093)
        ^ bc[..., 1] * jnp.int32(19349663)
        ^ bc[..., 2] * jnp.int32(83492791)
    )
    return (h & jnp.int32(0x7FFFFFFF)) & jnp.int32((1 << log2_slots) - 1)


def probe_base(bc: jnp.ndarray, cfg: MapConfig) -> jnp.ndarray:
    """Start row of a block's probe window.

    When `probes` is a power of two the base is aligned to the probe length,
    making the table set-associative (disjoint groups of `probes` slots).
    Alignment lets the Pallas association kernel (nn/vmem_knn.py) read a
    whole window as one aligned (probes, L) vector load — Mosaic requires
    dynamic sublane offsets to be provably 8-aligned. Non-power-of-two probe
    lengths keep the original sliding-window behavior (XLA paths only)."""
    h = _hash(bc, cfg.log2_slots)
    if cfg.probes & (cfg.probes - 1) == 0:
        return h & jnp.int32(~(cfg.probes - 1))
    return h


def block_coords(xyz: jnp.ndarray, cfg: MapConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Points (...,3) -> (block coord (...,3) int32, sub-voxel id (...,) int32)."""
    sv = jnp.floor(xyz / cfg.sub_voxel).astype(jnp.int32)
    bc = sv // cfg.block_sub  # floor division (numpy semantics)
    local = sv - bc * cfg.block_sub
    sub_id = (local[..., 0] * cfg.block_sub + local[..., 1]) * cfg.block_sub + local[..., 2]
    return bc, sub_id


def _key_windows(keys: jnp.ndarray, h: jnp.ndarray, cfg: MapConfig) -> jnp.ndarray:
    """Gather the (probes, 3) probe window for each hash. h (N,) -> (N, P, 3).

    Implemented as one advanced-index gather with an (N, P) index matrix: XLA
    lowers this to a single native gather. (A vmapped dynamic_slice looks
    equivalent but lowers to an N-iteration while loop — 3 orders of magnitude
    slower on TPU.)"""
    idx = h[:, None] + jnp.arange(cfg.probes, dtype=jnp.int32)[None, :]
    return keys[idx]


def lookup(keys: jnp.ndarray, bc: jnp.ndarray, cfg: MapConfig) -> jnp.ndarray:
    """Slot of each queried block coord, or -1 if absent. bc (...,3) any batch shape."""
    shape = bc.shape[:-1]
    bc_flat = bc.reshape(-1, 3)
    h = probe_base(bc_flat, cfg)
    win = _key_windows(keys, h, cfg)  # (N,P,3)
    match = jnp.all(win == bc_flat[:, None, :], axis=-1)  # (N,P)
    p_idx = jnp.argmax(match, axis=-1)  # first match
    found = jnp.any(match, axis=-1)
    slot = jnp.where(found, h + p_idx, -1)
    return slot.reshape(shape)


def _first_empty(keys: jnp.ndarray, bc: jnp.ndarray, cfg: MapConfig) -> jnp.ndarray:
    """First empty probe slot for each block coord, or -1 if the chain is full."""
    bc_flat = bc.reshape(-1, 3)
    h = probe_base(bc_flat, cfg)
    win = _key_windows(keys, h, cfg)
    is_empty = win[..., 0] == EMPTY_KEY  # (N,P)
    p_idx = jnp.argmax(is_empty, axis=-1)
    found = jnp.any(is_empty, axis=-1)
    return jnp.where(found, h + p_idx, -1).reshape(bc.shape[:-1])


def insert_with_stats(m: HashVoxelMap, xyz: jnp.ndarray, mask: jnp.ndarray,
                      cfg: MapConfig) -> Tuple[HashVoxelMap, jnp.ndarray]:
    """Insert a padded point batch (N,3)+(N,) into the map (pure; returns
    (new map, n_dropped)).

    Existing sub-voxel occupants win (first-point-kept downsample, matching
    ikd-Tree's on-insert filtering). New blocks claim hash slots over
    `claim_rounds` conflict-resolution rounds: concurrent claimers of the same
    empty slot are serialized by a scatter-min of point index; losers retry on
    the next round against the updated table. Points whose probe chain is full
    are dropped (bounded lossiness, mirroring the reference's queue drains) —
    `n_dropped` counts them so pipelines can surface silent geometry loss in
    their metrics (a saturating table shows up as a rising drop count).
    """
    N = xyz.shape[0]
    B = m.bucket
    dump = m.n_rows - 1
    bc, sub_id = block_coords(xyz, cfg)
    pt_idx = jnp.arange(N, dtype=jnp.int32)

    def claim_round(carry):
        keys, _, rnd = carry
        slot = lookup(keys, bc, cfg)
        need = mask & (slot < 0)
        cand = _first_empty(keys, bc, cfg)
        attempt = need & (cand >= 0)
        cand_safe = jnp.where(attempt, cand, dump)
        claim = jnp.full((m.n_rows,), N, dtype=jnp.int32).at[cand_safe].min(
            jnp.where(attempt, pt_idx, N)
        )
        winner = attempt & (claim[cand_safe] == pt_idx)
        keys = keys.at[jnp.where(winner, cand, dump)].set(
            jnp.where(winner[:, None], bc, keys[dump])
        )
        # losers (attempted, lost the scatter-min) retry next round
        unresolved = jnp.any(attempt & ~winner)
        return keys, unresolved, rnd + 1

    # steady-state scans insert into mostly-existing blocks: exit as soon as a
    # round resolves every pending claim instead of always paying claim_rounds
    keys, _, _ = jax.lax.while_loop(
        lambda c: c[1] & (c[2] < cfg.claim_rounds),
        claim_round,
        claim_round((m.keys, jnp.bool_(True), jnp.int32(0))),
    )

    slot = lookup(keys, bc, cfg)
    placed = mask & (slot >= 0)
    n_dropped = jnp.sum((mask & (slot < 0)).astype(jnp.int32))
    flat = jnp.where(placed, slot * B + sub_id, dump * B)
    # first-wins within a pre-existing map; among same-batch duplicates the
    # lowest point index wins (scatter-min), keeping insertion deterministic.
    occupied_before = m.occ.reshape(-1)[flat]
    writeable = placed & ~occupied_before
    flat_w = jnp.where(writeable, flat, dump * B)
    owner = jnp.full(m.n_rows * B, N, dtype=jnp.int32).at[flat_w].min(
        jnp.where(writeable, pt_idx, N)
    )
    is_owner = writeable & (owner[flat_w] == pt_idx)
    flat_final = jnp.where(is_owner, flat, dump * B)
    points = m.points.reshape(-1, 3).at[flat_final].set(
        jnp.where(is_owner[:, None], xyz, 0.0)
    )
    occ = m.occ.reshape(-1).at[flat_final].set(is_owner | m.occ.reshape(-1)[flat_final])
    new_m = HashVoxelMap(keys, points.reshape(m.n_rows, B, 3), occ.reshape(m.n_rows, B))
    return new_m, n_dropped


def insert(m: HashVoxelMap, xyz: jnp.ndarray, mask: jnp.ndarray, cfg: MapConfig) -> HashVoxelMap:
    """`insert_with_stats` without the drop count (see its docstring)."""
    return insert_with_stats(m, xyz, mask, cfg)[0]


def bound_map(m: HashVoxelMap, center: jnp.ndarray, radius: float,
              cfg: MapConfig) -> HashVoxelMap:
    """Keep only blocks within `radius` (per axis) of `center` — the rolling
    recentering every reference mapper performs (A-LOAM laserMapping.cpp:
    342-559 cube shifts; S-FAST_LIO lasermap_fov_segment laserMapping.cpp:
    309-365; LIO-Livox Map_Manager MapMove). Pure elementwise over the slot
    axis (no gathers), so pipelines call it every scan."""
    r = jnp.float32(radius)
    return delete_outside_box(m, center - r, center + r, cfg)


def delete_outside_box(m: HashVoxelMap, lo: jnp.ndarray, hi: jnp.ndarray,
                       cfg: MapConfig) -> HashVoxelMap:
    """Drop every block whose center is outside [lo, hi] — the map-recentering /
    FOV eviction primitive (A-LOAM laserMapping.cpp:342-559 block shifts,
    S-FAST_LIO lasermap_fov_segment + Delete_Point_Boxes :309-365)."""
    bsz = cfg.block_size
    center = (m.keys[:-1].astype(jnp.float32) + 0.5) * bsz
    live = m.keys[:-1, 0] != EMPTY_KEY
    inside = jnp.all((center >= lo) & (center <= hi), axis=-1)
    drop = live & ~inside
    keys = jnp.concatenate(
        [jnp.where(drop[:, None], EMPTY_KEY, m.keys[:-1]), m.keys[-1:]], axis=0
    )
    occ = jnp.concatenate(
        [jnp.where(drop[:, None], False, m.occ[:-1]), m.occ[-1:]], axis=0
    )
    return HashVoxelMap(keys, m.points, occ)
