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


def pack_key(bc: jnp.ndarray) -> jnp.ndarray:
    """Block coords (...,3) -> one non-negative 30-bit int32 key:
    (x mod 1024) << 20 | (y mod 1024) << 10 | (z mod 1024).

    Exact (alias-free) whenever the live blocks span < 1024 blocks per axis
    — guaranteed by the rolling bound_map (150 m radius over >=2 m blocks).
    For unbounded maps two blocks 1024*block_size apart alias; the full
    (...,3) key comparison in `lookup` still disambiguates them, and the
    Pallas kernel's packed-key probe would at worst pick far-away candidate
    points that the distance gates discard. The hash is a function of this
    packed key so the kernel can recompute probe bases from ONE SMEM word
    per (query, octant)."""
    return (
        ((bc[..., 0] & jnp.int32(1023)) << 20)
        | ((bc[..., 1] & jnp.int32(1023)) << 10)
        | (bc[..., 2] & jnp.int32(1023))
    )


def hash_packed(pk: jnp.ndarray, log2_slots: int) -> jnp.ndarray:
    """murmur-style avalanche of a packed key -> slot in [0, 2**log2_slots).

    The finalizer matters: without it the LOW bits are linear in the
    coordinates, so small symmetric coordinates — exactly what a near-origin
    scan produces — collide in structured families, and the probe windows
    turn those collisions into dropped blocks at a few percent table load.
    int32 wraparound is deterministic on XLA; nn/vmem_knn.py prefetches
    these hashes into its kernel as the SMEM probe bases."""
    u = pk & jnp.int32(0x7FFFFFFF)
    u = u ^ (u >> 15)
    u = (u * jnp.int32(0x2C1B3C6D)) & jnp.int32(0x7FFFFFFF)
    u = u ^ (u >> 12)
    u = (u * jnp.int32(0x297A2D39)) & jnp.int32(0x7FFFFFFF)
    u = u ^ (u >> 13)
    return u & jnp.int32((1 << log2_slots) - 1)


def _hash(bc: jnp.ndarray, log2_slots: int) -> jnp.ndarray:
    """Spatial hash of integer block coords (...,3): avalanche of pack_key."""
    return hash_packed(pack_key(bc), log2_slots)


def probe_base(bc: jnp.ndarray, cfg: MapConfig) -> jnp.ndarray:
    """Start row of a block's probe window: the sliding window [h, h+probes).

    Sliding (unaligned) windows let neighboring chains share overflow slots,
    so the table tolerates far higher load than aligned set-associative
    groups (an aligned variant measurably dropped blocks at <10% load). The
    Pallas association kernel needs 8-aligned vector loads, so it reads an
    aligned SUPERSET window [h & ~7, h & ~7 + probes + 8) and lets its key
    match pick the right row (nn/vmem_knn.py)."""
    return _hash(bc, cfg.log2_slots)


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


def lookup_dedup(keys: jnp.ndarray, bc: jnp.ndarray, valid: jnp.ndarray,
                 cfg: MapConfig, claim: bool = False):
    """`lookup` with cross-batch deduplication: distinct block coords are
    probed once. bc (K,3), valid (K,) -> slot (K,) (-1 where absent/invalid).

    Nearby points share blocks (a scan's 8k inserts hit <1k distinct blocks;
    KNN neighborhoods overlap heavily), so probing each distinct coord once
    cuts the dominant probe-window gather row count ~10x. Distinct coords are
    found by sorting packed 30-bit keys. To keep the pack exact on arbitrarily
    long trajectories, coords are recentered on the minimum coordinate of the
    *valid* entries before packing (one scan spans far fewer than 1024 blocks
    per axis); anything outside the 1024-block window — only possible for
    masked/garbage entries — gets a sentinel key and resolves to 'absent'
    instead of aliasing with a real block.
    """
    K = bc.shape[0]
    # unique-block capacity: half the entry count, floored at 4096 and capped
    # at K (octant8 neighborhoods query 8 slots per point, so distinct blocks
    # run far below K/2 in practice); overflow falls back to 'absent', which
    # only costs a redundant probe, never a wrong hit
    U = min(K, max(K // 2, 4096))
    qbc = jnp.where(valid[:, None], bc, jnp.int32(2**20))
    base = jnp.min(qbc, axis=0)  # (3,)
    base = jnp.where(base == 2**20, 0, base)  # all-masked batch: any base works
    rel = bc - base[None, :]
    in_range = jnp.all((rel >= 0) & (rel < 1024), axis=1) & valid
    relc = jnp.clip(rel, 0, 1023)
    packed = jnp.where(
        in_range,
        (relc[:, 0] << 20) | (relc[:, 1] << 10) | relc[:, 2],
        jnp.int32(1 << 30),  # sentinel: sorts after every valid key
    )
    order = jnp.argsort(packed)
    ps = packed[order]
    first = jnp.concatenate([jnp.ones((1,), bool), ps[1:] != ps[:-1]])
    uid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1  # (K,)
    ok_u = (uid_sorted < U) & in_range[order]
    # representative coords per unique id
    ucoords = jnp.full((U + 1, 3), 2**20, jnp.int32).at[
        jnp.where(first & ok_u, uid_sorted, U)
    ].set(bc[order])
    ureal = ucoords[:U, 0] != 2**20  # real distinct coords (not padding)
    uc = ucoords[:U]

    if claim:
        # insert mode: claim a probe slot for each distinct ABSENT block (the
        # claim set is per-BLOCK, so its cost is bounded by scan geometry,
        # not point count — and conflict rounds never fight over duplicates).
        # Concurrent claimers of one empty slot serialize by scatter-min of
        # unique id; losers retry against the updated table. Blocks whose
        # probe chain stays full are dropped (bounded lossiness; callers
        # count the points).
        dump = keys.shape[0] - 1
        u_idx = jnp.arange(U, dtype=jnp.int32)

        def claim_round(carry):
            kys, _, rnd = carry
            uslot = lookup(kys, uc, cfg)
            nd = ureal & (uslot < 0)
            cand = _first_empty(kys, uc, cfg)
            attempt = nd & (cand >= 0)
            cand_safe = jnp.where(attempt, cand, dump)
            cl = jnp.full((keys.shape[0],), U, dtype=jnp.int32).at[
                cand_safe].min(jnp.where(attempt, u_idx, U))
            winner = attempt & (cl[cand_safe] == u_idx)
            kys = kys.at[jnp.where(winner, cand, dump)].set(
                jnp.where(winner[:, None], uc, kys[dump])
            )
            unresolved = jnp.any(attempt & ~winner)
            return kys, unresolved, rnd + 1

        # exit as soon as a round resolves every pending claim instead of
        # always paying claim_rounds
        keys, _, _ = jax.lax.while_loop(
            lambda c: c[1] & (c[2] < cfg.claim_rounds),
            claim_round,
            claim_round((keys, jnp.bool_(True), jnp.int32(0))),
        )

    uslot = lookup(keys, uc, cfg)  # probe only distinct blocks
    slot_sorted = jnp.where(ok_u, uslot[jnp.minimum(uid_sorted, U - 1)], -1)
    slot = jnp.zeros((K,), jnp.int32).at[order].set(slot_sorted)
    return (keys, slot) if claim else slot


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
    `claim_rounds` conflict-resolution rounds (lookup_dedup claim mode: one
    claim per distinct block, scatter-min serialized). Points whose probe
    chain is full are dropped (bounded lossiness, mirroring the reference's
    queue drains) — `n_dropped` counts them so pipelines can surface silent
    geometry loss in their metrics (a saturating table shows up as a rising
    drop count).
    """
    N = xyz.shape[0]
    B = m.bucket
    dump = m.n_rows - 1
    bc, sub_id = block_coords(xyz, cfg)
    pt_idx = jnp.arange(N, dtype=jnp.int32)

    # dedup + claim in one pass: a scan's N points land in <<N distinct
    # blocks, so each distinct block is probed once and each ABSENT distinct
    # block claims its slot once (lookup_dedup claim mode) — both the lookup
    # gathers and the claim conflict rounds scale with scan geometry, not
    # point count
    keys, slot = lookup_dedup(m.keys, bc, mask, cfg, claim=True)

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
