"""Batched k-nearest-neighbor queries against the hashed voxel-block map.

Replaces every `nearestKSearch` / `Nearest_Search` call in the reference
(A-LOAM laserOdometry.cpp:345, laserMapping.cpp:645/721; LIO-SAM
mapOptmization.cpp:1319; S-FAST_LIO esekfom.hpp:141 via ikd-Tree). Instead of
per-point tree descent, every query gathers neighboring blocks and takes a
top-k over the candidates — dense, branch-free, VPU-shaped work.

Two neighborhood modes (MapConfig.neighborhood):
* "octant8": the 2x2x2 block set nearest the query (chosen per-axis by which
  half of its block the query falls in). Guaranteed coverage radius =
  block_size/2, so configure block_size >= 2x the association gate. 3.4x
  fewer gathers than full27 — the production mode.
* "full27": the 3x3x3 neighborhood; coverage radius = block_size. Used by the
  small-world test configs.

`knn_brute` is the exact oracle used by the parity tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from ..map.hash_map import HashVoxelMap, block_coords, lookup, lookup_dedup

_OFFSETS27 = jnp.asarray(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=jnp.int32,
)  # (27,3)

# octant corners: which of {0, o} to take per axis (o = +-1 chosen per query)
_OCT_CORNERS = jnp.asarray(
    [[cx, cy, cz] for cx in (0, 1) for cy in (0, 1) for cz in (0, 1)], dtype=jnp.int32
)  # (8,3) in {0,1}

_BIG = jnp.float32(1e30)


class KnnResult(NamedTuple):
    """points (N,k,3); sq_dists (N,k) (1e30 where no neighbor); valid (N,k)."""

    points: jnp.ndarray
    sq_dists: jnp.ndarray
    valid: jnp.ndarray


def _neighbor_blocks(queries: jnp.ndarray, bc: jnp.ndarray, cfg: MapConfig) -> jnp.ndarray:
    """(N,3) block coords -> (N,M,3) neighbor block coords to search."""
    if cfg.neighborhood == "full27":
        return bc[:, None, :] + _OFFSETS27[None, :, :]
    # octant8: offset sign per axis from the query's position within its block
    frac = queries / cfg.block_size - bc.astype(queries.dtype)
    sign = jnp.where(frac >= 0.5, 1, -1).astype(jnp.int32)  # (N,3)
    return bc[:, None, :] + _OCT_CORNERS[None, :, :] * sign[:, None, :]


def _dedup_lookup(m: HashVoxelMap, nbr: jnp.ndarray, qmask: jnp.ndarray,
                  cfg: MapConfig) -> jnp.ndarray:
    """Slot lookup for (N,M,3) neighbor blocks with cross-query deduplication
    (hash_map.lookup_dedup: overlapping neighborhoods hit only a few thousand
    distinct blocks, each probed once)."""
    N, M, _ = nbr.shape
    valid = jnp.broadcast_to(qmask[:, None], (N, M)).reshape(-1)
    return lookup_dedup(m.keys, nbr.reshape(-1, 3), valid, cfg).reshape(N, M)


def _vmem_kernel_mode(cfg: MapConfig):
    """Resolve MapConfig.knn_kernel -> (use Pallas kernel?, interpret?).

    "auto" picks the VMEM-resident kernel on TPU for octant8 tables small
    enough to sit on-chip (32 MB of the 128 MB v5e VMEM, leaving room for
    the ~4 MB candidate scratch and double-buffered I/O tiles)."""
    # probes must be a multiple of 8 so the kernel's superset windows
    # (probes+8 rows) stay sublane-aligned in its candidate scratch
    if (cfg.neighborhood != "octant8" or cfg.probes % 8 != 0
            or cfg.knn_kernel == "xla"):
        return False, False
    if cfg.knn_kernel == "pallas":
        return True, False
    if cfg.knn_kernel == "pallas_interpret":
        return True, True
    from ..map.planar import planar_lanes  # local import: avoid cycle

    rows = ((cfg.slots + cfg.probes + 1 + 255) // 256) * 256
    # VMEM: the resident point-plane table; SMEM: the packed-key row index
    # (4 B/row) the kernel's scalar probe walks
    fits = (rows * planar_lanes(cfg) * 4 <= 32 * 2**20) and (rows * 4 <= 256 * 2**10)
    return (fits and jax.default_backend() == "tpu"), False


def knn(m: HashVoxelMap, queries: jnp.ndarray, qmask: jnp.ndarray, k: int,
        cfg: MapConfig, tab: jnp.ndarray | None = None) -> KnnResult:
    """k nearest map points for each query. queries (N,3), qmask (N,).

    `tab` is an optional prebuilt planar table (map/planar.build_planar) for
    the Pallas kernel path; callers running several association passes per
    map epoch build it once and thread it through."""
    use_vmem, interpret = _vmem_kernel_mode(cfg)
    if use_vmem:
        from .vmem_knn import knn_vmem  # local import: keeps CPU paths light

        sq, pts, valid = knn_vmem(m, queries, qmask, k, cfg, tab=tab,
                                  interpret=interpret)
        return KnnResult(pts, sq, valid)
    bc, _ = block_coords(queries, cfg)
    nbr = _neighbor_blocks(queries, bc, cfg)  # (N,M,3)
    slot = _dedup_lookup(m, nbr, qmask, cfg)  # (N,M)
    dump = m.n_rows - 1
    slot_safe = jnp.where(slot >= 0, slot, dump)
    pts = m.points[slot_safe]  # (N,M,B,3) contiguous block rows
    occ = m.occ[slot_safe] & (slot >= 0)[..., None]  # (N,M,B)
    d2 = jnp.sum((pts - queries[:, None, None, :]) ** 2, axis=-1)
    d2 = jnp.where(occ & qmask[:, None, None], d2, _BIG)
    d2f = d2.reshape(d2.shape[0], -1)
    sq, idx = _smallest_k(d2f, k)
    nn_pts = jnp.take_along_axis(pts.reshape(pts.shape[0], -1, 3), idx[..., None], axis=1)
    return KnnResult(nn_pts, sq, sq < _BIG * 0.5)


def _smallest_k(d: jnp.ndarray, k: int):
    """Exact k smallest per row via k argmin passes. For the small k used in
    association (k=5) this is pure VPU work and ~30x faster on TPU than
    jax.lax.top_k, which sorts the whole candidate axis."""
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmin(d, axis=1)
        v = jnp.take_along_axis(d, i[:, None], axis=1)
        vals.append(v[:, 0])
        idxs.append(i)
        d = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) == i[:, None], _BIG, d
        )
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


class CandCache(NamedTuple):
    """Cached world-frame KNN candidates in coordinate-plane (C, N) layout.

    The (N, C, 3) layout is poison on TPU — the 3-lane minor dim pads to 128,
    so every elementwise op moves 42x the data. Candidate-major planes put N
    on the lane axis: full VPU utilization for the re-ranking math."""

    x: jnp.ndarray  # (C,N)
    y: jnp.ndarray
    z: jnp.ndarray
    valid: jnp.ndarray  # (C,N)


def make_cand(res: KnnResult) -> CandCache:
    """CandCache from a generic KnnResult (e.g. the slot-sharded merged KNN).
    Pays one (N,C,3) read; prefer knn_cand when probing a local map."""
    p = res.points
    return CandCache(p[:, :, 0].T, p[:, :, 1].T, p[:, :, 2].T, res.valid.T)


def knn_cand(m: HashVoxelMap, queries: jnp.ndarray, qmask: jnp.ndarray,
             C: int, cfg: MapConfig, tab: jnp.ndarray | None = None,
             k: int | None = None):
    """Probe the map for C candidates per query, returned as a CandCache.

    With `k`, also returns the k nearest as a KnnResult — FREE on the probe
    pass: the candidate list is produced in ascending-distance order (k-pass
    min selection), so the k-NN are its first k entries, no reselect needed.
    """
    use_vmem, interpret = _vmem_kernel_mode(cfg)
    if use_vmem:
        from .vmem_knn import knn_vmem

        sq, planes, valid = knn_vmem(m, queries, qmask, C, cfg, tab=tab,
                                     interpret=interpret, return_planes=True)
        cache = CandCache(planes[:, 0:C].T, planes[:, C:2 * C].T,
                          planes[:, 2 * C:3 * C].T, valid.T)
        if k is None:
            return cache
        pts = jnp.stack([planes[:, 0:k], planes[:, C:C + k],
                         planes[:, 2 * C:2 * C + k]], axis=-1)
        vk = valid[:, :k]
        res = KnnResult(jnp.where(vk[..., None], pts, 0.0),
                        jnp.where(vk, sq[:, :k], _BIG), vk)
        return cache, res
    full = knn(m, queries, qmask, C, cfg, tab=tab)
    cache = make_cand(full)
    if k is None:
        return cache
    res = KnnResult(full.points[:, :k], full.sq_dists[:, :k], full.valid[:, :k])
    return cache, res


def knn_reselect(cand: CandCache, queries: jnp.ndarray, qmask: jnp.ndarray,
                 k: int) -> KnnResult:
    """Re-select the k nearest from a CACHED candidate list at moved queries.

    The candidate-cache association mode: the expensive map probe (knn_cand
    with C = SolverConfig.cand_k, e.g. 8-16) runs ONCE per scan; later solver
    iterations — where the pose has moved only mm-cm — re-rank the cached
    candidate points against the updated query positions here (pure VPU work
    in (C, N) plane layout, no table traffic). The analog of a molecular-
    dynamics neighbor list; the C - k extra neighbors absorb the pose motion.
    Replaces the reference's per-iteration kd-tree re-searches (A-LOAM
    laserMapping.cpp:645, esekfom.hpp:141) with amortized association."""
    dx = cand.x - queries[:, 0][None, :]
    dy = cand.y - queries[:, 1][None, :]
    dz = cand.z - queries[:, 2][None, :]
    d2 = dx * dx + dy * dy + dz * dz  # (C,N)
    d2 = jnp.where(cand.valid & qmask[None, :], d2, _BIG)
    sqs, xs, ys, zs = [], [], [], []
    for _ in range(k):
        v = jnp.min(d2, axis=0)  # (N,)
        hit = d2 == v[None, :]
        # tie-safe: keep only the first hit per column
        first = hit & (jnp.cumsum(hit.astype(jnp.int32), axis=0) == 1)
        ff = first.astype(d2.dtype)
        sqs.append(v)
        xs.append(jnp.sum(cand.x * ff, axis=0))
        ys.append(jnp.sum(cand.y * ff, axis=0))
        zs.append(jnp.sum(cand.z * ff, axis=0))
        d2 = jnp.where(first, _BIG, d2)
    sq = jnp.stack(sqs, axis=1)  # (N,k)
    valid = sq < _BIG * 0.5
    pts = jnp.stack([jnp.stack(xs, 1), jnp.stack(ys, 1), jnp.stack(zs, 1)], axis=-1)
    pts = jnp.where(valid[..., None], pts, 0.0)
    return KnnResult(pts, sq, valid)


def knn_brute(ref_pts: jnp.ndarray, ref_mask: jnp.ndarray, queries: jnp.ndarray,
              k: int) -> KnnResult:
    """Exact brute-force KNN oracle (test reference for the hashed-map KNN)."""
    d2 = jnp.sum((queries[:, None, :] - ref_pts[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(ref_mask[None, :], d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, k)
    nn_pts = ref_pts[idx]
    sq = -neg
    return KnnResult(nn_pts, sq, sq < _BIG * 0.5)
