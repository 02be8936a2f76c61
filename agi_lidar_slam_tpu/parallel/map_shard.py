"""Map-sharded KNN and insert: the city-scale scale-out of the voxel map.

When one chip's HBM can't hold the map (multi-session / city-scale mapping —
SURVEY.md section 5.7), the block-slot axis shards across the mesh axis "mp":

* keys (small: rows x 3 int32) stay REPLICATED so every device can resolve
  hash probes locally — no communication in the lookup;
* points/occ (the bulk) shard by slot range: each device owns rows
  [rank*rows/n, (rank+1)*rows/n);
* KNN: every device gathers candidates only from its own range, takes a LOCAL
  k-smallest, then one all_gather over "mp" merges n*k candidates into the
  exact global k — communication is O(N*k), independent of map size;
* insert: slot claiming is computed identically on all devices from the
  replicated keys (deterministic), and each device scatters only the point
  rows it owns.

Exactness: identical results to the single-device knn/insert (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MapConfig
from ..map.hash_map import HashVoxelMap, block_coords, lookup
from ..nn.knn import KnnResult, _neighbor_blocks, _smallest_k

_BIG = jnp.float32(1e30)


def shard_map_arrays(m: HashVoxelMap, mesh: Mesh) -> HashVoxelMap:
    """Place points/occ sharded over "mp" (slot axis), keys replicated."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("mp"))
    return HashVoxelMap(
        keys=jax.device_put(m.keys, rep),
        points=jax.device_put(m.points, shard),
        occ=jax.device_put(m.occ, shard),
    )


def sharded_knn(mesh: Mesh, m: HashVoxelMap, queries: jnp.ndarray,
                qmask: jnp.ndarray, k: int, cfg: MapConfig) -> KnnResult:
    """Exact KNN against a slot-sharded map. queries replicated (N,3)."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("mp"), P("mp"), P(), P()),
        out_specs=P(),
        check_vma=False,  # result is replicated via the all_gather merge,
        # which the static replication checker cannot prove
    )
    def run(keys, pts_local, occ_local, q, qm):
        n_dev = jax.lax.axis_size("mp")
        rank = jax.lax.axis_index("mp")
        local_rows = pts_local.shape[0]
        B = pts_local.shape[1]

        bc, _ = block_coords(q, cfg)
        nbr = _neighbor_blocks(q, bc, cfg)  # (N,M,3)
        slot = lookup(keys, nbr, cfg)  # (N,M) global slots (keys replicated)
        owner = slot // local_rows
        mine = (slot >= 0) & (owner == rank)
        lslot = jnp.clip(slot - rank * local_rows, 0, local_rows - 1)
        pts = pts_local[lslot]  # (N,M,B,3) garbage where not mine (masked below)
        occ = occ_local[lslot] & mine[..., None]
        d2 = jnp.sum((pts - q[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(occ & qm[:, None, None], d2, _BIG)
        dloc, iloc = _smallest_k(d2.reshape(d2.shape[0], -1), k)  # (N,k)
        ploc = jnp.take_along_axis(pts.reshape(pts.shape[0], -1, 3),
                                   iloc[..., None], axis=1)  # (N,k,3)
        # merge across devices: all_gather n*k candidates, re-select k
        dall = jax.lax.all_gather(dloc, "mp", axis=1)  # (N, n, k)
        pall = jax.lax.all_gather(ploc, "mp", axis=1)  # (N, n, k, 3)
        dflat = dall.reshape(dall.shape[0], n_dev * k)
        dsel, isel = _smallest_k(dflat, k)
        psel = jnp.take_along_axis(pall.reshape(pall.shape[0], n_dev * k, 3),
                                   isel[..., None], axis=1)
        return KnnResult(psel, dsel, dsel < _BIG * 0.5)

    return run(m.keys, m.points, m.occ, queries, qmask)


def sharded_insert(mesh: Mesh, m: HashVoxelMap, xyz: jnp.ndarray,
                   mask: jnp.ndarray, cfg: MapConfig) -> HashVoxelMap:
    """Insert into a slot-sharded map: replicated claim resolution + owned-row
    scatters. Same semantics as map.hash_map.insert."""
    from ..map.hash_map import lookup_dedup

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("mp"), P("mp"), P(), P()),
        out_specs=(P(), P("mp"), P("mp")),
    )
    def run(keys, pts_local, occ_local, xyz, pmask):
        N = xyz.shape[0]
        rank = jax.lax.axis_index("mp")
        local_rows = pts_local.shape[0]
        B = pts_local.shape[1]
        bc, sub_id = block_coords(xyz, cfg)
        pt_idx = jnp.arange(N, dtype=jnp.int32)

        # identical dedup+claim as the single-device insert (hash_map.
        # lookup_dedup claim mode): keys are replicated, so every device
        # resolves the same slots deterministically with zero communication
        keys, slot = lookup_dedup(keys, bc, pmask, cfg, claim=True)
        placed = pmask & (slot >= 0)
        owner = slot // local_rows
        mine = placed & (owner == rank)
        lflat = jnp.where(mine, jnp.clip(slot - rank * local_rows, 0, local_rows - 1)
                          * B + sub_id, local_rows * B)
        # local dump: one extra virtual row via clip-to-last + mask trick:
        # scatter into an extended local buffer then drop the extra row
        pts_ext = jnp.concatenate([pts_local.reshape(-1, 3),
                                   jnp.zeros((B, 3), pts_local.dtype)], axis=0)
        occ_ext = jnp.concatenate([occ_local.reshape(-1),
                                   jnp.zeros((B,), bool)])
        occupied_before = occ_ext[lflat]
        writeable = mine & ~occupied_before
        lflat_w = jnp.where(writeable, lflat, local_rows * B)
        owner_tbl = jnp.full((local_rows + 1) * B, N, dtype=jnp.int32).at[lflat_w].min(
            jnp.where(writeable, pt_idx, N)
        )
        is_owner = writeable & (owner_tbl[lflat_w] == pt_idx)
        lflat_f = jnp.where(is_owner, lflat, local_rows * B)
        pts_ext = pts_ext.at[lflat_f].set(jnp.where(is_owner[:, None], xyz, 0.0))
        occ_ext = occ_ext.at[lflat_f].set(is_owner | occ_ext[lflat_f])
        return (
            keys,
            pts_ext[: local_rows * B].reshape(local_rows, B, 3),
            occ_ext[: local_rows * B].reshape(local_rows, B),
        )

    keys, pts, occ = run(m.keys, m.points, m.occ, xyz, mask)
    return HashVoxelMap(keys, pts, occ)
