"""Pallas TPU KNN: the whole map table VMEM-resident, probed on-chip.

This is the production association kernel (replaces the per-point kd-tree
descents of the reference: A-LOAM laserMapping.cpp:645/721, LIO-SAM
mapOptmization.cpp:1319, S-FAST_LIO ikd_Tree.cpp:370). The XLA fallback
(nn/knn.py) expresses the same math as per-(query, block) row gathers, but
XLA's gather costs ~50 ns per offset regardless of slice size — 65k offsets
per association pass ≈ 3 ms, 10x off HBM speed-of-light. This kernel removes
the gathers entirely:

  * the planar map table (map/planar.py) is a pipeline input with a constant
    index map, so Pallas copies it HBM->VMEM ONCE per call and every grid
    step reuses it;
  * the table's packed-key row index (PlanarTab.ktab) rides in SMEM, so the
    SCALAR core resolves each (query, octant) probe window to the one
    matching row — recomputing the probe base from the query's packed key
    with the same avalanche hash the map uses (hash_map.hash_packed) — and
    the copy loop moves exactly ONE (1, L) row per octant, VMEM->VMEM.
    (The previous kernel copied the whole aligned probe-window superset —
    16 rows per octant, 128 KB per query at B=64 — and key-matched them
    vectorized afterwards: 16x the VMEM traffic plus a (T,M,W,L) match
    phase. Resolving on the scalar core deletes both.)
  * distances and the k-pass min selection are pure VPU work on the (T,M,PW)
    candidate planes;
  * tiles whose queries are all invalid are skipped via a prefetched
    per-tile activity flag, so cost scales with the VALID feature count,
    not the padded capacity (features are packed to the front by
    pointcloud/voxel.voxel_downsample).

Empty sub-voxels carry the POISON_POINT coordinate and failed probes resolve
to the table's dump row (all poison), so every non-geometric pairing has
squared distance ~1e18 and falls out of the k-selection gate — no occupancy
plane, no masks in the hot loop. Invalid queries are poisoned at +1e9.

Semantics match nn/knn.py exactly for valid queries up to packed-key
aliasing (blocks 1024 block-sizes apart share a packed key; impossible under
the rolling bound_map, and harmless beyond it — far candidates lose the
distance selection). Parity is pinned by tests/test_vmem_knn.py in interpret
mode and on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MapConfig
from ..map.hash_map import block_coords, pack_key
from ..map.planar import (POISON_POINT, POISON_QUERY, VALID_SQ_LIMIT,
                          PlanarTab, build_planar, planar_lanes, plane_width)

_BIG = 1e30
_TILE = 64  # queries per grid step


def _hash_scalar(pk, log2_slots):
    """hash_map.hash_packed on kernel scalars — keep in sync with the map."""
    u = pk & 0x7FFFFFFF
    u = u ^ (u >> 15)
    u = (u * 0x2C1B3C6D) & 0x7FFFFFFF
    u = u ^ (u >> 12)
    u = (u * 0x297A2D39) & 0x7FFFFFFF
    u = u ^ (u >> 13)
    return u & ((1 << log2_slots) - 1)


def _kernel(act_ref, qk_ref, q_ref, tab_ref, ktab_ref, d_out, p_out, cand,
            *, T, M, PW, K, L, DL, PL, PROBES, LOG2_SLOTS, DUMP):
    i = pl.program_id(0)
    active = act_ref[i] > 0

    @pl.when(jnp.logical_not(active))
    def _():
        d_out[:] = jnp.full((T, DL), _BIG, jnp.float32)
        p_out[:] = jnp.zeros((T, PL), jnp.float32)

    @pl.when(active)
    def _():
        # resolve + gather phase: for every (query, octant) pair the scalar
        # core probes the SMEM packed-key index over the window [h, h+P) and
        # copies the ONE matching row (or the poison dump row) VMEM->VMEM.
        UNROLL = 4
        base = i * (T * M)

        def body(j4, _):
            for u in range(UNROLL):
                j = j4 * UNROLL + u
                kq = qk_ref[base + j]
                h0 = _hash_scalar(kq, LOG2_SLOTS)
                row = jnp.int32(DUMP)
                for p in range(PROBES):  # static unroll: pure scalar ops
                    row = jnp.where(ktab_ref[h0 + p] == kq, h0 + p, row)
                cand[pl.ds(j, 1), :] = tab_ref[pl.ds(row, 1), :]
            return 0

        jax.lax.fori_loop(0, (T * M) // UNROLL, body, 0)

        # candidate coordinate planes, kept 3D (T,M,B) — Mosaic cannot merge
        # the M dim into lanes, so selection runs hierarchically instead
        c = cand[:].reshape(T, M, L)
        X = c[:, :, 0:PW]
        Y = c[:, :, PW:2 * PW]
        Z = c[:, :, 2 * PW:3 * PW]
        q = q_ref[:]
        qx = jnp.reshape(q[:, 0:1], (T, 1, 1))
        qy = jnp.reshape(q[:, 1:2], (T, 1, 1))
        qz = jnp.reshape(q[:, 2:3], (T, 1, 1))
        d2 = (X - qx) ** 2 + (Y - qy) ** 2 + (Z - qz) ** 2  # (T,M,B)

        # k-pass min selection: argmin within each block (lanes), then argmin
        # across blocks; winners extracted by one-hot masked sums (tie-safe:
        # argmin picks the first index, like the XLA path)
        col_b = jax.lax.broadcasted_iota(jnp.int32, (T, PW), 1)
        col_m = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
        dv, px, py, pz = [], [], [], []
        for _k in range(K):
            vm = jnp.min(d2, axis=2)  # (T,M)
            im = jnp.argmin(d2, axis=2)  # (T,M)
            mstar = jnp.argmin(vm, axis=1)  # (T,)
            one_m = (col_m == mstar[:, None])  # (T,M)
            v = jnp.sum(jnp.where(one_m, vm, 0.0), axis=1, keepdims=True)
            istar = jnp.sum(jnp.where(one_m, im, 0), axis=1)  # (T,)
            one_b = (col_b == istar[:, None])  # (T,PW)
            one_mf = one_m.astype(jnp.float32)[:, :, None]  # (T,M,1)
            one_bf = one_b.astype(jnp.float32)  # (T,PW)
            sel2f = one_mf * jnp.reshape(one_bf, (T, 1, PW))  # (T,M,PW)
            Xm = jnp.sum(X * one_mf, axis=1)  # (T,PW)
            Ym = jnp.sum(Y * one_mf, axis=1)
            Zm = jnp.sum(Z * one_mf, axis=1)
            px.append(jnp.sum(Xm * one_bf, axis=1, keepdims=True))
            py.append(jnp.sum(Ym * one_bf, axis=1, keepdims=True))
            pz.append(jnp.sum(Zm * one_bf, axis=1, keepdims=True))
            dv.append(v)
            d2 = jnp.where(sel2f > 0.5, _BIG, d2)

        zpad_d = [jnp.zeros((T, DL - K), jnp.float32)] if DL > K else []
        zpad_p = [jnp.zeros((T, PL - 3 * K), jnp.float32)] if PL > 3 * K else []
        d_out[:] = jnp.concatenate(dv + zpad_d, axis=1)
        p_out[:] = jnp.concatenate(px + py + pz + zpad_p, axis=1)


# octant corner offsets, mirroring nn/knn._OCT_CORNERS. Kept as numpy: this
# module is often first imported inside an active jit trace (nn/knn.py's lazy
# import), where creating a device constant would leak a tracer.
import numpy as _np

_OCT = _np.asarray(
    [[cx, cy, cz] for cx in (0, 1) for cy in (0, 1) for cz in (0, 1)],
    dtype=_np.int32,
)


def knn_vmem(m, queries: jnp.ndarray, qmask: jnp.ndarray,
             k: int, cfg: MapConfig, tab: PlanarTab | None = None,
             interpret: bool = False, return_planes: bool = False):
    """Drop-in octant8 KNN with the VMEM-resident kernel.

    Returns (sq_dists (N,k), points (N,k,3), valid (N,k)) — same contract as
    nn/knn.knn. `tab` is the PlanarTab from map/planar.build_planar; pass
    it in when running several association passes against one map epoch.

    return_planes=True returns (sq, planes (N,3k) = [x...|y...|z...], valid)
    without materializing the (N,k,3) layout (whose 3-lane minor dim pads to
    128 on TPU) — the candidate-cache path (nn/knn.knn_cand) consumes this.
    """
    assert cfg.neighborhood == "octant8", "kernel covers the octant8 mode"
    N_in = queries.shape[0]
    T = _TILE
    if N_in % T:  # pad to a tile multiple; padded tiles are inactive
        padn = T - N_in % T
        queries = jnp.concatenate(
            [queries, jnp.zeros((padn, 3), queries.dtype)], axis=0)
        qmask = jnp.concatenate([qmask, jnp.zeros((padn,), bool)], axis=0)
    N = queries.shape[0]
    M, PW, L = 8, plane_width(cfg), planar_lanes(cfg)
    # output lane widths, 8-aligned (K<=5 historically; K up to 16 serves the
    # candidate-cache association mode, nn/knn.knn_reselect)
    assert k <= 16, "kernel packs 3k point lanes; extend PL for larger k"
    DL = ((max(k, 8) + 7) // 8) * 8
    PL = ((3 * k + 7) // 8) * 8

    if tab is None:
        tab = build_planar(m, cfg)

    qp = jnp.where(qmask[:, None], queries, POISON_QUERY)
    bc, _ = block_coords(queries, cfg)
    frac = queries / cfg.block_size - bc.astype(queries.dtype)
    sign = jnp.where(frac >= 0.5, 1, -1).astype(jnp.int32)
    nbr = bc[:, None, :] + _OCT[None, :, :] * sign[:, None, :]  # (N,M,3)
    qk = pack_key(nbr).reshape(-1)  # (N*M,) packed probe keys
    act = jnp.any(qmask.reshape(-1, T), axis=1).astype(jnp.int32)
    q4 = jnp.concatenate([qp, jnp.zeros((N, 1), jnp.float32)], axis=1)

    kernel = functools.partial(
        _kernel, T=T, M=M, PW=PW, K=k, L=L, DL=DL, PL=PL,
        PROBES=cfg.probes, LOG2_SLOTS=cfg.log2_slots,
        DUMP=tab.tab.shape[0] - 1)
    d_out, p_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tile activity flags + packed keys (SMEM)
            grid=(N // T,),
            in_specs=[
                pl.BlockSpec((T, 4), lambda i, act, qk: (i, 0),
                             memory_space=pltpu.VMEM),
                # constant index map: copied in once, resident thereafter
                pl.BlockSpec((tab.tab.shape[0], L), lambda i, act, qk: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ktab, whole array
            ],
            out_specs=[
                pl.BlockSpec((T, DL), lambda i, act, qk: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, PL), lambda i, act, qk: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((T * M, L), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N, DL), jnp.float32),
            jax.ShapeDtypeStruct((N, PL), jnp.float32),
        ],
        # the candidate scratch + selection temporaries exceed the default
        # 16 MB scoped-vmem budget for big tables; v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(act, qk, q4, tab.tab, tab.ktab)

    sq = d_out[:N_in, :k]
    valid = sq < VALID_SQ_LIMIT
    if return_planes:
        return jnp.where(valid, sq, _BIG), p_out[:N_in, :3 * k], valid
    pts = jnp.stack(
        [p_out[:N_in, 0:k], p_out[:N_in, k:2 * k], p_out[:N_in, 2 * k:3 * k]],
        axis=-1)  # (N_in,k,3)
    pts = jnp.where(valid[..., None], pts, 0.0)
    sq = jnp.where(valid, sq, _BIG)
    return sq, pts, valid
