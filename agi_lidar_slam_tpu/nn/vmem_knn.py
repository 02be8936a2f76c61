"""Pallas TPU KNN: the whole map table VMEM-resident, probed on-chip.

This is the production association kernel (replaces the per-point kd-tree
descents of the reference: A-LOAM laserMapping.cpp:645/721, LIO-SAM
mapOptmization.cpp:1319, S-FAST_LIO ikd_Tree.cpp:370). The XLA fallback
(nn/knn.py) expresses the same math as per-(query, block) row gathers, but
XLA's gather costs ~50 ns per offset regardless of slice size — 65k offsets
per association pass ≈ 3 ms, 10x off HBM speed-of-light. This kernel removes
the gathers entirely:

  * the planar map table (map/planar.py) is a pipeline input with a constant
    index map, so Pallas copies it HBM->VMEM ONCE per call (~10 µs at HBM
    bandwidth for the production 8 MB table) and every grid step reuses it;
  * per query tile, a scalar loop copies each query's octant probe windows
    (P rows) VMEM->VMEM into a candidate buffer — on-chip reads, no DMA;
  * key matching, distances, and the k-pass min selection are pure VPU work
    on lane-aligned buffers;
  * tiles whose queries are all invalid are skipped via a prefetched
    per-tile activity flag, so cost scales with the VALID feature count,
    not the padded capacity (features are packed to the front by
    pointcloud/voxel.voxel_downsample).

Empty sub-voxels / failed probes carry the POISON_POINT coordinate and
invalid queries POISON_QUERY (map/planar.py), so every non-geometric pairing
has squared distance ~1e18 and falls out of the k-selection gate — no
occupancy plane, no masks in the hot loop.

Semantics match nn/knn.py exactly for valid queries (same candidate order,
same f32 distance expression); parity is pinned by tests/test_vmem_knn.py in
interpret mode and on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MapConfig
from ..map.hash_map import HashVoxelMap, block_coords, probe_base
from ..map.planar import (POISON_POINT, POISON_QUERY, VALID_SQ_LIMIT,
                          build_planar, planar_lanes, plane_width)

_BIG = 1e30
_TILE = 64  # queries per grid step


def _kernel(act_ref, h_ref, nbr_ref, q_ref, tab_ref, d_out, p_out, cand,
            *, T, M, W, PW, K, L, DL, PL):
    i = pl.program_id(0)
    active = act_ref[i] > 0

    @pl.when(jnp.logical_not(active))
    def _():
        d_out[:] = jnp.full((T, DL), _BIG, jnp.float32)
        p_out[:] = jnp.zeros((T, PL), jnp.float32)

    @pl.when(active)
    def _():
        # gather phase: probe windows for every (query, octant block) pair,
        # scalar-indexed VMEM->VMEM copies (the whole table is resident).
        # The true probe window [h, h+P) is unaligned (sliding chains share
        # overflow capacity); the copy reads the aligned SUPERSET window
        # [h & ~7, h & ~7 + W), W = P + 8 — Mosaic gets the provably
        # 8-aligned sublane offset it needs, and the key match below ignores
        # the extra rows (a block coord exists at most once in the table).
        # Unrolled 8x: the loop is iteration-count-bound (scalar address
        # formation + branch dominate the copy), not bandwidth-bound.
        UNROLL = 8
        base = i * (T * M)

        def body(j4, _):
            for u in range(UNROLL):
                j = j4 * UNROLL + u
                hj = h_ref[base + j]
                hb = pl.multiple_of((hj >> 3) << 3, 8)
                cand[pl.ds(j * W, W), :] = tab_ref[pl.ds(hb, W), :]
            return 0

        jax.lax.fori_loop(0, (T * M) // UNROLL, body, 0)

        # match phase (vector): keep the probe row whose key matches
        c = cand[:].reshape(T, M, W, L)
        ckeys = pltpu.bitcast(c[:, :, :, 3 * PW:3 * PW + 3], jnp.int32)
        tgt = nbr_ref[:].reshape(T, M, 1, 3)
        eq = jnp.all(ckeys == tgt, axis=-1)  # (T,M,W)
        w = eq.astype(jnp.float32)[..., None]  # f32 before the dim insert:
        # Mosaic only supports minor-dim insertion on 32-bit types
        row = jnp.sum(c * w, axis=2)  # (T,M,L) zeros where no probe matched
        anyf = jnp.max(w, axis=2)  # (T,M,1) 1.0 where some probe matched
        row = row * anyf + (1.0 - anyf) * POISON_POINT

        # candidate coordinate planes, kept 3D (T,M,B) — Mosaic cannot merge
        # the M dim into lanes, so selection runs hierarchically instead
        X = row[:, :, 0:PW]
        Y = row[:, :, PW:2 * PW]
        Z = row[:, :, 2 * PW:3 * PW]
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


def knn_vmem(m: HashVoxelMap, queries: jnp.ndarray, qmask: jnp.ndarray,
             k: int, cfg: MapConfig, tab: jnp.ndarray | None = None,
             interpret: bool = False, return_planes: bool = False):
    """Drop-in octant8 KNN with the VMEM-resident kernel.

    Returns (sq_dists (N,k), points (N,k,3), valid (N,k)) — same contract as
    nn/knn.knn. `tab` is the planar table from map/planar.build_planar; pass
    it in when running several association passes against one map epoch.

    return_planes=True returns (sq, planes (N,3k) = [x...|y...|z...], valid)
    without materializing the (N,k,3) layout (whose 3-lane minor dim pads to
    128 on TPU) — the candidate-cache path (nn/knn.knn_cand) consumes this.
    """
    assert cfg.neighborhood == "octant8", "kernel covers the octant8 mode"
    assert cfg.probes % 8 == 0, "superset windows need 8-aligned probe counts"
    N_in = queries.shape[0]
    T = _TILE
    if N_in % T:  # pad to a tile multiple; padded tiles are inactive
        padn = T - N_in % T
        queries = jnp.concatenate(
            [queries, jnp.zeros((padn, 3), queries.dtype)], axis=0)
        qmask = jnp.concatenate([qmask, jnp.zeros((padn,), bool)], axis=0)
    N = queries.shape[0]
    M, W, PW, L = 8, cfg.probes + 8, plane_width(cfg), planar_lanes(cfg)
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
    h = probe_base(nbr.reshape(-1, 3), cfg)  # (N*M,) aligned bases
    act = jnp.any(qmask.reshape(-1, T), axis=1).astype(jnp.int32)
    q4 = jnp.concatenate([qp, jnp.zeros((N, 1), jnp.float32)], axis=1)

    kernel = functools.partial(_kernel, T=T, M=M, W=W, PW=PW, K=k, L=L,
                               DL=DL, PL=PL)
    d_out, p_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tile activity flags + probe bases (SMEM)
            grid=(N // T,),
            in_specs=[
                pl.BlockSpec((T * M, 3), lambda i, act, h: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 4), lambda i, act, h: (i, 0),
                             memory_space=pltpu.VMEM),
                # constant index map: copied in once, resident thereafter
                pl.BlockSpec((tab.shape[0], L), lambda i, act, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((T, DL), lambda i, act, h: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, PL), lambda i, act, h: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((T * M * W, L), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N, DL), jnp.float32),
            jax.ShapeDtypeStruct((N, PL), jnp.float32),
        ],
        # the candidate scratch + match-phase temporaries exceed the default
        # 16 MB scoped-vmem budget; v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(act, h.reshape(-1), nbr.reshape(-1, 3), q4, tab)

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
