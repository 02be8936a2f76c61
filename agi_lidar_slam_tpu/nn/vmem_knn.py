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
    matching row — the probe BASES are hashed on the VPU outside the kernel
    (hash_map.hash_packed) and prefetched alongside the keys, keeping the
    scalar loop to load/compare/copy — and the copy loop moves exactly ONE
    (1, L) row per octant, VMEM->VMEM.
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
from ..map.hash_map import block_coords, hash_packed, pack_key
from ..map.planar import (POISON_POINT, POISON_QUERY, VALID_SQ_LIMIT,
                          PlanarTab, build_planar, planar_lanes, plane_width)

_BIG = 1e30
_TILE = 64  # queries per grid step


def _kernel(act_ref, qk_ref, qh_ref, q_ref, tab_ref, ktab_ref, d_out, p_out,
            cand, planes, *, T, M, PW, K, L, DL, PL, PROBES, LOG2_SLOTS, DUMP):
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
                # probe base prefetched: the VPU hashes all keys in one pass
                # on the XLA side, saving the ~8-op avalanche per iteration
                # of this scalar-issue-bound loop
                h0 = qh_ref[base + j]
                row = jnp.int32(DUMP)
                for p in range(PROBES):  # static unroll: pure scalar ops
                    row = jnp.where(ktab_ref[h0 + p] == kq, h0 + p, row)
                cand[pl.ds(j, 1), :] = tab_ref[pl.ds(row, 1), :]
            return 0

        jax.lax.fori_loop(0, (T * M) // UNROLL, body, 0)

        # candidate planes flattened to LANE space (T, M*PW): a direct
        # (T*M, L) -> (T, M*L) reshape is a cross-sublane relayout Mosaic
        # can't do in registers (and tpu.concatenate refuses inputs with
        # mismatched sublane offsets), but STORES relayout — M static strided
        # row-slices written through the `planes` scratch assemble the same
        # thing. The previous hierarchical (T, M, PW) selection kept PW=64 <
        # the 128-lane tile — half the VPU idle and every pass paying 3D
        # reduction overhead (measured: selection phase 2.7 ms of the 4.2 ms
        # kernel at 8192 queries; lane-space selection runs the same math in
        # (T, M*PW)).
        c = cand[:].reshape(T, M, L)
        for m in range(M):
            planes[:, m * PW:(m + 1) * PW] = c[:, m, 0:PW]
            planes[:, (M + m) * PW:(M + m + 1) * PW] = c[:, m, PW:2 * PW]
            planes[:, (2 * M + m) * PW:(2 * M + m + 1) * PW] = c[:, m, 2 * PW:3 * PW]
        Xs = planes[:, 0:M * PW]
        Ys = planes[:, M * PW:2 * M * PW]
        Zs = planes[:, 2 * M * PW:3 * M * PW]
        q = q_ref[:]
        d2 = ((Xs - q[:, 0:1]) ** 2 + (Ys - q[:, 1:2]) ** 2
              + (Zs - q[:, 2:3]) ** 2)  # (T, M*PW)

        # k-pass min selection in lane space; winners extracted by one-hot
        # masked sums (tie-safe: argmin picks the first index, matching the
        # XLA path — (m, b) lane order equals the 3D (T,M,PW) scan order)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, M * PW), 1)
        dv, px, py, pz = [], [], [], []
        for _k in range(K):
            v = jnp.min(d2, axis=1, keepdims=True)  # (T,1)
            istar = jnp.argmin(d2, axis=1)  # (T,)
            one = cols == istar[:, None]  # (T, M*PW)
            onef = one.astype(jnp.float32)
            px.append(jnp.sum(Xs * onef, axis=1, keepdims=True))
            py.append(jnp.sum(Ys * onef, axis=1, keepdims=True))
            pz.append(jnp.sum(Zs * onef, axis=1, keepdims=True))
            dv.append(v)
            d2 = jnp.where(one, _BIG, d2)

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
    qh = hash_packed(qk, cfg.log2_slots)  # probe bases, hashed on the VPU
    act = jnp.any(qmask.reshape(-1, T), axis=1).astype(jnp.int32)
    q4 = jnp.concatenate([qp, jnp.zeros((N, 1), jnp.float32)], axis=1)

    kernel = functools.partial(
        _kernel, T=T, M=M, PW=PW, K=k, L=L, DL=DL, PL=PL,
        PROBES=cfg.probes, LOG2_SLOTS=cfg.log2_slots,
        DUMP=tab.tab.shape[0] - 1)
    d_out, p_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # tile activity flags + packed keys + probe bases (SMEM)
            num_scalar_prefetch=3,
            grid=(N // T,),
            in_specs=[
                pl.BlockSpec((T, 4), lambda i, act, qk, qh: (i, 0),
                             memory_space=pltpu.VMEM),
                # constant index map: copied in once, resident thereafter
                pl.BlockSpec((tab.tab.shape[0], L),
                             lambda i, act, qk, qh: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ktab, whole array
            ],
            out_specs=[
                pl.BlockSpec((T, DL), lambda i, act, qk, qh: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, PL), lambda i, act, qk, qh: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((T * M, L), jnp.float32),
                            pltpu.VMEM((T, 3 * M * plane_width(cfg)),
                                       jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N, DL), jnp.float32),
            jax.ShapeDtypeStruct((N, PL), jnp.float32),
        ],
        # the candidate scratch + selection temporaries exceed the default
        # 16 MB scoped-vmem budget for big tables; v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(act, qk, qh, q4, tab.tab, tab.ktab)

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
