"""Pallas TPU kernel: fused block-gather + distance + k-smallest selection.

The KNN hot loop is gather-bound: XLA's row gather of (B,3) map blocks runs
far below HBM bandwidth. This kernel takes the resolved block slots (from the
deduplicated hash lookup) and, per query tile,
  1. issues explicit async DMAs for all needed block rows HBM -> VMEM,
     16 in flight at a time, landing directly in a (T, M*B, 3) layout so the
     compute phase needs no vector reshapes (Mosaic-friendly),
  2. computes all candidate distances in VMEM (VPU),
  3. runs the k-pass min selection with one-hot masked sums (no gathers),
writing (k dists, k points) per query — candidates never round-trip HBM.

Absent blocks (slot < 0) simply never DMA: the occupancy scratch is pre-zeroed
so their candidates stay masked. Correctness is pinned by parity tests against
the jnp reference (nn/knn.py) in interpret mode and on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # python literal: jnp constants would be captured as kernel consts
_WAVE = 16  # DMAs in flight


def _kernel(slots_ref, q_ref, pts_hbm, occ_hbm, dist_out, pts_out,
            buf, obuf, sems, *, T, M, B, K):
    obuf[:] = jnp.zeros((T, M * B), jnp.float32)

    def dma_pts(j):
        s = jnp.maximum(slots_ref[j], 0)
        return pltpu.make_async_copy(
            pts_hbm.at[s], buf.at[j // M, pl.ds((j % M) * B, B), :], sems.at[j % _WAVE]
        )

    def dma_occ(j):
        s = jnp.maximum(slots_ref[j], 0)
        return pltpu.make_async_copy(
            occ_hbm.at[s], obuf.at[j // M, pl.ds((j % M) * B, B)], sems.at[j % _WAVE]
        )

    def _waves(mk):
        def wave(w, _):
            base = w * _WAVE
            end = jnp.minimum(base + _WAVE, T * M)

            def issue(j, _):
                @pl.when(slots_ref[j] >= 0)
                def _():
                    mk(j).start()

                return 0

            def wait(j, _):
                @pl.when(slots_ref[j] >= 0)
                def _():
                    mk(j).wait()

                return 0

            jax.lax.fori_loop(base, end, issue, 0)
            jax.lax.fori_loop(base, end, wait, 0)
            return 0

        jax.lax.fori_loop(0, pl.cdiv(T * M, _WAVE), wave, 0)

    _waves(dma_pts)
    _waves(dma_occ)

    pts = buf[:]  # (T, M*B, 3)
    occ = obuf[:]  # (T, M*B) f32, 0 where absent/unoccupied
    q = q_ref[:]  # (T,3)
    d2 = jnp.sum((pts - q[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(occ > 0.5, d2, _BIG)

    # k-pass min selection; winners extracted by one-hot masked sums (VPU)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, M * B), 1)
    for kk in range(K):
        v = jnp.min(d2, axis=1)
        i = jnp.argmin(d2, axis=1)
        sel = col == i[:, None]
        p = jnp.sum(jnp.where(sel[:, :, None], pts, 0.0), axis=1)
        dist_out[:, kk] = v
        pts_out[:, kk, :] = p
        d2 = jnp.where(sel, _BIG, d2)


def pallas_gather_topk(points: jnp.ndarray, occ: jnp.ndarray, slots: jnp.ndarray,
                       queries: jnp.ndarray, k: int = 5, tile: int = 64):
    """points (rows,B,3) f32; occ (rows,B) bool; slots (N,M) int32;
    queries (N,3). Returns (dists (N,k), pts (N,k,3))."""
    N, M = slots.shape
    B = points.shape[1]
    assert N % tile == 0, "query count must be a multiple of the tile size"
    occ_f = occ.astype(jnp.float32)

    grid = (N // tile,)
    kernel = functools.partial(_kernel, T=tile, M=M, B=B, K=k)
    dists, pts = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile * M,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),  # points stay in HBM
                pl.BlockSpec(memory_space=pltpu.ANY),  # occ stays in HBM
            ],
            out_specs=[
                pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, k, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile, M * B, 3), jnp.float32),
                pltpu.VMEM((tile, M * B), jnp.float32),
                pltpu.SemaphoreType.DMA((_WAVE,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N, k), jnp.float32),
            jax.ShapeDtypeStruct((N, k, 3), jnp.float32),
        ],
    )(slots.reshape(-1), queries, points, occ_f)
    return dists, pts
