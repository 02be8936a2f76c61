"""Dynamic-object (foreground) removal — LIO-Livox's PCSeg re-designed.

The reference (LIO-Livox src/segment/segment.cpp, 1.3k LoC; PCSeg::DoSeg
segment.hpp:122) splits each sweep into {ground, background, foreground} on a
150x400 0.2 m grid + Euclidean clustering, and strips foreground (potentially
moving vehicles/pedestrians) before feature extraction.

TPU formulation:
* ground: per-BEV-cell minimum z as the local ground level (segment-min), a
  point is ground if within a height band of its cell's level;
* clustering: 2D connected components over occupied BEV cells by iterated
  min-label propagation with pointer jumping (same machinery as the LeGO
  range-image labeler, here in the ground plane);
* classification: clusters with a small footprint and low height are
  foreground (vehicle/pedestrian scale) and removed; large-footprint or tall
  clusters are static background.

Dataflow is organized to MINIMIZE point<->cell-image communication, the
stage's measured cost on TPU (both XLA scatter AND 115k-wide gather run
~2 ms/pass at HDL-64 scale):
* cell occupancy = (per-cell zmax - zmin > ground_band), computed purely from
  the two stats scatters — clustering + cluster stats then run entirely in
  (G, G) cell space with NO per-point gather in between;
* the per-point verdict (ground test + foreground flag) is ONE fused gather
  implemented as an MXU one-hot matmul: cols = onehot(cx) @ [zthr | fg]
  (G, 2G), columns selected by onehot(cy) — 2.2x faster than XLA's native
  115k gather, and both channels ride the same pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..pointcloud.cloud import ScanGrid


class DynamicRemovalConfig(NamedTuple):
    cell: float = 0.4  # BEV cell size (reference grid: 0.2 m)
    half_extent: float = 40.0  # grid covers [-half, half] in x and y (the
    # reference's grid spans 30x80 m forward; 80 m of diameter here)
    ground_band: float = 0.3  # height band above cell-min counted as ground
    fg_max_footprint: int = 160  # cells (~25 m^2): larger -> background
    fg_max_height: float = 3.0  # taller clusters -> background (walls, trees)
    # label-propagation rounds; each includes a pointer-jump, so reach
    # doubles per round (2^4 = 16 cells = 6.4 m covers vehicle-scale
    # clusters; under-converged fragments of LARGE clusters stay background
    # via the height test, so fewer rounds fail safe — and the per-round
    # pointer-jump gather is the stage's second-biggest cost)
    n_prop_rounds: int = 4
    # azimuth-column stride for the BEV statistics scatters (zmin / zmax):
    # the XLA TPU scatter is the stage's bottleneck and scales with the point
    # count, while the cell stats saturate well below full density on DENSE
    # scans (HDL-64 azimuth spacing at 50 m is ~9 cm vs the 0.4 m cell).
    # Classification of EVERY point (the gathers) stays full-resolution, and
    # points whose cell received no decimated sample are KEPT (fail-safe).
    # Default 1 (no decimation): at 16-beam density the decimated occupancy
    # measurably under-segments small movers; the HDL-64 livox config opts
    # into 2.
    stats_stride: int = 1

    @property
    def grid(self) -> int:
        return int(2 * self.half_extent / self.cell)


def _gather_onehot(channels, cx: jnp.ndarray, cy: jnp.ndarray, G: int):
    """Fused multi-channel per-point gather from (G, G) cell images via MXU
    one-hot matmul: measured 2.2x faster than XLA's native gather at 115k
    points (the gather lowering is element-serialized on TPU; the one-hot
    path streams (N, C*G) f32 at HBM speed and its GFLOPs ride the MXU).
    bf16 matmul precision rounds the TABLE values to ~8 mantissa bits; a
    one-hot row picks out exactly one (rounded) value, so callers needing
    better than 0.4% relative pass a value as a bf16 hi + residual channel
    pair and re-sum after the gather."""
    C = len(channels)
    ar = jnp.arange(G, dtype=jnp.int32)
    ohx = (cx[:, None] == ar[None, :]).astype(jnp.bfloat16)  # (N, G)
    tab = jnp.concatenate(channels, axis=1).astype(jnp.bfloat16)  # (G, C*G)
    cols = (ohx @ tab).astype(jnp.float32)  # (N, C*G): row cx_i of each table
    ohy = cy[:, None] == ar[None, :]  # (N, G) bool
    return [jnp.sum(jnp.where(ohy, cols[:, i * G:(i + 1) * G], 0.0), axis=1)
            for i in range(C)]


def remove_dynamic(scan: ScanGrid, cfg: DynamicRemovalConfig = DynamicRemovalConfig()):
    """Returns a static-point mask (R,W): True = keep (ground or background)."""
    G = cfg.grid
    xyz = scan.xyz.reshape(-1, 3)
    mask = scan.mask.reshape(-1)
    if cfg.stats_stride > 1:  # decimated scatter statistics (see config)
        col = jnp.broadcast_to(
            jnp.arange(scan.mask.shape[1]) % cfg.stats_stride == 0,
            scan.mask.shape).reshape(-1)
        stat_mask = mask & col
    else:
        stat_mask = mask

    cx = jnp.clip(((xyz[:, 0] + cfg.half_extent) / cfg.cell).astype(jnp.int32), 0, G - 1)
    cy = jnp.clip(((xyz[:, 1] + cfg.half_extent) / cfg.cell).astype(jnp.int32), 0, G - 1)
    cell_stat = jnp.where(stat_mask, cx * G + cy, G * G)

    # --- per-cell z extremes (the ONLY point-space scatters) -----------------
    zmin = jax.ops.segment_min(jnp.where(stat_mask, xyz[:, 2], 1e9), cell_stat,
                               num_segments=G * G + 1)
    zmax = jax.ops.segment_max(jnp.where(stat_mask, xyz[:, 2], -1e9), cell_stat,
                               num_segments=G * G + 1)
    # relative cell height = max z-above-ground of the cell's points; a cell
    # is "occupied" (has non-ground content) iff it exceeds the ground band —
    # cell-space-only, so clustering needs no per-point pass first
    cellrel = (zmax - zmin)[: G * G]
    occ2d = (cellrel > cfg.ground_band).reshape(G, G)

    lin = jnp.arange(G * G, dtype=jnp.int32).reshape(G, G)
    labels = jnp.where(occ2d, lin, jnp.int32(G * G))

    # edge masks: jnp.roll wraps, but the BEV grid must not connect opposite
    # borders — invalidate the wrapped row/column per direction
    row = jnp.arange(G)[:, None]
    col2 = jnp.arange(G)[None, :]
    edge_ok = {
        (0, 1): row > 0, (0, -1): row < G - 1,
        (1, 1): col2 > 0, (1, -1): col2 < G - 1,
    }

    def prop(_, lab):
        m = lab
        for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
            nb = jnp.roll(lab, sh, axis=ax)
            nb_occ = jnp.roll(occ2d, sh, axis=ax) & edge_ok[(ax, sh)]
            m = jnp.minimum(m, jnp.where(occ2d & nb_occ, nb, m))
        # pointer jump labels[m]: label values ARE cell indices, so the
        # G*G-wide gather decomposes into a 2D image lookup — the same
        # one-hot matmul path as the point verdict below. bf16 rounds
        # integers above 256, so the label rides as an exact (quotient,
        # remainder) channel pair; the sentinel G*G jumps to itself.
        mc = jnp.minimum(m, G * G - 1).reshape(-1)
        hi = (m // G).astype(jnp.float32)
        lo = (m % G).astype(jnp.float32)
        jh, jl = _gather_onehot([hi, lo], mc // G, mc % G, G)
        jumped = jnp.where(m.reshape(-1) == G * G, G * G,
                           (jh * G + jl).astype(jnp.int32)).reshape(G, G)
        m = jnp.minimum(m, jumped)
        return jnp.where(occ2d, m, jnp.int32(G * G))

    labels = jax.lax.fori_loop(0, cfg.n_prop_rounds, prop, labels)

    # --- cluster statistics (cell space: G*G-element scatters, not N) -------
    lab_flat = labels.reshape(-1)
    footprint = jax.ops.segment_sum(
        occ2d.reshape(-1).astype(jnp.int32), lab_flat, num_segments=G * G + 1
    )
    hmax = jax.ops.segment_max(cellrel, lab_flat, num_segments=G * G + 1)
    is_fg_cluster = (footprint < cfg.fg_max_footprint) & (hmax < cfg.fg_max_height)
    # the sentinel label (cells unoccupied in the — possibly decimated —
    # stats) has footprint 0 / hmax -inf and would read as foreground:
    # force it to background so points in unsampled cells are KEPT
    is_fg_cluster = is_fg_cluster.at[G * G].set(False)
    fg_cell = is_fg_cluster[lab_flat]  # (G*G,) per-cell foreground verdict
    # ONE per-cell keep-threshold folds both channels: a point is kept iff
    #   ground (z < zmin + band)  OR  its cell is background
    # <=> z < w,  w = zmin + band (fg cells) | +BIG (background cells).
    # Cells with no stats sample carry zmin=1e9: they are background via the
    # sentinel fix, so w = BIG there too (clip keeps the bf16 table finite).
    w = jnp.where(fg_cell, zmin[: G * G] + cfg.ground_band, 3e4)
    w = jnp.clip(w, -3e4, 3e4).reshape(G, G)
    # bf16 hi + f32 residual channel pair: the re-summed threshold is exact
    # to ~eps^2 * |z| (sub-mm), so the test matches an f32 gather
    w_hi = w.astype(jnp.bfloat16).astype(jnp.float32)
    w_lo = w - w_hi

    hi_pt, lo_pt = _gather_onehot([w_hi, w_lo], cx, cy, G)
    keep = mask & (xyz[:, 2] < hi_pt + lo_pt)
    return keep.reshape(scan.mask.shape)
