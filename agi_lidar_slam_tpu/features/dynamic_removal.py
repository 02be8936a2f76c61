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
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..pointcloud.cloud import ScanGrid


class DynamicRemovalConfig(NamedTuple):
    cell: float = 0.4  # BEV cell size (reference grid: 0.2 m)
    half_extent: float = 48.0  # grid covers [-half, half] in x and y
    ground_band: float = 0.3  # height band above cell-min counted as ground
    fg_max_footprint: int = 160  # cells (~25 m^2): larger -> background
    fg_max_height: float = 3.0  # taller clusters -> background (walls, trees)
    n_prop_rounds: int = 10

    @property
    def grid(self) -> int:
        return int(2 * self.half_extent / self.cell)


def remove_dynamic(scan: ScanGrid, cfg: DynamicRemovalConfig = DynamicRemovalConfig()):
    """Returns a static-point mask (R,W): True = keep (ground or background)."""
    G = cfg.grid
    xyz = scan.xyz.reshape(-1, 3)
    mask = scan.mask.reshape(-1)
    N = xyz.shape[0]

    cx = jnp.clip(((xyz[:, 0] + cfg.half_extent) / cfg.cell).astype(jnp.int32), 0, G - 1)
    cy = jnp.clip(((xyz[:, 1] + cfg.half_extent) / cfg.cell).astype(jnp.int32), 0, G - 1)
    cell = cx * G + cy  # (N,)
    cell_safe = jnp.where(mask, cell, G * G)

    # --- ground level per cell (segment-min of z) ---------------------------
    zmin = jax.ops.segment_min(jnp.where(mask, xyz[:, 2], 1e9), cell_safe,
                               num_segments=G * G + 1)
    ground = mask & (xyz[:, 2] - zmin[cell_safe] < cfg.ground_band)

    # --- BEV occupancy + connected components over non-ground ---------------
    occ_pt = mask & ~ground
    occ = jnp.zeros((G * G + 1,), bool).at[jnp.where(occ_pt, cell, G * G)].set(True)
    occ2d = occ[: G * G].reshape(G, G)
    lin = jnp.arange(G * G, dtype=jnp.int32).reshape(G, G)
    labels = jnp.where(occ2d, lin, jnp.int32(G * G))

    # edge masks: jnp.roll wraps, but the BEV grid must not connect opposite
    # borders — invalidate the wrapped row/column per direction
    row = jnp.arange(G)[:, None]
    col = jnp.arange(G)[None, :]
    edge_ok = {
        (0, 1): row > 0, (0, -1): row < G - 1,
        (1, 1): col > 0, (1, -1): col < G - 1,
    }

    def prop(_, lab):
        m = lab
        for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
            nb = jnp.roll(lab, sh, axis=ax)
            nb_occ = jnp.roll(occ2d, sh, axis=ax) & edge_ok[(ax, sh)]
            m = jnp.minimum(m, jnp.where(occ2d & nb_occ, nb, m))
        flat = m.reshape(-1)
        padded = jnp.concatenate([flat, jnp.asarray([G * G], jnp.int32)])
        m = jnp.minimum(m, padded[m])
        return jnp.where(occ2d, m, jnp.int32(G * G))

    labels = jax.lax.fori_loop(0, cfg.n_prop_rounds, prop, labels)

    # --- cluster statistics --------------------------------------------------
    lab_flat = jnp.concatenate([labels.reshape(-1), jnp.asarray([G * G], jnp.int32)])
    cell_label = lab_flat[cell_safe]  # (N,) cluster id of each point
    cell_label = jnp.where(occ_pt, cell_label, G * G)
    footprint = jax.ops.segment_sum(
        occ2d.reshape(-1).astype(jnp.int32), labels.reshape(-1), num_segments=G * G + 1
    )
    zrel = xyz[:, 2] - zmin[cell_safe]
    hmax = jax.ops.segment_max(jnp.where(occ_pt, zrel, -1e9), cell_label,
                               num_segments=G * G + 1)
    is_fg_cluster = (footprint < cfg.fg_max_footprint) & (hmax < cfg.fg_max_height)
    foreground = occ_pt & is_fg_cluster[cell_label]

    keep = mask & ~foreground
    return keep.reshape(scan.mask.shape)
