"""Multi-chip SPMD: device mesh, shardings, and the sharded scan steps.

The reference's concurrency is OpenMP parallel-for over points + pthread
pipeline stages (SURVEY.md section 2.7). The TPU re-expression:

* the POINT axis shards across chips ("dp"): feature association and the GN
  normal equations are sums over points, so J^T J / J^T r complete with one
  psum — mathematically exact data parallelism (the analog of LIO-SAM's
  `#pragma omp parallel for` at mapOptmization.cpp:1307,1442);
* the MAP can slot-shard across chips ("mp", parallel/map_shard.py) when it
  exceeds one chip's HBM: association then runs through the exact merged
  sharded KNN and inserts scatter only owned rows.

Both multi-chip steps run the IDENTICAL per-scan math as the single-chip
engine: they call runtime.pipeline._process_scan_body with the solver/insert
ops swapped (no forked step) — in-solver deskew, the two-tier odometry stage,
and the two_step mode all included. Parity with process_scan is pinned by
tests/test_sharding_parity.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..estimators.gn_scan2map import GnStats, solve_scan2map
from ..estimators.two_step import solve_scan2map_two_step
from ..geometry import se3
from ..map.hash_map import HashVoxelMap
from ..pointcloud.cloud import PointBatch


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, axis_names=("dp",))


def shard_points(batch: PointBatch, mesh: Mesh) -> PointBatch:
    s = NamedSharding(mesh, P("dp"))
    return PointBatch(jax.device_put(batch.xyz, s), jax.device_put(batch.mask, s))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def _sharded_solver(mesh: Mesh, axis: str, fn):
    """Wrap a scan-to-map solver (solve_scan2map / solve_scan2map_two_step) to
    run under shard_map with the feature point axis sharded over `axis` and
    the normal equations psum'd (the solver's own axis_name hook). The maps
    and pose are replicated; outputs replicate via the psums."""

    def solver(pose0, corners, surfs, cmap, smap, cmap_cfg, smap_cfg, cfg,
               deskew=None):
        Pp = P(axis)
        if deskew is None:
            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(P(), Pp, Pp, P(), P()), out_specs=(P(), P()),
                check_vma=False,  # replication comes from the psums
            )
            def run(p0, c, s, cm, sm):
                return fn(p0, c, s, cm, sm, cmap_cfg, smap_cfg, cfg,
                          axis_name=axis)

            return run(pose0, corners, surfs, cmap, smap)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), Pp, Pp, P(), P(), (Pp, Pp, P())),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def run_d(p0, c, s, cm, sm, dsk):
            return fn(p0, c, s, cm, sm, cmap_cfg, smap_cfg, cfg,
                      deskew=dsk, axis_name=axis)

        return run_d(pose0, corners, surfs, cmap, smap, deskew)

    return solver


def sharded_gn_solve(
    mesh: Mesh,
    pose0: se3.Pose,
    corners: PointBatch,
    surfs: PointBatch,
    corner_map: HashVoxelMap,
    surf_map: HashVoxelMap,
    cfg: PipelineConfig,
) -> Tuple[se3.Pose, GnStats]:
    """Iterated scan-to-map GN with the point axis sharded over mesh axis "dp".

    Each chip associates its local point shard against the (replicated) map and
    builds partial normal equations; one psum(H), psum(g) per iteration rides
    the ICI; the 6x6 solve and pose update are replicated — every chip holds
    the identical pose afterwards. This IS the production solver
    (estimators.gn_scan2map.solve_scan2map) under shard_map, not a fork.
    """
    return _sharded_solver(mesh, "dp", solve_scan2map)(
        pose0, corners, surfs, corner_map, surf_map,
        cfg.corner_map, cfg.surf_map, cfg.solver)


def sharded_scan_step(mesh: Mesh, state, scan, cfg: PipelineConfig):
    """Full per-scan pipeline step with the point axis sharded over the mesh.

    EXACTLY runtime.pipeline.process_scan's math — same body, with the two
    solver calls (odometry stage + scan-to-map, incl. in-solver deskew and
    two_step) running under shard_map with psum'd normal equations. Feature
    extraction/downsampling and map updates are computed identically on every
    chip from replicated inputs, so map replicas never diverge.
    """
    from ..runtime.pipeline import _process_scan_body

    pshard = NamedSharding(mesh, P("dp"))

    solve_fn = _sharded_solver(mesh, "dp", solve_scan2map)
    solve_two = _sharded_solver(mesh, "dp", solve_scan2map_two_step)

    def solve_con(pose0, corners, surfs, *a, **k):
        # sharding constraints on the query batches so pjit partitions the
        # surrounding program (features/downsample) consistently
        corners = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, pshard), corners)
        surfs = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, pshard), surfs)
        return solve_fn(pose0, corners, surfs, *a, **k)

    def solve_two_con(pose0, corners, surfs, *a, **k):
        corners = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, pshard), corners)
        surfs = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, pshard), surfs)
        return solve_two(pose0, corners, surfs, *a, **k)

    return _process_scan_body(state, scan, cfg,
                              solve_fn=solve_con, solve_two_fn=solve_two_con)


def sharded_lio_step(mesh: Mesh, state, pts_l, pts_t, pts_mask, imu, cfg):
    """FAST-LIO engine step with the MEASUREMENT point axis sharded ("dp").

    IMU propagation, undistortion, and downsampling replicate (they are a
    tiny fraction of the scan budget); the iterated IESKF update — the
    engine's dominant stage — runs under shard_map: each chip associates and
    linearizes its shard of the downsampled cloud and the 12x12 HtH / Htr
    reductions complete with one psum per iteration (the collective mapping
    of the reference's OpenMP loop, esekfom.hpp:114-117). The 24x24 solve,
    state update, and map insert replicate — replicas never diverge.
    Parity with process_lio_scan is pinned by tests/test_sharding_parity.py.
    """
    from ..estimators.ieskf import update_iterated
    from ..runtime.lio_pipeline import _process_lio_body

    def update_fn(x_prop, P_prop, ds, smap, map_cfg, icfg):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(), P("dp"), P()), out_specs=(P(), P(), P(), P()),
            check_vma=False,  # replication comes from the psums
        )
        def run(xp, Pp, dsb, sm):
            return update_iterated(xp, Pp, dsb, sm, map_cfg, icfg,
                                   axis_name="dp")

        return run(x_prop, P_prop, ds, smap)

    return _process_lio_body(state, pts_l, pts_t, pts_mask, imu, cfg,
                             update_fn=update_fn)


def sharded_livox_step(mesh: Mesh, state, scan, imu, cfg):
    """LIO-Livox windowed-MAP engine step with the per-frame FEATURE axes
    sharded ("dp").

    Preprocessing (dynamic removal, 3-class features, downsample), the IMU
    preintegration, the marginalization, and the map inserts replicate; the
    window solve — association + the dense 30-dim normal equations — runs
    under shard_map with each frame's corner/surf/non-feature axes sharded
    and the per-frame 6x6 blocks psum'd (solve_window's axis_name hook; the
    collective form of the reference's three std::thread residual builders,
    Estimator.cpp:1019-1050). Parity: tests/test_sharding_parity.py.
    """
    from ..estimators.window_map import solve_window
    from ..runtime.livox_pipeline import _process_livox_body

    Pf = P(None, "dp")  # (F, N) / (F, N, 3) feature arrays: shard the point axis

    def solve_fn(ws, corners, surfs, cmap, smap, preints, prior, grav,
                 cmap_cfg, smap_cfg, scfg, lidar_weight, others=None,
                 other_map=None, omap_cfg=None, nonfeature_weight=10.0):
        use_others = others is not None and other_map is not None
        specs_in = [P(), Pf, Pf, P(), P(), P(), P(), P()]
        args = [ws, corners, surfs, cmap, smap, preints, prior, grav]
        if use_others:
            specs_in += [Pf, P()]
            args += [others, other_map]

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=tuple(specs_in), out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        def run(ws_, c_, s_, cm_, sm_, pre_, pr_, g_, *rest):
            kw = {}
            if use_others:
                kw = dict(others=rest[0], other_map=rest[1],
                          omap_cfg=omap_cfg, nonfeature_weight=nonfeature_weight)
            return solve_window(ws_, c_, s_, cm_, sm_, pre_, pr_, g_,
                                cmap_cfg, smap_cfg, scfg, lidar_weight,
                                axis_name="dp", **kw)

        return run(*args)

    return _process_livox_body(state, scan, imu, cfg, solve_fn=solve_fn)


def sharded_liosam_step(mesh: Mesh, state, scan, imu, cfg):
    """LIO-SAM engine step with the feature point axis sharded ("dp"): the
    scan-to-map GN runs under shard_map with psum'd normal equations (the
    same production solver as sharded_scan_step); preintegration, the 15-dim
    fusion KF, and map updates replicate. Parity:
    tests/test_sharding_parity.py."""
    from ..runtime.liosam_pipeline import _process_liosam_body

    solve_fn = _sharded_solver(mesh, "dp", solve_scan2map)
    return _process_liosam_body(state, scan, imu, cfg, solve_fn=solve_fn)


def sharded_scan_step_mp(mesh: Mesh, state, scan, cfg: PipelineConfig):
    """Full per-scan pipeline step against a SLOT-SHARDED map ("mp" axis):
    the scale-out for maps larger than one chip's HBM (SURVEY.md section 5.7).

    Association runs through the exact merged sharded KNN
    (parallel/map_shard.sharded_knn: local k-smallest per shard + one
    all_gather merge) and map updates through sharded_insert (replicated claim
    resolution + owned-row scatters). The per-scan math is otherwise identical
    to process_scan (same _process_scan_body). state.corner_map/surf_map must
    be placed with map_shard.shard_map_arrays. Insert drop counters are not
    tracked on this path (n_dropped reports 0).
    """
    from ..runtime.pipeline import _process_scan_body
    from .map_shard import sharded_insert, sharded_knn

    def knn_fn(m, q, qm, k, mcfg, tab=None):
        return sharded_knn(mesh, m, q, qm, k, mcfg)

    def insert_fn(m, xyz, mask, mcfg):
        return sharded_insert(mesh, m, xyz, mask, mcfg), jnp.int32(0)

    solve_fn = functools.partial(solve_scan2map, knn_fn=knn_fn)
    solve_two = functools.partial(solve_scan2map_two_step, knn_fn=knn_fn)
    return _process_scan_body(state, scan, cfg, solve_fn=solve_fn,
                              solve_two_fn=solve_two, insert_fn=insert_fn)
