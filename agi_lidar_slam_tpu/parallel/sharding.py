"""Multi-chip SPMD: device mesh, shardings, and the sharded scan step.

The reference's concurrency is OpenMP parallel-for over points + pthread
pipeline stages (SURVEY.md section 2.7). The TPU re-expression:

* the POINT axis is sharded across chips ("dp"): feature association and the
  GN normal equations are sums over points, so J^T J / J^T r reduce with one
  psum — mathematically exact data parallelism (the analog of LIO-SAM's
  `#pragma omp parallel for` at mapOptmization.cpp:1307,1442);
* the MAP lives in HBM as fixed-shape arrays; in this round it is replicated
  and updated identically on every chip from the (small, all-gathered)
  downsampled feature set, keeping replicas bit-identical; slot-sharding the
  map over a second mesh axis is the planned scale-out for city-scale maps.

`sharded_gn_step` uses shard_map + explicit psum (compiler-proof collective
placement); `dryrun` in __graft_entry__.py jits the full pipeline step over
the mesh to validate that everything (features, KNN gathers, map scatter)
partitions.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..estimators.gn_scan2map import GnStats, associate, normal_equations, solve_delta
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
    the identical pose afterwards.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), (P("dp"), P("dp")), (P("dp"), P("dp")), P(), P()),
        out_specs=P(),
    )
    def run(pose0, corners_parts, surfs_parts, cmap, smap):
        corners = PointBatch(*corners_parts)
        surfs = PointBatch(*surfs_parts)
        scfg = cfg.solver

        def outer(_, carry):
            pose, _ = carry
            corr = associate(pose, corners, surfs, cmap, smap,
                             cfg.corner_map, cfg.surf_map, scfg)

            def inner(_, carry2):
                pose, _ = carry2
                H, g, (n_c, n_s, sq, n_rows) = normal_equations(
                    pose, corners, surfs, corr, scfg
                )
                H = jax.lax.psum(H, "dp")
                g = jax.lax.psum(g, "dp")
                n_c = jax.lax.psum(n_c, "dp")
                n_s = jax.lax.psum(n_s, "dp")
                sq = jax.lax.psum(sq, "dp")
                n_rows = jax.lax.psum(n_rows, "dp")
                delta, degen = solve_delta(H, g, scfg)
                pose = se3.boxplus(pose, delta)
                rms = jnp.sqrt(sq / jnp.maximum(n_rows, 1.0))
                return pose, GnStats(n_c, n_s, rms, degen)

            return jax.lax.fori_loop(0, scfg.n_inner, inner, carry)

        init = (pose0, GnStats(jnp.int32(0), jnp.int32(0), jnp.float32(0.0), jnp.bool_(False)))
        return jax.lax.fori_loop(0, scfg.n_outer, outer, init)

    return run(pose0, tuple(corners), tuple(surfs), corner_map, surf_map)


def sharded_scan_step(mesh: Mesh, state, scan, cfg: PipelineConfig):
    """Full per-scan pipeline step with the point axis sharded over the mesh.

    Same math as runtime.pipeline.process_scan, but association/GN run under
    shard_map with explicit psum, and the feature batches carry sharding
    constraints so pjit partitions the surrounding program consistently.
    Map updates are computed identically on every chip (replicated inserts of
    the small feature set), so map replicas never diverge.
    """
    from ..features.curvature import extract_features
    from ..map.hash_map import insert
    from ..geometry import so3
    from ..pointcloud.voxel import voxel_downsample
    from ..runtime.pipeline import EngineState, ScanResult, deskew_constant_velocity

    rel = se3.compose(se3.inverse(state.prev_pose), state.pose)
    pred = se3.compose(state.pose, rel)
    if cfg.deskew:
        scan = deskew_constant_velocity(scan, rel)

    feats = extract_features(scan, cfg.features)
    corners = voxel_downsample(
        feats.corners.xyz, feats.corners.mask, cfg.corner_ds_voxel, cfg.features.max_corners
    )
    surfs = voxel_downsample(
        feats.surfs.xyz, feats.surfs.mask, cfg.surf_ds_voxel, cfg.features.max_surfs
    )
    pshard = NamedSharding(mesh, P("dp"))
    corners = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, pshard), corners)
    surfs = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, pshard), surfs)

    pose_opt, stats = sharded_gn_solve(
        mesh, pred, corners, surfs, state.corner_map, state.surf_map, cfg
    )

    R = so3.quat_to_matrix(pose_opt.q)
    cmap = insert(state.corner_map, corners.xyz @ R.T + pose_opt.t, corners.mask,
                  cfg.corner_map)
    smap = insert(state.surf_map, surfs.xyz @ R.T + pose_opt.t, surfs.mask,
                  cfg.surf_map)
    new_state = EngineState(pose_opt, state.pose, cmap, smap, state.frame + 1,
                            corners, surfs)
    return new_state, ScanResult(pose_opt, stats, corners, surfs)
