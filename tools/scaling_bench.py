#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.md: >=70% frames/s efficiency at 2+
workers; measurement points 1 chip / 1 host / N hosts).

Measures the sharded scan-to-map GN solve (the per-scan hot path) at device
counts 1..N on whatever backend is available:
* on a multi-chip TPU slice this is the real number;
* on CPU it uses virtual devices (XLA_FLAGS=--xla_force_host_platform_device_count)
  to validate the collective structure and report the overhead trend (virtual
  devices share cores, so CPU "efficiency" is a lower bound on real scaling).

Prints one JSON line per device count + a summary efficiency figure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None,
                    help="max device count (default: all)")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU with 8 virtual devices")
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: hold PER-DEVICE work constant by "
                         "growing the point budget with the device count. On "
                         "a real slice, perfect scaling = flat time. On "
                         "virtual CPU devices the TOTAL work grows n-fold "
                         "over fixed cores, so the interpretable quantity is "
                         "t_n / (n * t_1) ~= per-device-program-time ratio — "
                         "the number strong-scaling wall time cannot give "
                         "when devices share cores")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from agi_lidar_slam_tpu.config import preset_sim16
    from agi_lidar_slam_tpu.features.curvature import extract_features
    from agi_lidar_slam_tpu.geometry import se3
    from agi_lidar_slam_tpu.map.hash_map import empty_map, insert
    from agi_lidar_slam_tpu.parallel.sharding import replicate, sharded_gn_solve
    from agi_lidar_slam_tpu.pointcloud.voxel import voxel_downsample
    from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

    cfg = preset_sim16()
    world = default_world(seed=0)
    p = se3.Pose.identity()
    scan = simulate_scan(world, p, p, rings=16, width=900)
    feats = extract_features(scan, cfg.features)
    corners = voxel_downsample(feats.corners.xyz, feats.corners.mask,
                               cfg.corner_ds_voxel, cfg.features.max_corners)
    surfs = voxel_downsample(feats.surfs.xyz, feats.surfs.mask,
                             cfg.surf_ds_voxel, cfg.features.max_surfs)
    cmap = insert(empty_map(cfg.corner_map), corners.xyz, corners.mask, cfg.corner_map)
    smap = insert(empty_map(cfg.surf_map), surfs.xyz, surfs.mask, cfg.surf_map)

    from agi_lidar_slam_tpu.pointcloud.cloud import PointBatch

    def tile_n(pb, n):
        # n copies of every point: per-device shard == the 1-device problem.
        # GN is invariant to duplicating all points (H and g both scale by n)
        return PointBatch(jnp.tile(pb.xyz, (n, 1)), jnp.tile(pb.mask, (n,)))

    all_devs = jax.devices()
    n_max = args.devices or len(all_devs)
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_max]
    results = {}
    import functools

    for n in counts:
        mesh = Mesh(all_devs[:n], axis_names=("dp",))
        c = replicate(tile_n(corners, n) if args.weak else corners, mesh)
        s = replicate(tile_n(surfs, n) if args.weak else surfs, mesh)
        cm = replicate(cmap, mesh)
        sm = replicate(smap, mesh)
        p0 = replicate(p, mesh)

        # jit ONCE per device count: rebuilding the shard_map closure per
        # call retraces/recompiles every rep, so earlier revisions measured
        # COMPILE time, not step time (SCALING_r02's numbers carry that bug;
        # its caveat about virtual devices still applies here)
        step = jax.jit(functools.partial(sharded_gn_solve, mesh, cfg=cfg))

        out, _ = step(p0, c, s, cm, sm)
        float(out.t[0])  # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out, _ = step(p0, c, s, cm, sm)
        float(out.t[0])
        dt = (time.perf_counter() - t0) / args.reps
        results[n] = dt
        print(json.dumps({"devices": n, "gn_solve_ms": round(dt * 1e3, 2)}))

    if len(results) > 1:
        base = results[counts[0]]
        last = counts[-1]
        if args.weak:
            # perfect weak scaling = flat time (real slice); on virtual CPU
            # devices the honest per-device-program-time ratio divides out
            # the n-fold total work squeezed onto fixed cores
            print(json.dumps({
                "metric": "gn_weak_scaling_flatness",
                "value": round(base / results[last], 3),
                "per_device_time_ratio_virtual":
                    round(results[last] / (last * base), 3),
                "from_devices": counts[0], "to_devices": last,
                "note": "flatness ~1.0 = perfect on a real slice; on virtual "
                        "CPU devices use per_device_time_ratio_virtual "
                        "(~1.0 = no per-device overhead growth)",
            }))
        else:
            eff = (base / results[last]) / (last / counts[0])
            print(json.dumps({
                "metric": "gn_scaling_efficiency",
                "value": round(eff, 3),
                "from_devices": counts[0], "to_devices": last,
                "note": "virtual-CPU devices share cores; real-slice numbers are higher",
            }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
