#!/usr/bin/env python
"""Per-engine stage timing + speed-of-light accounting on the real chip.

Produces SOL_r{N}.md (human table) and SOL_r{N}.json (machine-readable):
  * ms/scan per pipeline stage for every engine configuration,
  * microbenchmarks of the dominant kernels with bytes/FLOP counts and the
    binding hardware resource (HBM stream, VPU, scalar core, XLA scatter),
  * achieved vs roofline for each.

v5e reference numbers (public): HBM ~819 GB/s, f32 VPU ~ (8x128 lanes x
2 flop) x 0.94 GHz ~ 1.9 TFLOP/s per core, scalar core ~0.94 G instr/s.

Run: PYTHONPATH=. python tools/profile_engines.py [round_tag]
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

HBM_GBS = 819.0
VPU_TFLOPS = 1.9
SCALAR_GIPS = 0.94

T0 = time.perf_counter()


def log(m):
    print(f"[sol +{time.perf_counter() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def make_world_scans(n, with_imu=False):
    from agi_lidar_slam_tpu.runtime.lio_pipeline import ImuWindow
    from agi_lidar_slam_tpu.sim.trajectory import circle_imu, circle_pose
    from agi_lidar_slam_tpu.sim.world import default_world, simulate_scan

    RINGS, WIDTH, SCAN_DT, M = 64, 1800, 0.1, 20
    world = default_world(seed=3, n_pillars=48, extent=35.0)
    scans, wins = [], []
    for i in range(n):
        t0, t1 = i * SCAN_DT, (i + 1) * SCAN_DT
        p0, p1 = circle_pose(t0, 8.0, 0.25), circle_pose(t1, 8.0, 0.25)
        scans.append(jax.device_put(simulate_scan(
            world, p0, p1, rings=RINGS, width=WIDTH, fov_up_deg=2.0,
            fov_down_deg=-24.8, max_range=80.0, noise_std=0.01, seed=i)))
        ts = t0 + (jnp.arange(M) + 0.5) * (SCAN_DT / M)
        gy, ac = circle_imu(ts, 8.0, 0.25)
        wins.append(jax.device_put(ImuWindow(
            gy, ac, jnp.full((M,), SCAN_DT / M), jnp.ones((M,), bool))))
    return scans, wins


def stage_odom(scans):
    """Stage timings for the odom engine (A-LOAM config)."""
    from agi_lidar_slam_tpu.config import preset_aloam_kitti64
    from agi_lidar_slam_tpu.estimators.gn_scan2map import solve_scan2map
    from agi_lidar_slam_tpu.features.curvature import extract_features
    from agi_lidar_slam_tpu.geometry import so3
    from agi_lidar_slam_tpu.map.hash_map import bound_map, insert_with_stats
    from agi_lidar_slam_tpu.pointcloud.voxel import voxel_downsample
    from agi_lidar_slam_tpu.runtime.pipeline import init_state, process_scan

    cfg = preset_aloam_kitti64()
    state = init_state(cfg)
    for s in scans[:4]:
        state, res = process_scan(state, s, cfg)
    jax.block_until_ready(res.pose.t)
    scan = scans[4]
    out = {}
    holder = {"st": state}

    def full(s):
        holder["st"], r = process_scan(holder["st"], s, cfg)
        return r.pose.t
    out["full"] = timeit(full, scan, reps=20)

    feats_fn = jax.jit(lambda s: extract_features(s, cfg.features))
    out["features"] = timeit(feats_fn, scan)
    feats = jax.block_until_ready(feats_fn(scan))

    ds_fn = jax.jit(lambda f: (
        voxel_downsample(f.corners.xyz, f.corners.mask, cfg.corner_ds_voxel,
                         cfg.features.max_corners),
        voxel_downsample(f.surfs.xyz, f.surfs.mask, cfg.surf_ds_voxel,
                         cfg.features.max_surfs)))
    out["downsample"] = timeit(ds_fn, feats)
    corners, surfs = jax.block_until_ready(ds_fn(feats))

    st = holder["st"]
    solve_fn = jax.jit(lambda p0, c, s: solve_scan2map(
        p0, c, s, st.corner_map, st.surf_map, cfg.corner_map, cfg.surf_map,
        cfg.solver))
    out["solve_scan2map"] = timeit(solve_fn, st.pose, corners, surfs)

    def ins(c, s):
        R = so3.quat_to_matrix(st.pose.q)
        cm, _ = insert_with_stats(st.corner_map, c.xyz @ R.T + st.pose.t,
                                  c.mask, cfg.corner_map)
        sm, _ = insert_with_stats(st.surf_map, s.xyz @ R.T + st.pose.t,
                                  s.mask, cfg.surf_map)
        cm = bound_map(cm, st.pose.t, cfg.bound_radius, cfg.corner_map)
        sm = bound_map(sm, st.pose.t, cfg.bound_radius, cfg.surf_map)
        return cm.occ.sum() + sm.occ.sum()
    out["map_insert+bound"] = timeit(jax.jit(ins), corners, surfs)
    return out, dict(corners=corners, surfs=surfs, state=st, cfg=cfg)


def stage_lio(scans, wins):
    from agi_lidar_slam_tpu.estimators.ieskf import update_iterated
    from agi_lidar_slam_tpu.imu.eskf import NavState
    from agi_lidar_slam_tpu.pointcloud.voxel import voxel_downsample
    from agi_lidar_slam_tpu.runtime.lio_pipeline import (
        LioConfig, _propagate_window, init_lio_state, process_lio_scan,
        undistort_to_end)
    from agi_lidar_slam_tpu.sim.trajectory import circle_velocity

    cfg = LioConfig()
    state = init_lio_state(cfg, NavState.identity()._replace(
        v=circle_velocity(0.0, 8.0, 0.25)))
    flat = [(s.xyz.reshape(-1, 3), (s.time * 0.1).reshape(-1).astype(jnp.float32),
             s.mask.reshape(-1)) for s in scans]
    for (p, tt, m), w in zip(flat[:4], wins[:4]):
        state, res = process_lio_scan(state, p, tt, m, w, cfg)
    jax.block_until_ready(res.x.p)
    (p, tt, m), w = flat[4], wins[4]
    out = {}
    holder = {"st": state}

    def full(item):
        (pp, t2, mm), ww = item
        holder["st"], r = process_lio_scan(holder["st"], pp, t2, mm, ww, cfg)
        return r.x.p
    out["full"] = timeit(full, (flat[4], wins[4]), reps=20)

    st = holder["st"]
    prop = jax.jit(lambda w_: _propagate_window(st.x, st.P, w_, cfg.noise))
    out["imu_propagate"] = timeit(prop, w)
    x_prop, P_prop, qs, ps, ts = jax.block_until_ready(prop(w))

    und = jax.jit(lambda: voxel_downsample(
        undistort_to_end(p, tt, x_prop, qs, ps, ts), m, cfg.scan_voxel,
        cfg.max_scan_pts))
    out["undistort+downsample"] = timeit(und)
    ds = jax.block_until_ready(und())

    upd = jax.jit(lambda x, P, d: update_iterated(x, P, d, st.map, cfg.map,
                                                  cfg.ieskf))
    out["ieskf_update"] = timeit(upd, x_prop, P_prop, ds)
    return out


def stage_liosam(scans, wins):
    from agi_lidar_slam_tpu.config import preset_aloam_kitti64
    from agi_lidar_slam_tpu.runtime.liosam_pipeline import (
        LioSamConfig, LioSamDriver)
    from agi_lidar_slam_tpu.runtime.slam_pipeline import SlamConfig
    from agi_lidar_slam_tpu.sim.trajectory import circle_pose, circle_velocity

    cfg = LioSamConfig(slam=SlamConfig(pipeline=preset_aloam_kitti64()),
                       scan_period=0.1)
    d = LioSamDriver(cfg, x0=circle_pose(0.0, 8.0, 0.25),
                     v0=circle_velocity(0.0, 8.0, 0.25))
    for s, w in zip(scans[:4], wins[:4]):
        res = d.process(s, w)
    jax.block_until_ready(res.pose.t)

    def full(item):
        s, w = item
        return d.process(s, w).pose.t
    return {"full": timeit(full, (scans[4], wins[4]), reps=20)}


def stage_livox(scans, wins):
    from agi_lidar_slam_tpu.features.dynamic_removal import remove_dynamic
    from agi_lidar_slam_tpu.features.livox import extract_livox_features
    from agi_lidar_slam_tpu.runtime.livox_pipeline import LivoxConfig, LivoxDriver
    from agi_lidar_slam_tpu.sim.trajectory import circle_pose

    cfg = LivoxConfig()
    d = LivoxDriver(cfg, init_frames=4, x0=circle_pose(0.0, 8.0, 0.25))
    for s, w in zip(scans[:6], wins[:6]):
        res = d.process(s, w)
    assert d.engaged
    jax.block_until_ready(res.pose.t)
    out = {}

    def full(item):
        s, w = item
        return d.process(s, w).pose.t
    out["full"] = timeit(full, (scans[6], wins[6]), reps=20)
    out["dynamic_removal"] = timeit(
        jax.jit(lambda s: remove_dynamic(s, cfg.dynamic)), scans[6])
    out["features_3class"] = timeit(
        jax.jit(lambda s: extract_livox_features(s, cfg.features)), scans[6])
    return out


def kernel_rooflines(odom_aux):
    """Microbenchmarks of the dominant kernels with bytes/flops accounting."""
    from agi_lidar_slam_tpu.config import MapConfig
    from agi_lidar_slam_tpu.estimators.gn_scan2map import (associate,
                                                           normal_equations)
    from agi_lidar_slam_tpu.map.hash_map import empty_map, insert
    from agi_lidar_slam_tpu.map.planar import build_planar, planar_lanes
    from agi_lidar_slam_tpu.nn.knn import knn

    rows = []
    cfg = MapConfig(sub_voxel=0.5, block_sub=4, log2_slots=14)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (60000, 3), minval=-40.0, maxval=40.0)
    m = insert(empty_map(cfg), pts, jnp.ones((pts.shape[0],), bool), cfg)
    tab = build_planar(m, cfg)
    N = 8192
    q = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-35.0, maxval=35.0)
    qm = jnp.ones((N,), bool)

    ms = timeit(jax.jit(lambda q: knn(m, q, qm, 5, cfg, tab=tab)), q)
    # per query: scalar probe resolve (hash ~10 + 8 probes x ~3 ops + copy
    # issue ~8) ~ 42 scalar instrs; VMEM row copies 8 x L x 4 B; selection
    # ~5 passes x (M x PW) x ~6 flops
    L = planar_lanes(cfg)
    scalar_instr = N * 8 * 42 / 4  # unroll-4 amortizes loop overhead
    vmem_bytes = N * 8 * L * 4
    sel_flops = N * 5 * 8 * 64 * 6
    t_scalar = scalar_instr / (SCALAR_GIPS * 1e9) * 1e3
    rows.append({
        "kernel": "association KNN (VMEM kernel, 8192 q, k=5)",
        "measured_ms": round(ms, 3),
        "binding_resource": "scalar core (probe resolution + copy issue)",
        "model_ms": round(t_scalar, 3),
        "pct_of_sol": round(100 * t_scalar / ms, 1),
        "notes": f"{vmem_bytes/2**20:.1f} MiB VMEM row copies, "
                 f"{sel_flops/1e6:.0f} MFLOP selection — both far below their "
                 "rooflines; the scalar issue rate is the light-speed here",
    })

    corners, surfs, st = odom_aux["corners"], odom_aux["surfs"], odom_aux["state"]
    pcfg = odom_aux["cfg"]
    corr = jax.block_until_ready(associate(
        st.pose, corners, surfs, st.corner_map, st.surf_map,
        pcfg.corner_map, pcfg.surf_map, pcfg.solver))
    ms = timeit(jax.jit(lambda p, c, s: normal_equations(p, c, s, corr, pcfg.solver)),
                st.pose, corners, surfs)
    nc = int(corners.mask.shape[0])
    ns_ = int(surfs.mask.shape[0])
    flops = nc * (9 * 6 + 3 * 6 * 6 + 18 + 120) + ns_ * (36 + 6 + 60)
    bytes_ = (nc + ns_) * (3 + 3 + 3 + 1) * 4 * 2
    t_vpu = flops / (VPU_TFLOPS * 1e12) * 1e3
    t_hbm = bytes_ / (HBM_GBS * 1e9) * 1e3
    rows.append({
        "kernel": f"GN normal equations ({nc}c+{ns_}s rows)",
        "measured_ms": round(ms, 3),
        "binding_resource": "VPU (small-row einsums)",
        "model_ms": round(max(t_vpu, t_hbm), 4),
        "pct_of_sol": round(100 * max(t_vpu, t_hbm) / ms, 1),
        "notes": f"{flops/1e6:.1f} MFLOP, {bytes_/2**20:.2f} MiB — "
                 "launch/fusion overhead dominates at these sizes; the psum "
                 "hook adds one 6x6 collective per iteration when sharded",
    })

    # XLA scatter (map insert / BEV stats): measured throughput vs HBM SoL
    Np = 115200
    seg = jax.random.randint(jax.random.PRNGKey(2), (Np,), 0, 57600)
    vals = jax.random.uniform(jax.random.PRNGKey(3), (Np,))
    ms = timeit(jax.jit(lambda v, s: jax.ops.segment_min(v, s, num_segments=57601)),
                vals, seg)
    bytes_ = Np * 8 + 57601 * 4
    t_hbm = bytes_ / (HBM_GBS * 1e9) * 1e3
    rows.append({
        "kernel": f"XLA scatter-min ({Np} pts -> 57k cells)",
        "measured_ms": round(ms, 3),
        "binding_resource": "XLA scatter lowering (serialized updates)",
        "model_ms": round(t_hbm, 4),
        "pct_of_sol": round(100 * t_hbm / ms, 1),
        "notes": "the one op-class far off roofline; engines minimize scatter "
                 "count (one stats scatter per class, decimated stats, "
                 "cell-space cluster stats) rather than fight the lowering",
    })
    return rows


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r04"
    log(f"devices: {jax.devices()}")
    scans, wins = make_world_scans(8)
    log("sim ready")

    engines = {}
    engines["odom"], odom_aux = stage_odom(scans)
    log(f"odom: {engines['odom']}")
    engines["lio"] = stage_lio(scans, wins)
    log(f"lio: {engines['lio']}")
    engines["liosam"] = stage_liosam(scans, wins)
    log(f"liosam: {engines['liosam']}")
    engines["livox"] = stage_livox(scans, wins)
    log(f"livox: {engines['livox']}")
    kernels = kernel_rooflines(odom_aux)
    log("kernels done")

    payload = {"engines_ms_per_scan": engines, "kernel_rooflines": kernels,
               "hw": {"hbm_gbs": HBM_GBS, "vpu_tflops_f32": VPU_TFLOPS,
                      "scalar_gips": SCALAR_GIPS},
               "scan_scale": "64x1800 (HDL-64)"}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, f"SOL_{tag}.json"), "w") as f:
        json.dump(payload, f, indent=1)

    lines = [
        f"# SOL_{tag} — per-stage timing and speed-of-light accounting",
        "",
        "Measured on the one real TPU v5e chip (64x1800 scan scale, the bench",
        "operating point). `full` is the fused per-scan engine step; stages are",
        "separately-jitted sub-programs over the same tensors, so their sum",
        "exceeds `full` (XLA overlaps/fuses them in the real program).",
        "",
        "## Stage breakdown (ms/scan)",
        "",
    ]
    for eng, st in engines.items():
        lines.append(f"### {eng}")
        lines.append("")
        lines.append("| stage | ms |")
        lines.append("|---|---|")
        for k, v in st.items():
            lines.append(f"| {k} | {v:.2f} |")
        lines.append("")
    lines += [
        "## Dominant-kernel rooflines",
        "",
        "| kernel | measured ms | binding resource | model ms | % of SoL | notes |",
        "|---|---|---|---|---|---|",
    ]
    for r in kernels:
        lines.append(
            f"| {r['kernel']} | {r['measured_ms']} | {r['binding_resource']} | "
            f"{r['model_ms']} | {r['pct_of_sol']} | {r['notes']} |")
    lines += [
        "",
        "## Reading",
        "",
        "- The association kernel runs at the SCALAR core's issue rate — its",
        "  VMEM traffic and selection FLOPs are each far below their rooflines.",
        "  Further light-speed requires amortizing probe resolution across",
        "  spatially-coherent queries, not more bandwidth.",
        "- The GN/IESKF linearizations are launch-bound at these row counts;",
        "  their arithmetic is negligible against the VPU roofline, which is",
        "  why the candidate-cache + analytic-Jacobian work targeted pass",
        "  COUNTS, not FLOPs.",
        "- XLA's scatter lowering is the one primitive ~two orders off",
        "  roofline; the engines design around it (hashed claim inserts,",
        "  decimated stats, cell-space reductions) instead of through it.",
    ]
    with open(os.path.join(root, f"SOL_{tag}.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(payload)[:400])
    log("wrote SOL files")


if __name__ == "__main__":
    main()
