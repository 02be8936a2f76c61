#!/usr/bin/env python
"""Per-engine stage timing + speed-of-light accounting on the real chip.

Produces SOL_r{N}.md (human table) and SOL_r{N}.json (machine-readable):
  * ms/scan per pipeline stage for EVERY engine configuration (incl. slam
    and liosam — VERDICT r4 weak #4),
  * microbenchmarks of the dominant kernels with bytes/FLOP counts and the
    binding hardware resource (HBM stream, VPU, scalar core, XLA scatter),
  * achieved vs roofline for each, plus an honest MFU-style per-engine
    summary (counted useful FLOPs vs chip peak).

Timing method: QUEUED — each sample dispatches `reps` calls and fetches one
device scalar at the end. jax.block_until_ready is unreliable over the axon
tunnel and a per-call fetch adds the multi-ms tunnel round-trip to every
sample (the r4 SOL numbers carried that bias: its livox dynamic_removal
"13.1 ms" was ~6 ms of device time + fetch latency). Queued samples match
what bench.py and the engines actually pay.

v5e reference numbers (public): HBM ~819 GB/s, f32 VPU ~ (8x128 lanes x
2 flop) x 0.94 GHz ~ 1.9 TFLOP/s per core, scalar core ~0.94 G instr/s,
bf16 MXU ~394 TFLOP/s.

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
MXU_BF16_TFLOPS = 394.0

T0 = time.perf_counter()


def log(m):
    print(f"[sol +{time.perf_counter() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def _fetch(out):
    """One scalar off the device = a true pipeline barrier on the tunnel."""
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


_RTT = {"ms": None}


def _tunnel_rtt():
    """Median round-trip of a trivial compute + scalar fetch (~25 ms on the
    axon tunnel) — the constant each timing batch pays exactly once."""
    if _RTT["ms"] is None:
        x = jnp.float32(1.0) + 1.0
        _fetch(x)
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            _fetch(x + (i + 2))
            ts.append(time.perf_counter() - t0)
        _RTT["ms"] = sorted(ts)[2] * 1e3
    return _RTT["ms"]


def timeit(fn, *args, reps=30):
    """Queued ms/call: dispatch `reps` calls, one end fetch (minus the
    measured tunnel RTT that fetch costs); best of 2 runs (the tunnel
    occasionally stalls a dispatch batch)."""
    rtt = _tunnel_rtt()
    out = fn(*args)
    _fetch(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _fetch(out)
        best = min(best, ((time.perf_counter() - t0) * 1e3 - rtt) / reps)
    # floor at 1 us: ops faster than the RTT-noise floor report as ~0 and
    # would otherwise divide roofline percentages by zero
    return round(max(best, 1e-3), 3)


def make_world_scans(n):
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
    _fetch(res.pose.t)
    scan = scans[4]
    out = {}
    holder = {"st": state}

    def full(s):
        holder["st"], r = process_scan(holder["st"], s, cfg)
        return r.pose.t
    out["full"] = timeit(full, scan, reps=20)

    feats_fn = jax.jit(lambda s: extract_features(s, cfg.features))
    out["features"] = timeit(feats_fn, scan)
    feats = feats_fn(scan)

    ds_fn = jax.jit(lambda f: (
        voxel_downsample(f.corners.xyz, f.corners.mask, cfg.corner_ds_voxel,
                         cfg.features.max_corners),
        voxel_downsample(f.surfs.xyz, f.surfs.mask, cfg.surf_ds_voxel,
                         cfg.features.max_surfs)))
    out["downsample"] = timeit(ds_fn, feats)
    corners, surfs = ds_fn(feats)

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


def stage_slam(scans):
    """SLAM driver stages: the fused odometry+keyframe step and the loop-
    detection cadence step (VERDICT r4: slam was absent from SOL_r04)."""
    from agi_lidar_slam_tpu.config import preset_aloam_kitti64
    from agi_lidar_slam_tpu.runtime.slam_pipeline import (SlamConfig,
                                                          SlamDriver,
                                                          _detect_step,
                                                          _slam_step)

    cfg = SlamConfig(pipeline=preset_aloam_kitti64())
    d = SlamDriver(cfg)
    for s in scans[:4]:
        res = d.process(s)
    _fetch(res.pose.t)
    out = {}

    # cycle DISTINCT scans: repeating one scan makes every keyframe
    # identical, so loop detection fires and the timing measures repeated
    # loop closures instead of the steady state
    cyc = {"i": 0}

    def full(_):
        cyc["i"] += 1
        return d.process(scans[4 + cyc["i"] % 4]).pose.t
    out["full"] = timeit(full, None, reps=20)

    # detect BEFORE the step timing: _slam_step donates its state, which
    # deletes the bank buffers a later detect closure would have captured
    det = jax.jit(lambda bank: _detect_step(bank, cfg))
    out["loop_detect"] = timeit(det, d.state.bank)

    holder = {"st": d.state}

    def step(_):
        cyc["i"] += 1
        holder["st"], r, _, _, _ = _slam_step(
            holder["st"], scans[4 + cyc["i"] % 4], cfg)
        return r.pose.t
    out["odometry+keyframe"] = timeit(step, None, reps=20)
    return out


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
    _fetch(res.x.p)
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
    x_prop, P_prop, qs, ps, ts = prop(w)

    und = jax.jit(lambda: voxel_downsample(
        undistort_to_end(p, tt, x_prop, qs, ps, ts), m, cfg.scan_voxel,
        cfg.max_scan_pts))
    out["undistort+downsample"] = timeit(und)
    ds = und()

    upd = jax.jit(lambda x, P, d: update_iterated(x, P, d, st.map, cfg.map,
                                                  cfg.ieskf))
    out["ieskf_update"] = timeit(upd, x_prop, P_prop, ds)
    aux = dict(x_prop=x_prop, P_prop=P_prop, ds=ds, st=st, cfg=cfg,
               ieskf_ms=out["ieskf_update"])
    return out, aux


def stage_liosam(scans, wins):
    """LIO-SAM driver stages (VERDICT r4: liosam had only a `full` number)."""
    from agi_lidar_slam_tpu.config import preset_aloam_kitti64
    from agi_lidar_slam_tpu.estimators.gn_scan2map import solve_scan2map
    from agi_lidar_slam_tpu.features.curvature import extract_features
    from agi_lidar_slam_tpu.imu.preintegration import preintegrate
    from agi_lidar_slam_tpu.pointcloud.voxel import voxel_downsample
    from agi_lidar_slam_tpu.runtime.liosam_pipeline import (LioSamConfig,
                                                            LioSamDriver,
                                                            deskew_with_imu)
    from agi_lidar_slam_tpu.runtime.slam_pipeline import SlamConfig
    from agi_lidar_slam_tpu.sim.trajectory import circle_pose, circle_velocity

    cfg = LioSamConfig(slam=SlamConfig(pipeline=preset_aloam_kitti64()),
                       scan_period=0.1)
    d = LioSamDriver(cfg, x0=circle_pose(0.0, 8.0, 0.25),
                     v0=circle_velocity(0.0, 8.0, 0.25))
    for s, w in zip(scans[:4], wins[:4]):
        res = d.process(s, w)
    _fetch(res.pose.t)
    out = {}

    cyc = {"i": 0}  # distinct scans: see stage_slam

    def full(_):
        cyc["i"] += 1
        j = 4 + cyc["i"] % 4
        return d.process(scans[j], wins[j]).pose.t
    out["full"] = timeit(full, None, reps=20)

    st = d.state
    pcfg = cfg.slam.pipeline
    w = wins[4]
    pre_fn = jax.jit(lambda w_: preintegrate(
        w_.gyro, w_.acc, jnp.where(w_.mask, w_.dt, 0.0), w_.mask,
        st.bg, st.ba, cfg.imu_noise).dp)
    out["imu_preintegrate"] = timeit(pre_fn, w)

    def desk_feat(s, w_):
        sc = deskew_with_imu(s, w_, st.bg, st.v, cfg.scan_period)
        f = extract_features(sc, pcfg.features)
        return (voxel_downsample(f.corners.xyz, f.corners.mask,
                                 pcfg.corner_ds_voxel, pcfg.features.max_corners),
                voxel_downsample(f.surfs.xyz, f.surfs.mask,
                                 pcfg.surf_ds_voxel, pcfg.features.max_surfs))
    df = jax.jit(desk_feat)
    out["deskew+features+downsample"] = timeit(df, scans[4], w)
    corners, surfs = df(scans[4], w)
    eng = st.engine
    solve_fn = jax.jit(lambda c, s: solve_scan2map(
        eng.pose, c, s, eng.corner_map, eng.surf_map,
        pcfg.corner_map, pcfg.surf_map, pcfg.solver)[0].t)
    out["solve_scan2map"] = timeit(solve_fn, corners, surfs)
    return out


def stage_livox(scans, wins):
    from agi_lidar_slam_tpu.estimators.window_map import solve_window
    from agi_lidar_slam_tpu.features.dynamic_removal import remove_dynamic
    from agi_lidar_slam_tpu.features.livox import extract_livox_features
    from agi_lidar_slam_tpu.imu.preintegration import preintegrate
    from agi_lidar_slam_tpu.runtime.livox_pipeline import (LivoxConfig,
                                                           LivoxDriver)
    from agi_lidar_slam_tpu.sim.trajectory import circle_pose

    cfg = LivoxConfig()
    d = LivoxDriver(cfg, init_frames=4, x0=circle_pose(0.0, 8.0, 0.25))
    for s, w in zip(scans[:6], wins[:6]):
        res = d.process(s, w)
    assert d.engaged
    _fetch(res.pose.t)
    out = {}

    def full(item):
        s, w = item
        return d.process(s, w).pose.t
    out["full"] = timeit(full, (scans[6], wins[6]), reps=20)
    out["dynamic_removal"] = timeit(
        jax.jit(lambda s: remove_dynamic(s, cfg.dynamic)), scans[6])
    out["features_3class"] = timeit(
        jax.jit(lambda s: extract_livox_features(s, cfg.features)), scans[6])

    st = d.state
    w = wins[6]
    pre = preintegrate(w.gyro, w.acc, jnp.where(w.mask, w.dt, 0.0), w.mask,
                       st.ws.bg[1], st.ws.ba[1], cfg.imu_noise)
    preints = jax.tree.map(lambda x: x[None], pre)

    def solve_only():
        ws_opt, resid, H, b = solve_window(
            st.ws, st.corners, st.surfs, st.corner_map, st.surf_map, preints,
            st.prior, st.grav, cfg.corner_map, cfg.surf_map, cfg.solver,
            cfg.lidar_weight, others=st.others, other_map=st.other_map,
            omap_cfg=cfg.other_map, nonfeature_weight=cfg.nonfeature_weight)
        return ws_opt.t
    sw_ms = timeit(jax.jit(solve_only))
    out["window_solve"] = sw_ms
    aux = dict(solve_ms=sw_ms)
    return out, aux


def kernel_rooflines(odom_aux, lio_aux, livox_aux):
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
    # per (query, octant): scalar probe resolve with PREFETCHED hash base
    # (load key + base ~6 + 8 probes x ~3 ops + copy issue ~8) ~ 38 scalar
    # instrs, unroll-4 amortized; the lane-space selection overlaps with the
    # next tile's copy loop (Mosaic pipelines grid steps), so the scalar
    # issue stream is the floor
    L = planar_lanes(cfg)
    scalar_instr = N * 8 * 38 / 4
    vmem_bytes = N * 8 * L * 4
    sel_flops = N * 5 * 8 * 64 * 6
    t_scalar = scalar_instr / (SCALAR_GIPS * 1e9) * 1e3
    rows.append({
        "kernel": "association KNN (VMEM kernel, 8192 q, k=5)",
        "measured_ms": ms,
        "binding_resource": "scalar core (probe resolution + copy issue)",
        "model_ms": round(t_scalar, 3),
        "pct_of_sol": round(100 * t_scalar / ms, 1),
        "notes": f"{vmem_bytes/2**20:.1f} MiB VMEM row copies, "
                 f"{sel_flops/1e6:.0f} MFLOP selection; r5: lane-space "
                 "selection + prefetched probe bases took 4.16 -> ~2.0 ms "
                 "(2.1x); run-dedup via lax.cond was a measured dead end "
                 "(branch cost > probe savings: 4.0 -> 5.0 ms at 0% dup, "
                 "5.1 ms at the production ~22% dup rate)",
    })

    corners, surfs, st = odom_aux["corners"], odom_aux["surfs"], odom_aux["state"]
    pcfg = odom_aux["cfg"]
    corr = associate(st.pose, corners, surfs, st.corner_map, st.surf_map,
                     pcfg.corner_map, pcfg.surf_map, pcfg.solver)
    corr = jax.tree.map(lambda x: x, corr)
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
        "measured_ms": ms,
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
        "measured_ms": ms,
        "binding_resource": "XLA scatter lowering (serialized updates)",
        "model_ms": round(t_hbm, 4),
        "pct_of_sol": round(100 * t_hbm / ms, 1),
        "notes": "the one op-class far off roofline; engines minimize scatter "
                 "count (one stats scatter per class, cell-space cluster "
                 "stats) rather than fight the lowering",
    })

    # one-hot matmul gather (dynamic_removal's per-point verdict): 115k
    # 2-channel lookups from a (200,200) image as an MXU matmul
    G, Np2 = 200, 115200
    cxg = jax.random.randint(jax.random.PRNGKey(4), (Np2,), 0, G)
    cyg = jax.random.randint(jax.random.PRNGKey(5), (Np2,), 0, G)
    tab2 = jax.random.uniform(jax.random.PRNGKey(6), (G, 2 * G))

    def oh_gather(cx, cy, t2):
        ar = jnp.arange(G, dtype=jnp.int32)
        ohx = (cx[:, None] == ar[None, :]).astype(jnp.bfloat16)
        cols = (ohx @ t2.astype(jnp.bfloat16)).astype(jnp.float32)
        ohy = cy[:, None] == ar[None, :]
        return (jnp.sum(jnp.where(ohy, cols[:, :G], 0.0), axis=1)
                + jnp.sum(jnp.where(ohy, cols[:, G:], 0.0), axis=1))
    ms = timeit(jax.jit(oh_gather), cxg, cyg, tab2)
    flops_mm = 2 * Np2 * G * 2 * G
    bytes_oh = Np2 * (G * 2 + 2 * G * 4 + 2 * G * 4) + Np2 * 4  # bf16 ohx + f32 cols rd/wr
    t_mxu = flops_mm / (MXU_BF16_TFLOPS * 1e12) * 1e3
    t_hbm = bytes_oh / (HBM_GBS * 1e9) * 1e3
    rows.append({
        "kernel": f"one-hot matmul gather ({Np2} pts, 2ch from {G}x{G})",
        "measured_ms": ms,
        "binding_resource": "HBM ((N, 2G) intermediate stream)",
        "model_ms": round(max(t_mxu, t_hbm), 3),
        "pct_of_sol": round(100 * max(t_mxu, t_hbm) / ms, 1),
        "notes": f"{flops_mm/1e9:.1f} GFLOP ride the MXU "
                 f"({t_mxu*1e3:.0f} us); 2.2x faster than XLA's native "
                 "serialized gather at this size — dynamic_removal's "
                 "point-verdict path",
    })

    # IESKF iterated update (lio's dominant stage): measured vs an assembled
    # model — one cand probe (kernel scalar model at its query count) + 4
    # re-rank/linearize iterations (VPU)
    ds = lio_aux["ds"]
    nq = int(ds.mask.shape[0])
    cand_probe = nq * 8 * 38 / 4 / (SCALAR_GIPS * 1e9) * 1e3
    # per iteration: reselect (8 cand x ~8 ops) + plane refit (~120 flops) +
    # H row assembly (~60) per point, 4 iterations
    it_flops = 4 * nq * (8 * 8 + 120 + 60)
    t_vpu = it_flops / (VPU_TFLOPS * 1e12) * 1e3
    model = cand_probe + t_vpu
    ms = lio_aux["ieskf_ms"]
    rows.append({
        "kernel": f"IESKF iterated update ({nq} pts, 4 iters, cand_k=8)",
        "measured_ms": ms,
        "binding_resource": "scalar core (one cand probe) + VPU (re-ranks)",
        "model_ms": round(model, 3),
        "pct_of_sol": round(100 * model / ms, 1),
        "notes": "model = one kernel probe at this query count + 4 "
                 "re-rank/refit/linearize passes; the 24-dim Cholesky solves "
                 "are noise at these sizes",
    })

    # livox window solve: measured vs assembled model (3 feature classes'
    # probes + n_outer re-linearizations on ~3k rows)
    rows.append({
        "kernel": "livox window MAP solve (2 frames, 3 classes)",
        "measured_ms": livox_aux["solve_ms"],
        "binding_resource": "scalar core (3 class probes) + VPU",
        "model_ms": round(3 * 4096 * 8 * 38 / 4 / (SCALAR_GIPS * 1e9) * 1e3, 3),
        "pct_of_sol": round(100 * (3 * 4096 * 8 * 38 / 4 / (SCALAR_GIPS * 1e9) * 1e3)
                            / max(livox_aux["solve_ms"], 1e-9), 1),
        "notes": "model = the three candidate probes alone (corner/surf/"
                 "non-feature at ~4k queries each); window assembly, IMU "
                 "factor and the 30-dim solve ride the VPU within it",
    })
    for r in rows:
        if r["measured_ms"] <= 0.001:
            # clamped at the timing floor: the op is below the RTT noise
            # floor, a SoL percentage would be meaningless
            r["pct_of_sol"] = None
            r["notes"] += " [measured below the queued-timing noise floor]"
    return rows


def mfu_summary(engines):
    """Honest MFU-style accounting: counted useful FLOPs per scan vs chip
    peak. SLAM association/solve work is selection- and scatter-shaped, not
    matmul-shaped — the useful-FLOP fraction of peak is intrinsically tiny,
    which is WHY the per-kernel binding-resource rooflines above are the
    meaningful speed-of-light; this table records it anyway (VERDICT r4)."""
    # rough per-scan useful-FLOP counts at the 64x1800 operating point
    flops = {
        "odom": 2.2e8,   # features 1e8 + assoc selection 0.8e8 + GN 0.4e8
        "slam": 2.4e8,   # odom + keyframe/detect overhead
        "lio": 1.9e8,    # propagate + undistort + 4 iterated updates
        "liosam": 2.6e8,  # deskew + features + solve + fusion
        "livox": 3.1e8,  # dyn-removal (incl 9.2e9 bf16 gather matmul) + 3-class
    }
    out = {}
    for name, eng in engines.items():
        ms = eng.get("full")
        if ms is None or name not in flops:
            continue
        achieved = flops[name] / (ms * 1e-3)
        out[name] = {
            "ms_per_scan": ms,
            "useful_gflops_per_scan": round(flops[name] / 1e9, 2),
            "achieved_gflops": round(achieved / 1e9, 1),
            "mfu_pct_of_f32_vpu_peak": round(100 * achieved / (VPU_TFLOPS * 1e12), 2),
            "pct_of_100ms_realtime_budget": round(ms, 1),
        }
    return out


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r05"
    log(f"devices: {jax.devices()}")
    scans, wins = make_world_scans(8)
    log("sim ready")

    engines = {}
    engines["odom"], odom_aux = stage_odom(scans)
    log(f"odom: {engines['odom']}")
    engines["slam"] = stage_slam(scans)
    log(f"slam: {engines['slam']}")
    engines["lio"], lio_aux = stage_lio(scans, wins)
    log(f"lio: {engines['lio']}")
    engines["liosam"] = stage_liosam(scans, wins)
    log(f"liosam: {engines['liosam']}")
    engines["livox"], livox_aux = stage_livox(scans, wins)
    log(f"livox: {engines['livox']}")
    kernels = kernel_rooflines(odom_aux, lio_aux, livox_aux)
    log("kernels done")
    mfu = mfu_summary(engines)

    payload = {"engines_ms_per_scan": engines, "kernel_rooflines": kernels,
               "mfu_summary": mfu,
               "hw": {"hbm_gbs": HBM_GBS, "vpu_tflops_f32": VPU_TFLOPS,
                      "scalar_gips": SCALAR_GIPS,
                      "mxu_bf16_tflops": MXU_BF16_TFLOPS},
               "scan_scale": "64x1800 (HDL-64)",
               "timing": "queued (reps dispatched, one end fetch); r4's "
                         "per-stage numbers carried the tunnel's per-fetch "
                         "round-trip and read high"}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, f"SOL_{tag}.json"), "w") as f:
        json.dump(payload, f, indent=1)

    lines = [
        f"# SOL_{tag} — per-stage timing and speed-of-light accounting",
        "",
        "Measured on the one real TPU v5e chip (64x1800 scan scale, the bench",
        "operating point). `full` is the fused per-scan engine step; stages are",
        "separately-jitted sub-programs over the same tensors, so their sum",
        "can exceed `full` (XLA overlaps/fuses them in the real program).",
        "Timing is QUEUED (reps dispatched, one end fetch): r4's stage numbers",
        "included a per-sample tunnel round-trip and read several ms high.",
        "",
        "## Stage breakdown (ms/scan)",
        "",
    ]
    for name, st in engines.items():
        lines += [f"### {name}", "", "| stage | ms |", "|---|---|"]
        lines += [f"| {k} | {v} |" for k, v in st.items()]
        lines.append("")
    lines += ["## Dominant-kernel rooflines", "",
              "| kernel | measured ms | binding resource | model ms | % of SoL | notes |",
              "|---|---|---|---|---|---|"]
    for r in kernels:
        lines.append(
            f"| {r['kernel']} | {r['measured_ms']} | {r['binding_resource']} |"
            f" {r['model_ms']} | {r['pct_of_sol']} | {r['notes']} |")
    lines += ["", "## MFU summary (per engine)", "",
              "| engine | ms/scan | useful GFLOP/scan | achieved GFLOP/s | % of f32 VPU peak |",
              "|---|---|---|---|---|"]
    for name, r in mfu.items():
        lines.append(
            f"| {name} | {r['ms_per_scan']} | {r['useful_gflops_per_scan']} |"
            f" {r['achieved_gflops']} | {r['mfu_pct_of_f32_vpu_peak']} |")
    lines += [
        "",
        "## Reading",
        "",
        "- SLAM association/solve work is selection- and scatter-shaped, not",
        "  matmul-shaped: the useful-FLOP fraction of chip peak is",
        "  intrinsically sub-1%, which is why the per-kernel rooflines with",
        "  the BINDING resource named (scalar issue / HBM / XLA scatter",
        "  lowering) are the meaningful speed-of-light accounting.",
        "- The association kernel runs at the SCALAR core's issue rate; r5's",
        "  lane-space selection + prefetched probe bases doubled it, and the",
        "  remaining gap to model is loop bookkeeping + the dynamic-row copy",
        "  issue the probe stream serializes on.",
        "- XLA's scatter lowering remains ~two orders off roofline; the",
        "  engines design around it (hashed claim inserts, cell-space",
        "  reductions, the one-hot matmul gather replacing 115k-wide native",
        "  gathers in dynamic removal).",
    ]
    with open(os.path.join(root, f"SOL_{tag}.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    log(f"wrote SOL_{tag}.json / SOL_{tag}.md")


if __name__ == "__main__":
    main()
