"""Integrated LIO-SAM configuration: tightly-coupled IMU odometry + scan-to-map
+ keyframe factor graph, in one engine, plus the IMU-rate pose stream.

Re-designs the reference's four-process feedback loop (SURVEY.md section 3.2):

* imageProjection IMU deskew (imageProjection.cpp:346-604): gyro rotation
  track over the sweep + constant-velocity translation, vectorized per point;
* mapOptmization scan-to-map GN with degeneracy detection
  (mapOptmization.cpp:1303-1742) — `solve_scan2map`;
* imuPreintegration's per-scan two-node factor graph {prior, ImuFactor, bias
  BetweenFactor, pose prior with degenerate-covariance switch}
  (imuPreintegration.cpp:336-570): solving that graph with the previous state
  marginalized IS a Kalman update of the 15-dim error state
  [dtheta, dv, dp, dbg, dba] with the mapping pose as a 6-dof measurement —
  implemented exactly so (predict with the preintegration covariance, Joseph
  update, measurement noise inflated when the mapping solve was degenerate,
  imuPreintegration.cpp:354,503);
* TransformFusion / imuHandler re-predict (imuPreintegration.cpp:607-659,
  transformFusion.cpp:35-288): `imu_rate_poses` composes the latest fused
  state with per-sample IMU integration -> poses at IMU rate (500 Hz class);
* the keyframe bank / loop closure / GPS / correctPoses backend is shared
  with `slam_pipeline` (LioSamDriver below).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig, preset_aloam_kitti64
from ..estimators.gn_scan2map import solve_scan2map
from ..features.curvature import extract_features
from ..geometry import se3, so3
from ..imu.preintegration import ImuNoise, Preintegrated, preintegrate
from ..map.hash_map import bound_map, insert_with_stats
from ..pointcloud.cloud import PointBatch, ScanGrid
from ..pointcloud.voxel import voxel_downsample
from .lio_pipeline import ImuWindow
from .pipeline import EngineState, ScanResult, init_state
from ..graph.loop_closure import detect_loop
from .slam_pipeline import (
    SlamConfig,
    _align_step,
    _correct_and_rebuild,
    _detect_step,
    _gps_edge,
    _gps_fix,
    _keyframe_step,
    _keyframe_step_body,
)


@dataclasses.dataclass(frozen=True)
class LioSamConfig:
    slam: SlamConfig = SlamConfig(pipeline=preset_aloam_kitti64())
    imu_noise: ImuNoise = ImuNoise()
    scan_period: float = 0.1  # sweep duration (s): scan.time in [0,1) scales by this
    # pose-measurement noise of the scan-to-map solve (imuPreintegration.cpp:
    # 287-289 correctionNoise / correctionNoise2 switch)
    meas_sigma_rot: float = 0.05
    meas_sigma_trans: float = 0.05
    degen_sigma_rot: float = 1.0  # inflated when GN reported degeneracy
    degen_sigma_trans: float = 1.0
    deskew: bool = True


class LioSamState(NamedTuple):
    engine: EngineState  # mapping pose + maps + previous features
    v: jnp.ndarray  # (3,) world velocity
    bg: jnp.ndarray
    ba: jnp.ndarray
    P: jnp.ndarray  # (15,15) error cov [dtheta, dv, dp, dbg, dba]
    grav: jnp.ndarray


class LioSamResult(NamedTuple):
    pose: se3.Pose  # fused pose at sweep end
    stats: object  # GnStats of the mapping solve
    corners: PointBatch
    surfs: PointBatch
    n_dropped: jnp.ndarray
    v: jnp.ndarray


def init_liosam_state(cfg: LioSamConfig, x0: se3.Pose | None = None,
                      v0: jnp.ndarray | None = None,
                      bg0: jnp.ndarray | None = None,
                      ba0: jnp.ndarray | None = None,
                      grav: jnp.ndarray | None = None) -> LioSamState:
    eng = init_state(cfg.slam.pipeline)
    if x0 is not None:
        x0c = jax.tree.map(jnp.array, x0)
        eng = eng._replace(pose=x0, prev_pose=x0c)
    return LioSamState(
        engine=eng,
        v=v0 if v0 is not None else jnp.zeros(3),
        bg=bg0 if bg0 is not None else jnp.zeros(3),
        ba=ba0 if ba0 is not None else jnp.zeros(3),
        P=jnp.eye(15, dtype=jnp.float32) * 1e-2,
        grav=grav if grav is not None else jnp.asarray([0.0, 0.0, -9.81]),
    )


def _gyro_track(imu: ImuWindow, bg: jnp.ndarray):
    """Integrate bias-corrected gyro over the window. Returns (qs (M+1,4)
    rotations from window start, ts (M+1,) cumulative times)."""
    dts = jnp.where(imu.mask, imu.dt, 0.0)

    def step(q, inp):
        w, dt = inp
        q2 = so3.quat_normalize(so3.quat_mul(q, so3.quat_exp((w - bg) * dt)))
        return q2, q2

    _, qs = jax.lax.scan(step, so3.quat_identity(), (imu.gyro, dts))
    qs = jnp.concatenate([so3.quat_identity()[None], qs], axis=0)
    ts = jnp.concatenate([jnp.zeros(1), jnp.cumsum(dts)])
    return qs, ts


def deskew_with_imu(scan: ScanGrid, imu: ImuWindow, bg: jnp.ndarray,
                    v_body: jnp.ndarray, scan_period: float) -> ScanGrid:
    """IMU deskew: gyro rotation track + constant-velocity translation (the
    deskewPoint split of LIO-SAM imageProjection: imuDeskewInfo rotation
    :346-400 + odomDeskewInfo translation :406-482). Points map into the
    sweep-END frame (this engine estimates sweep-end poses, so one IMU window
    serves both deskew and prediction — the reference needs two processes and
    a feedback topic for the same bookkeeping)."""
    qs, ts = _gyro_track(imu, bg)
    tau = (scan.time * scan_period).reshape(-1)
    idx = jnp.clip(jnp.searchsorted(ts, tau, side="right"), 1, ts.shape[0] - 1)
    t0 = ts[idx - 1]
    t1 = ts[idx]
    s = jnp.clip((tau - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    q_t = so3.slerp(qs[idx - 1], qs[idx], s)
    pts = scan.xyz.reshape(-1, 3)
    in_start = so3.quat_rotate(q_t, pts) + v_body[None, :] * tau[:, None]
    # re-express in the sweep-end frame
    q_end = qs[-1]
    t_end = v_body * ts[-1]
    q_end_c = so3.quat_conj(q_end)
    out = so3.quat_rotate(q_end_c[None, :], in_start - t_end[None, :])
    return ScanGrid(out.reshape(scan.xyz.shape), scan.mask, scan.time)


def _process_liosam_body(
    state: LioSamState, scan: ScanGrid, imu: ImuWindow, cfg: LioSamConfig,
    solve_fn=None,  # solve_scan2map signature; the multi-chip hook
) -> Tuple[LioSamState, LioSamResult]:
    solve = solve_fn if solve_fn is not None else solve_scan2map
    pcfg: PipelineConfig = cfg.slam.pipeline
    eng = state.engine
    R_prev = so3.quat_to_matrix(eng.pose.q)

    # --- IMU preintegration at the current bias estimate --------------------
    pre = preintegrate(imu.gyro, imu.acc, jnp.where(imu.mask, imu.dt, 0.0),
                       imu.mask, state.bg, state.ba, cfg.imu_noise)
    dt = pre.dt

    # --- deskew + features ---------------------------------------------------
    if cfg.deskew:
        v_body = R_prev.T @ state.v
        scan = deskew_with_imu(scan, imu, state.bg, v_body, cfg.scan_period)
    feats = extract_features(scan, pcfg.features)
    corners = voxel_downsample(feats.corners.xyz, feats.corners.mask,
                               pcfg.corner_ds_voxel, pcfg.features.max_corners)
    surfs = voxel_downsample(feats.surfs.xyz, feats.surfs.mask,
                             pcfg.surf_ds_voxel, pcfg.features.max_surfs)

    # --- initial guess from preintegration (updateInitialGuess :1046-1132) --
    q_pred = so3.quat_normalize(so3.quat_mul(eng.pose.q, pre.dq))
    p_pred = (eng.pose.t + state.v * dt + 0.5 * state.grav * dt * dt
              + R_prev @ pre.dp)
    v_pred = state.v + state.grav * dt + R_prev @ pre.dv

    # --- scan-to-map GN (scan2MapOptimization) -------------------------------
    pose_map, stats = solve(
        se3.Pose(q_pred, p_pred), corners, surfs, eng.corner_map, eng.surf_map,
        pcfg.corner_map, pcfg.surf_map, pcfg.solver,
    )

    # --- fusion: error-state KF update (the 2-node factor graph solved in
    # closed form; degenerate flag inflates the measurement covariance) ------
    J = pre.J_bias
    F = jnp.eye(15)
    F = F.at[0:3, 0:3].set(so3.quat_to_matrix(pre.dq).T)
    F = F.at[0:3, 9:12].set(J[0:3, 0:3])
    F = F.at[3:6, 0:3].set(-R_prev @ so3.hat(pre.dv))
    F = F.at[3:6, 9:15].set(R_prev @ J[3:6])
    F = F.at[6:9, 0:3].set(-R_prev @ so3.hat(pre.dp))
    F = F.at[6:9, 3:6].set(jnp.eye(3) * dt)
    F = F.at[6:9, 9:15].set(R_prev @ J[6:9])
    T = jnp.eye(15)
    T = T.at[3:6, 3:6].set(R_prev)
    T = T.at[6:9, 6:9].set(R_prev)
    P_pred = F @ state.P @ F.T + T @ pre.cov @ T.T + 1e-9 * jnp.eye(15)

    r_th = so3.quat_log(so3.quat_mul(so3.quat_conj(q_pred), pose_map.q))
    r_p = pose_map.t - p_pred
    z = jnp.concatenate([r_th, r_p])
    H = jnp.zeros((6, 15)).at[0:3, 0:3].set(jnp.eye(3)).at[3:6, 6:9].set(jnp.eye(3))
    s_rot = jnp.where(stats.degenerate, cfg.degen_sigma_rot, cfg.meas_sigma_rot)
    s_tr = jnp.where(stats.degenerate, cfg.degen_sigma_trans, cfg.meas_sigma_trans)
    Rm = jnp.diag(jnp.concatenate([jnp.full(3, s_rot**2), jnp.full(3, s_tr**2)]))
    S = H @ P_pred @ H.T + Rm
    K = P_pred @ H.T @ jnp.linalg.inv(S)
    dx = K @ z
    IKH = jnp.eye(15) - K @ H
    P_new = IKH @ P_pred @ IKH.T + K @ Rm @ K.T

    q_new = so3.quat_normalize(so3.quat_mul(q_pred, so3.quat_exp(dx[0:3])))
    v_new = v_pred + dx[3:6]
    p_new = p_pred + dx[6:9]
    bg_new = state.bg + dx[9:12]
    ba_new = state.ba + dx[12:15]

    # failure detection (imuPreintegration.cpp:580-600)
    diverged = (
        (jnp.linalg.norm(v_new) > 30.0)
        | (jnp.linalg.norm(bg_new) > 1.0)
        | (jnp.linalg.norm(ba_new) > 1.0)
        | ~jnp.all(jnp.isfinite(jnp.concatenate([p_new, v_new])))
    )
    v_new = jnp.where(diverged, jnp.zeros(3), v_new)
    bg_new = jnp.where(diverged, jnp.zeros(3), bg_new)
    ba_new = jnp.where(diverged, jnp.zeros(3), ba_new)
    P_new = jnp.where(diverged, jnp.eye(15) * 1e-1, P_new)

    pose_new = se3.Pose(q_new, p_new)

    # --- map update + bound --------------------------------------------------
    Rn = so3.quat_to_matrix(q_new)
    cmap, dc = insert_with_stats(eng.corner_map, corners.xyz @ Rn.T + p_new,
                                 corners.mask, pcfg.corner_map)
    smap, ds = insert_with_stats(eng.surf_map, surfs.xyz @ Rn.T + p_new,
                                 surfs.mask, pcfg.surf_map)
    if pcfg.bound_radius > 0:
        cmap = bound_map(cmap, p_new, pcfg.bound_radius, pcfg.corner_map)
        smap = bound_map(smap, p_new, pcfg.bound_radius, pcfg.surf_map)

    eng2 = EngineState(pose_new, eng.pose, cmap, smap, eng.frame + 1,
                       corners, surfs)
    new_state = LioSamState(eng2, v_new, bg_new, ba_new, P_new, state.grav)
    return new_state, LioSamResult(pose_new, stats, corners, surfs, dc + ds, v_new)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def process_liosam_scan(
    state: LioSamState, scan: ScanGrid, imu: ImuWindow, cfg: LioSamConfig
) -> Tuple[LioSamState, LioSamResult]:
    """The single-chip jitted per-scan step (see _process_liosam_body)."""
    return _process_liosam_body(state, scan, imu, cfg)


@functools.partial(jax.jit, static_argnames=())
def imu_rate_poses(pose: se3.Pose, v: jnp.ndarray, bg: jnp.ndarray,
                   ba: jnp.ndarray, grav: jnp.ndarray, imu: ImuWindow):
    """High-rate pose stream: integrate raw IMU from the latest fused state
    (TransformFusion + imuHandler re-predict, imuPreintegration.cpp:607-659).
    Returns (qs (M,4), ps (M,3), valid (M,)) — one pose per IMU sample."""
    dts = jnp.where(imu.mask, imu.dt, 0.0)

    def step(carry, inp):
        q, p, vel = carry
        w, a, dt = inp
        R = so3.quat_to_matrix(q)
        acc_w = R @ (a - ba) + grav
        p2 = p + vel * dt + 0.5 * acc_w * dt * dt
        v2 = vel + acc_w * dt
        q2 = so3.quat_normalize(so3.quat_mul(q, so3.quat_exp((w - bg) * dt)))
        return (q2, p2, v2), (q2, p2)

    _, (qs, ps) = jax.lax.scan(step, (pose.q, pose.t, v), (imu.gyro, imu.acc, dts))
    return qs, ps, imu.mask


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("state", "bank", "edges"))
def _liosam_fused_step(state: LioSamState, bank, edges, last_kf,
                       scan: ScanGrid, imu: ImuWindow, cfg: LioSamConfig):
    """One fused per-scan program (the liosam analog of _slam_step):
    IMU-coupled scan step + keyframe gate/edge insert + loop DETECTION.
    One XLA launch per scan instead of three."""
    new_state, res = process_liosam_scan(state, scan, imu, cfg)
    sres = ScanResult(res.pose, res.stats, res.corners, res.surfs,
                      res.n_dropped)
    bank2, edges2, last2, added = _keyframe_step_body(
        bank, edges, last_kf, sres, new_state.engine.frame, cfg.slam)
    cur = jnp.maximum(bank2.count - 1, 0)
    cand, found = detect_loop(bank2, cur, cfg.slam.loop)
    return new_state, res, bank2, edges2, last2, added, cand, found


class LioSamDriver:
    """The full LIO-SAM pipeline driver: tightly-coupled scan step + keyframe
    factor graph + loop closure + GPS, with an IMU-rate pose output per scan.
    Backend machinery shared with `slam_pipeline.SlamDriver` (sync-free)."""

    def __init__(self, cfg: LioSamConfig, x0: se3.Pose | None = None,
                 v0: jnp.ndarray | None = None, grav: jnp.ndarray | None = None,
                 emit_imu_rate: bool = False):
        from ..graph.keyframes import empty_bank
        from ..graph.pose_graph import empty_edges

        self.cfg = cfg
        self.state = init_liosam_state(cfg, x0=x0, v0=v0, grav=grav)
        f = cfg.slam.pipeline.features
        self.bank = empty_bank(cfg.slam.bank_capacity, f.max_corners, f.max_surfs)
        self.edges = empty_edges(cfg.slam.edge_capacity)
        self.last_kf = jnp.int32(0)
        self.n_loops_closed = 0
        self.host_frame = 0
        # the IMU-rate stream is opt-in, like the reference's publishers that
        # gate work on subscriber count (utility.h:328): the extra per-scan
        # launch costs ~5 ms of dispatch through the tunneled backend
        self.emit_imu_rate = emit_imu_rate
        self.imu_rate_out: list = []  # (qs, ps, mask) per scan, consumed by callers
        self._pending = None  # in-flight (found, cand) loop detection

    def process(self, scan: ScanGrid, imu: ImuWindow,
                gps: Optional[jnp.ndarray] = None) -> LioSamResult:
        cfg = self.cfg
        # high-rate output for the interval we are about to consume, predicted
        # from the latest fused state (what a robot steers by between scans)
        st = self.state
        if self.emit_imu_rate:
            self.imu_rate_out.append(imu_rate_poses(
                st.engine.pose, st.v, st.bg, st.ba, st.grav, imu))

        (self.state, res, self.bank, self.edges, self.last_kf, added,
         cand, found) = _liosam_fused_step(
            st, self.bank, self.edges, self.last_kf, scan, imu, cfg)
        if gps is not None:
            pos, w = _gps_fix(gps, cfg.slam)
            self.edges = _gps_edge(self.bank, self.edges, pos, w,
                                   added, cfg.slam)

        self.host_frame += 1
        # async loop-detection cadence (same pattern as SlamDriver.process):
        # read LAST tick's detection flag — its host copy finished scans ago,
        # so the dispatch queue never stalls on a blocking ~20 ms fetch
        if self._pending is not None:
            p_found, p_cand = self._pending
            self._pending = None
            if bool(p_found):
                self._close_loop(p_cand)
        if self.host_frame % cfg.slam.loop_every == 0:
            for a in (found, cand):
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
            self._pending = (found, cand)
        return res

    def finalize(self) -> None:
        """Drain the in-flight loop detection (end of stream)."""
        if self._pending is not None:
            p_found, p_cand = self._pending
            self._pending = None
            if bool(p_found):
                self._close_loop(p_cand)

    def _try_close_loop(self):
        # synchronous detect + align (used by finalize-style callers/tests)
        cfg = self.cfg.slam
        cand, found = _detect_step(self.bank, cfg)
        if not bool(found):
            return
        self._close_loop(cand)

    def _close_loop(self, cand):
        cfg = self.cfg.slam
        # traced `cur` keeps this on the SAME _align_step executable as the
        # slam driver's paths (see slam_pipeline._try_close_loop)
        cur = jnp.maximum(self.bank.count - 1, 0)
        edges2, accept, fitness = _align_step(self.bank, self.edges, cand, cfg,
                                              cur=cur)
        if bool(accept):
            bank2, engine2 = _correct_and_rebuild(
                self.bank, edges2, self.state.engine, self.cfg.slam)
            self.bank = bank2
            self.state = self.state._replace(engine=engine2)
            self.n_loops_closed += 1
        self.edges = edges2

    def trajectory(self):
        import numpy as np

        n = int(self.bank.count)
        return np.asarray(self.bank.t[:n])
