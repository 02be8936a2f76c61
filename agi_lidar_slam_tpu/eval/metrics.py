"""Trajectory evaluation: ATE (Umeyama-aligned) and RPE.

The reference's only evaluation tool is kittiHelper republishing ground-truth
poses for eyeballing in rviz (A-LOAM kittiHelper.cpp:110-144, commented out).
This module implements the standard KITTI/TUM metrics properly. Host-side
numpy — evaluation is not a hot path.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(est: np.ndarray, gt: np.ndarray, with_scale: bool = False):
    """Least-squares similarity transform aligning est -> gt. (N,3) each.
    Returns (R (3,3), t (3,), s)."""
    est = np.asarray(est, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    mu_e, mu_g = est.mean(0), gt.mean(0)
    e, g = est - mu_e, gt - mu_g
    cov = g.T @ e / est.shape[0]
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    s = float(np.trace(np.diag(d) @ S) / max(e.var(0).sum(), 1e-12)) if with_scale else 1.0
    t = mu_g - s * R @ mu_e
    return R, t, s


def ate_rmse(est: np.ndarray, gt: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE (m) after optional SE(3) Umeyama alignment."""
    est = np.asarray(est, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    if align and est.shape[0] >= 3:
        R, t, s = umeyama_alignment(est, gt)
        est = (s * (R @ est.T)).T + t
    err = est - gt
    return float(np.sqrt((err**2).sum(axis=1).mean()))


def _quat_to_mat(q: np.ndarray) -> np.ndarray:
    """(N,4) [x,y,z,w] quaternions -> (N,3,3) rotation matrices."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty(q.shape[:-1] + (3, 3))
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - w * z)
    R[:, 0, 2] = 2 * (x * z + w * y)
    R[:, 1, 0] = 2 * (x * y + w * z)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - w * x)
    R[:, 2, 0] = 2 * (x * z - w * y)
    R[:, 2, 1] = 2 * (y * z + w * x)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def rpe_rmse(
    est: np.ndarray,
    gt: np.ndarray,
    delta: int = 1,
    est_q: np.ndarray | None = None,
    gt_q: np.ndarray | None = None,
) -> float:
    """Standard TUM/KITTI relative-pose translation error RMSE over a frame
    delta: err_k = || trans( (gt_k^-1 gt_{k+d})^-1 (est_k^-1 est_{k+d}) ) ||.

    With orientations (`est_q`/`gt_q`, xyzw) the per-frame deltas are
    expressed in each trajectory's local frame — the exact metric. Without
    them the world-frame displacement *vectors* are differenced (direction-
    aware; unlike round 1's |de|-|dg| it cannot score zero on heading drift).
    """
    est = np.asarray(est, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    de = est[delta:] - est[:-delta]
    dg = gt[delta:] - gt[:-delta]
    if est_q is not None and gt_q is not None:
        Re = _quat_to_mat(np.asarray(est_q)[:-delta])
        Rg = _quat_to_mat(np.asarray(gt_q)[:-delta])
        de = np.einsum("nij,nj->ni", Re.transpose(0, 2, 1), de)
        dg = np.einsum("nij,nj->ni", Rg.transpose(0, 2, 1), dg)
    err = np.linalg.norm(de - dg, axis=1)
    return float(np.sqrt((err**2).mean()))
