"""Batched local-geometry fits: 3x3 symmetric eigendecomposition (closed form),
line fit for edge features, plane fit for planar features.

Replaces the reference's per-correspondence Eigen calls:
* corner line fit = eigendecomposition of the 5-NN covariance
  (A-LOAM laserMapping.cpp:654-689, Eigen::SelfAdjointEigenSolver),
* surf plane fit = solve A n = -1 over 5 points + validity gate
  (laserMapping.cpp:726-764 colPivHouseholderQr; S-FAST_LIO common_lib.h
  esti_plane :104-137).

Closed-form trigonometric eigenvalues + cross-product eigenvectors: no
iterative solver, fully vectorized over N fits at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_EPS = 1e-12


def eigh3x3(A: jnp.ndarray):
    """Symmetric (...,3,3) -> (eigvals descending (...,3), eigvecs (...,3,3) rows).

    eigvecs[..., i, :] is the unit eigenvector of eigvals[..., i].
    """
    q = (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    Bm = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(Bm * Bm, axis=(-1, -2)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    Cm = Bm / p[..., None, None]
    detC = (
        Cm[..., 0, 0] * (Cm[..., 1, 1] * Cm[..., 2, 2] - Cm[..., 1, 2] * Cm[..., 2, 1])
        - Cm[..., 0, 1] * (Cm[..., 1, 0] * Cm[..., 2, 2] - Cm[..., 1, 2] * Cm[..., 2, 0])
        + Cm[..., 0, 2] * (Cm[..., 1, 0] * Cm[..., 2, 1] - Cm[..., 1, 1] * Cm[..., 2, 0])
    )
    r = jnp.clip(detC / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l0 = q + 2.0 * p * jnp.cos(phi)
    l2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l1 = 3.0 * q - l0 - l2
    vals = jnp.stack([l0, l1, l2], axis=-1)

    vecs = jnp.stack([eigvec3x3(A, l0), eigvec3x3(A, l1), eigvec3x3(A, l2)],
                     axis=-2)
    return vals, vecs


def eigvals3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues only, descending (...,3) — skips the eigenvector crosses
    for fits that select a single eigenvector afterwards."""
    q = (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    Bm = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(Bm * Bm, axis=(-1, -2)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    Cm = Bm / p[..., None, None]
    detC = (
        Cm[..., 0, 0] * (Cm[..., 1, 1] * Cm[..., 2, 2] - Cm[..., 1, 2] * Cm[..., 2, 1])
        - Cm[..., 0, 1] * (Cm[..., 1, 0] * Cm[..., 2, 2] - Cm[..., 1, 2] * Cm[..., 2, 0])
        + Cm[..., 0, 2] * (Cm[..., 1, 0] * Cm[..., 2, 1] - Cm[..., 1, 1] * Cm[..., 2, 0])
    )
    r = jnp.clip(detC / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l0 = q + 2.0 * p * jnp.cos(phi)
    l2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l1 = 3.0 * q - l0 - l2
    return jnp.stack([l0, l1, l2], axis=-1)


def eigvec3x3(A: jnp.ndarray, lmbda: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of symmetric (...,3,3) A for eigenvalue lmbda (...,).

    Cross-product construction; the best-conditioned cross is picked with a
    branchless one-hot sum (a take_along_axis gather here costs ~50 ns per
    offset on TPU — profiled at 0.6 ms/scan across the association passes —
    while the one-hot select is pure VPU work)."""
    M = A - lmbda[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c12 = jnp.cross(r1, r2)
    c20 = jnp.cross(r2, r0)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    n20 = jnp.sum(c20 * c20, axis=-1)
    nmax = jnp.maximum(n01, jnp.maximum(n12, n20))
    v = jnp.where((n01 == nmax)[..., None], c01,
                  jnp.where((n12 == nmax)[..., None], c12, c20))
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


class LineFit(NamedTuple):
    centroid: jnp.ndarray  # (N,3)
    direction: jnp.ndarray  # (N,3) unit
    ok: jnp.ndarray  # (N,) passes the eigenvalue-ratio edge test


def fit_lines(nn_pts: jnp.ndarray, nn_valid: jnp.ndarray, eig_ratio: float) -> LineFit:
    """Edge-line fit over k neighbors. nn_pts (N,k,3), nn_valid (N,k).

    ok iff all k neighbors exist and lambda_max > eig_ratio * lambda_mid
    (A-LOAM laserMapping.cpp:670: eigenvalues[2] > 3 * eigenvalues[1]).
    """
    w = nn_valid.astype(nn_pts.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    centroid = jnp.sum(nn_pts * w, axis=1) / cnt
    d = (nn_pts - centroid[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", d, d) / cnt[..., None]
    vals = eigvals3x3(cov)
    direction = eigvec3x3(cov, vals[:, 0])  # only the largest is needed
    ok = jnp.all(nn_valid, axis=1) & (vals[:, 0] > eig_ratio * jnp.maximum(vals[:, 1], 1e-9))
    return LineFit(centroid, direction, ok)


class PlaneFit(NamedTuple):
    normal: jnp.ndarray  # (N,3) unit
    offset: jnp.ndarray  # (N,) plane is n.x + offset = 0
    ok: jnp.ndarray  # (N,)


def fit_planes(nn_pts: jnp.ndarray, nn_valid: jnp.ndarray, tol: float) -> PlaneFit:
    """Plane fit over k neighbors with per-point residual gate.

    Same acceptance semantics as the reference (laserMapping.cpp:743-764
    A n = -1 + gate |n.p_j + d| < tol; esti_plane common_lib.h:104-137), but
    solved as centered covariance + smallest eigenvector: the reference's
    uncentered normal-equations form is catastrophically ill-conditioned in
    f32 for planes far from the origin (cond ~ |p|^2 / spread^2), while the
    centered form is invariant to plane distance.
    """
    w = nn_valid.astype(nn_pts.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    centroid = jnp.sum(nn_pts * w, axis=1) / cnt
    d = (nn_pts - centroid[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", d, d) / cnt[..., None]
    vals = eigvals3x3(cov)
    normal = eigvec3x3(cov, vals[:, 2])  # only the smallest is needed
    # planarity gate: a near-collinear neighborhood (mid eigenvalue ~ 0) has an
    # ill-defined normal; require >= ~5 cm of in-plane spread in the second
    # principal direction (no analog needed in the reference: 64-beam density
    # makes collinear 5-NN sets rare, 16-beam data hits them constantly)
    planar = vals[:, 1] > 2.5e-3
    offset = -jnp.einsum("ni,ni->n", normal, centroid)
    resid = jnp.abs(jnp.einsum("nki,ni->nk", nn_pts, normal) + offset[:, None])
    ok = (
        jnp.all(nn_valid, axis=1)
        & planar
        & jnp.all(jnp.where(nn_valid, resid, 0.0) < tol, axis=1)
    )
    return PlaneFit(normal, offset, ok)
