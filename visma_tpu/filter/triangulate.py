"""Multi-view feature triangulation (masked, batched).

Linear midpoint initialization + fixed-iteration Gauss-Newton refinement on
reprojection error; everything fixed-shape and vmappable over the feature
table.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from visma_tpu.filter.config import FilterConfig
from visma_tpu.geom.rotations import mm


def backproject(cfg: FilterConfig, xp: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) -> unit-norm camera rays (..., 3)."""
    x = (xp[..., 0] - cfg.cx) / cfg.fx
    y = (xp[..., 1] - cfg.cy) / cfg.fy
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def project(cfg: FilterConfig, Xc: jnp.ndarray) -> jnp.ndarray:
    """Camera points (..., 3) -> pixels (..., 2)."""
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-6, 1e-6, Xc[..., 2])
    return jnp.stack([cfg.fx * Xc[..., 0] / z + cfg.cx,
                      cfg.fy * Xc[..., 1] / z + cfg.cy], axis=-1)


def solve3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (..., 3, 3) @ x = (..., 3) solve via the adjugate.

    jnp.linalg.solve lowers tiny batched systems to an LU loop of many
    scalar-ish HLO ops — measured as a major chunk of the 0.17 ms
    triangulation stage (tools/profile_filter.py). The adjugate is ~40
    fused elementwise flops. Callers ridge-regularize A, and results are
    bounded/gated downstream, which covers the (slightly) weaker numerics
    vs LU on near-singular systems."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    # NOTE c is laid out as the TRANSPOSED cofactor matrix (adjugate rows).
    # Sign-preserving clamp: |det| floors at 1e-20 WITHOUT flipping the
    # sign of tiny negative determinants (ADVICE r3 #3 — a plain
    # where(|det|<eps, eps, det) silently negates the solution for
    # near-singular indefinite systems; current callers are PSD+ridge but
    # this helper is generically named).
    safe = jnp.where(det < 0, jnp.minimum(det, -1e-20),
                     jnp.maximum(det, 1e-20))
    inv_det = 1.0 / safe
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c01 * b1 + c02 * b2) * inv_det
    x1 = (c10 * b0 + c11 * b1 + c12 * b2) * inv_det
    x2 = (c20 * b0 + c21 * b1 + c22 * b2) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def triangulate_linear(cfg: FilterConfig, obs, mask, win_R, win_p):
    """Midpoint method: X = argmin sum ||(I - d d^T)(X - p_i)||^2.

    obs (M,2), mask (M,), win_R (M,3,3) world<-cam, win_p (M,3).
    Returns (X (3,), ok scalar bool).
    """
    d = jnp.einsum("mij,mj->mi", win_R, backproject(cfg, obs))
    w = mask.astype(jnp.float32)
    Pm = jnp.eye(3)[None] - d[:, :, None] * d[:, None, :]
    Pm = Pm * w[:, None, None]
    A = jnp.sum(Pm, axis=0) + 1e-6 * jnp.eye(3)
    b = jnp.einsum("mij,mj->i", Pm, win_p)
    X = solve3x3(A, b)
    # near-parallel rays make A ~ singular: the solution blows up and can
    # overflow f32 downstream. Clamp and flag.
    norm = jnp.linalg.norm(X)
    bounded = (norm < 1e3) & jnp.all(jnp.isfinite(X))
    X = jnp.where(bounded, X, jnp.zeros(3))
    ok = (jnp.sum(w) >= 2) & bounded
    return X, ok


def _reproj_residuals(cfg: FilterConfig, X, obs, mask, win_R, win_p):
    Xc = jnp.einsum("mji,mj->mi", win_R, X[None] - win_p)  # R^T (X - p)
    pred = project(cfg, Xc)
    r = (pred - obs) * mask[:, None]
    return r, Xc


def triangulate(cfg: FilterConfig, obs, mask, win_R, win_p, gn_iters: int = 3):
    """Linear init + GN refinement. Returns (X, ok, mean_reproj_err)."""
    X0, ok = triangulate_linear(cfg, obs, mask, win_R, win_p)

    def gn_step(X, _):
        r, Xc = _reproj_residuals(cfg, X, obs, mask, win_R, win_p)
        z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-6, 1e-6, Xc[..., 2])
        # d pred / d Xc
        Jc = jnp.zeros((obs.shape[0], 2, 3), jnp.float32)
        Jc = Jc.at[:, 0, 0].set(cfg.fx / z)
        Jc = Jc.at[:, 0, 2].set(-cfg.fx * Xc[..., 0] / z**2)
        Jc = Jc.at[:, 1, 1].set(cfg.fy / z)
        Jc = Jc.at[:, 1, 2].set(-cfg.fy * Xc[..., 1] / z**2)
        # d Xc / d X = R^T
        J = jnp.einsum("mab,mbc->mac", Jc, jnp.swapaxes(win_R, -1, -2))
        J = J * mask[:, None, None]
        H = jnp.einsum("mai,maj->ij", J, J) + 1e-4 * jnp.eye(3)
        g = jnp.einsum("mai,ma->i", J, r)
        dX = solve3x3(H, g)
        dX = jnp.clip(dX, -100.0, 100.0)  # f32 overflow guard
        return X - dX, None

    # static unroll: 3 tiny GN bodies inline cheaper than scan overhead
    X = X0
    for _ in range(gn_iters):
        X, _ = gn_step(X, None)

    r, Xc = _reproj_residuals(cfg, X, obs, mask, win_R, win_p)
    n = jnp.maximum(jnp.sum(mask), 1)
    err = jnp.sum(jnp.linalg.norm(r, axis=-1)) / n
    depth_ok = jnp.all(jnp.where(mask, Xc[..., 2], 1.0) > cfg.min_depth) & \
               jnp.all(jnp.where(mask, Xc[..., 2], 1.0) < cfg.max_depth)
    ok = ok & depth_ok & (err < cfg.max_reproj_error) & jnp.all(jnp.isfinite(X))
    return X, ok, err
