"""Closed-form point-set alignment.

`umeyama` reproduces Eigen::umeyama as used by the reference's
"4DoF" estimator (constrained_ICP.cpp:25-37 — despite the name, the
reference computes the full Umeyama solution; the 4-DoF intent lives in
the yaw-enumeration around it, annotation.cpp:35-63). `umeyama_4dof` is
the *actual* gravity-constrained closed form (yaw + translation
[+ scale]), provided as the honest version of the named intent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from visma_tpu.geom.rotations import mm


def umeyama(src: jnp.ndarray, dst: jnp.ndarray, weights=None,
            with_scaling: bool = False):
    """Least-squares similarity transform dst ~ c R src + t.

    src, dst: (N,3); weights: optional (N,) nonneg. Returns (4,4) matrix.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = mm((dc * w[:, None]).T, sc)                      # (3,3)
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], cov.dtype)).at[2, 2].set(d)
    R = mm(mm(U, D), Vt)
    var_s = jnp.sum(w * jnp.sum(sc * sc, axis=1))
    c = jnp.where(with_scaling,
                  jnp.sum(S * jnp.diag(D)) / jnp.maximum(var_s, 1e-12), 1.0)
    t = mu_d - c * R @ mu_s
    T = jnp.eye(4, dtype=src.dtype)
    T = T.at[:3, :3].set(c * R).at[:3, 3].set(t)
    return T


def umeyama_4dof(src: jnp.ndarray, dst: jnp.ndarray, weights=None,
                 gravity_axis: int = 2, with_scaling: bool = False):
    """Gravity-constrained alignment: rotation restricted to yaw about the
    gravity axis. Closed form via the 2-D Umeyama problem in the horizontal
    plane. Returns (4,4)."""
    if weights is None:
        weights = jnp.ones(src.shape[0], src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    sc = src - mu_s
    dc = dst - mu_d

    ax = [i for i in range(3) if i != gravity_axis]
    s2 = sc[:, ax]
    d2 = dc[:, ax]
    # 2-D rotation maximizing sum w d2^T R s2: angle from the 2x2 cov
    cov = mm((d2 * w[:, None]).T, s2)
    # R(theta) = [[cos,-sin],[sin,cos]]; optimal theta:
    a = cov[0, 0] + cov[1, 1]
    b = cov[1, 0] - cov[0, 1]
    theta = jnp.arctan2(b, a)
    c2, s2_ = jnp.cos(theta), jnp.sin(theta)
    R = jnp.eye(3, dtype=src.dtype)
    R = R.at[ax[0], ax[0]].set(c2).at[ax[0], ax[1]].set(-s2_)
    R = R.at[ax[1], ax[0]].set(s2_).at[ax[1], ax[1]].set(c2)

    scale = 1.0
    if with_scaling:
        var_s = jnp.sum(w * jnp.sum(sc * sc, axis=1))
        num = jnp.sum(w * jnp.sum(dc * (sc @ R.T), axis=1))
        scale = num / jnp.maximum(var_s, 1e-12)
    t = mu_d - scale * R @ mu_s
    T = jnp.eye(4, dtype=src.dtype)
    T = T.at[:3, :3].set(scale * R).at[:3, 3].set(t)
    return T
