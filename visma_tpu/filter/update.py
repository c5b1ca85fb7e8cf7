"""MSCKF measurement update: per-feature nullspace projection + stacked
QR-compressed EKF update with Joseph-form covariance.

All shapes fixed: K_up features x M window slots; masked rows are exact
zeros in (H, r), which makes them information-free no-ops through the
orthonormal projections (zero H row => zero Kalman gain column).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from visma_tpu.filter.config import FilterConfig
from visma_tpu.filter.state import FilterState
from visma_tpu.filter.triangulate import project, triangulate
from visma_tpu.geom.rotations import einsum_hp, hat, mm


def feature_jacobians(cfg: FilterConfig, X, obs, mask, win_R, win_p):
    """Residual + Jacobians for one feature over the window.

    Returns r (2M,), Hx (2M, D), Hf (2M, 3); masked rows are zero.
    Clone error convention: R <- exp(hat(dtheta)) R (world-frame attitude
    error), p <- p + dp.
    """
    M = cfg.window
    D = cfg.dim
    Rt = jnp.swapaxes(win_R, -1, -2)                     # (M,3,3) cam<-world
    Xc = jnp.einsum("mij,mj->mi", Rt, X[None] - win_p)   # (M,3)
    pred = project(cfg, Xc)
    r = (obs - pred) * mask[:, None]                     # (M,2)

    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-6, 1e-6, Xc[..., 2])
    Jp = jnp.zeros((M, 2, 3), jnp.float32)
    Jp = Jp.at[:, 0, 0].set(cfg.fx / z)
    Jp = Jp.at[:, 0, 2].set(-cfg.fx * Xc[..., 0] / z**2)
    Jp = Jp.at[:, 1, 1].set(cfg.fy / z)
    Jp = Jp.at[:, 1, 2].set(-cfg.fy * Xc[..., 1] / z**2)
    Jp = Jp * mask[:, None, None]

    # dXc/dtheta = R^T hat(X - p); dXc/dp = -R^T ; dXc/dX = R^T
    dXc_dth = jnp.einsum("mij,mjk->mik", Rt, hat(X[None] - win_p))
    Htheta = jnp.einsum("mab,mbc->mac", Jp, dXc_dth)     # (M,2,3)
    Hp = -jnp.einsum("mab,mbc->mac", Jp, Rt)             # (M,2,3)
    Hf = jnp.einsum("mab,mbc->mac", Jp, Rt)              # (M,2,3)

    # scatter into the big Jacobian: clone m occupies [15+6m, 15+6m+6).
    # STATIC placement via a constant one-hot (M,6,D) einsum — exact
    # (every output element sums exactly one product) and one fused
    # matmul instead of M vmapped dynamic_update_slices (measured 2x on
    # this stage, tools/profile_filter.py).
    blocks = jnp.concatenate([Htheta, Hp], axis=-1)      # (M,2,6)
    Hx = einsum_hp("mab,mbd->mad", blocks, _clone_placement(M, D))

    return r.reshape(2 * M), Hx.reshape(2 * M, D), Hf.reshape(2 * M, 3)


@functools.lru_cache(maxsize=8)
def _clone_placement(M: int, D: int) -> np.ndarray:
    """Constant (M, 6, D) one-hot: E[m, j, 15 + 6m + j] = 1. Cached as
    NUMPY (a cached jnp array created under a trace leaks the tracer)."""
    E = np.zeros((M, 6, D), np.float32)
    for m in range(M):
        E[m, np.arange(6), 15 + 6 * m + np.arange(6)] = 1.0
    return E


def nullspace_project(r, Hx, Hf):
    """Left-nullspace projection of the landmark Jacobian: rows 3: of
    Q^T [r | Hx] where Hf = Q R.

    Q^T is applied as THREE explicit Householder reflections (Hf has 3
    columns) — fused rank-1 updates instead of XLA's generic QR loop
    (measured faster in tools/profile_filter.py; the projected quantities
    are basis-invariant so any orthonormal nullspace basis is valid).
    Masked (all-zero) feature rows have v = 0 there, so they remain EXACT
    zeros through every reflection (the repo-wide masking convention);
    an all-zero Hf yields beta = 0 (identity), passing zeros through.
    Returns (N^T r, N^T Hx) with 2M-3 rows."""
    n = Hf.shape[0]
    A = Hf
    B = jnp.concatenate([r[:, None], Hx], axis=1)
    rows = jnp.arange(n)
    for k in range(3):
        x = jnp.where(rows >= k, A[:, k], 0.0)
        nx = jnp.linalg.norm(x)
        sign = jnp.where(x[k] >= 0, 1.0, -1.0)
        v = x.at[k].add(sign * nx)
        vtv = jnp.dot(v, v)
        beta = jnp.where(vtv > 1e-20, 2.0 / jnp.maximum(vtv, 1e-20), 0.0)
        A = A - beta * jnp.outer(v, v @ A)
        B = B - beta * jnp.outer(v, v @ B)
    return B[3:, 0], B[3:, 1:]


def chi2_gate(cfg: FilterConfig, r_proj, H_proj, P, dof_scale: float = 8.0):
    """Mahalanobis gate on the projected residual (cheap outlier rejection).

    Returns bool: True = accept. dof_scale approximates the chi-square
    threshold per residual dimension.
    """
    S = mm(mm(H_proj, P), H_proj.T)
    S = S + cfg.pixel_noise**2 * jnp.eye(S.shape[0], dtype=S.dtype)
    sol = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), r_proj)
    m2 = jnp.dot(r_proj, sol)
    dof = r_proj.shape[0]
    return m2 < dof_scale * dof


def msckf_update(cfg: FilterConfig, state: FilterState,
                 sel_obs, sel_mask, sel_valid):
    """Batched MSCKF update over selected features.

    sel_obs (U, M, 2), sel_mask (U, M) observation masks, sel_valid (U,)
    feature-level validity. Returns (new_state, used (U,) bool,
    rejected (U,) bool, X (U,3) triangulated points).

    rejected marks update CANDIDATES (valid, enough observations) the
    filter looked at this frame and threw out WITHOUT absorbing — failed
    triangulation or the chi2/finite gate — the proto lifecycle's REJECT
    outcome (vlslam.proto:11-19). used and rejected are disjoint and
    their union is the candidate set.
    """
    M, D = cfg.window, cfg.dim
    U = sel_obs.shape[0]

    # only observations in valid window slots count
    slot_ok = state.win_valid[None, :]
    sel_mask = sel_mask & slot_ok

    X, tri_ok, _err = jax.vmap(
        lambda o, m: triangulate(cfg, o, m, state.win_R, state.win_p)
    )(sel_obs, sel_mask)

    candidate = sel_valid & (jnp.sum(sel_mask, axis=1) >= cfg.min_track_obs)
    use = candidate & tri_ok

    r, Hx, Hf = jax.vmap(
        lambda x, o, m: feature_jacobians(cfg, x, o, m, state.win_R,
                                          state.win_p)
    )(X, sel_obs, sel_mask)

    rp, Hp = jax.vmap(nullspace_project)(r, Hx, Hf)      # (U, 2M-3[, D])

    gate = jax.vmap(lambda rr, hh: chi2_gate(cfg, rr, hh, state.P))(rp, Hp)
    finite = jnp.all(jnp.isfinite(rp), axis=1) & \
        jnp.all(jnp.isfinite(Hp.reshape(U, -1)), axis=1)
    use = use & gate & finite
    rejected = candidate & ~use

    # zero out unused features entirely (where, not multiply: NaN * 0 = NaN)
    rp = jnp.where(use[:, None], rp, 0.0)
    Hp = jnp.where(use[:, None, None], Hp, 0.0)

    rbig = rp.reshape(-1)                 # (L,)
    Hbig = Hp.reshape(-1, D)              # (L, D)

    # QR compression to D rows (L >> D); masked rows are zero and harmless
    Qc, Rc = jnp.linalg.qr(Hbig, mode="reduced")
    rc = Qc.T @ rbig                      # (D,)

    # EKF update with H = Rc (D x D), noise sigma^2 I
    P = state.P
    S = mm(mm(Rc, P), Rc.T) + cfg.pixel_noise**2 * jnp.eye(D, dtype=P.dtype)
    cho = jax.scipy.linalg.cho_factor(0.5 * (S + S.T))
    PHt = mm(P, Rc.T)
    K = jax.scipy.linalg.cho_solve(cho, PHt.T).T         # (D, D)
    if cfg.num_slam and cfg.schmidt:
        # Schmidt/consider landmarks: zero gain on the landmark block in
        # EVERY update, not just the landmark update (filter/slam.py) —
        # Joseph form below stays exact for any gain.
        K = K.at[cfg.slam_idx:].set(0.0)
    dx = K @ rc

    IKH = jnp.eye(D, dtype=P.dtype) - mm(K, Rc)
    P_new = mm(mm(IKH, P), IKH.T) + cfg.pixel_noise**2 * mm(K, K.T)
    P_new = 0.5 * (P_new + P_new.T)

    # if nothing was used, keep everything unchanged
    any_used = jnp.any(use)
    dx = jnp.where(any_used, dx, jnp.zeros_like(dx))
    P_new = jnp.where(any_used, P_new, P)

    state = apply_correction(cfg, state, dx).replace(P=P_new)
    # store triangulated points for export/diagnostics
    return state, use, rejected, X


def apply_correction(cfg: FilterConfig, state: FilterState,
                     dx: jnp.ndarray) -> FilterState:
    from visma_tpu.geom.rotations import rodrigues

    M = cfg.window
    R = mm(rodrigues(dx[0:3]), state.R)
    p = state.p + dx[3:6]
    v = state.v + dx[6:9]
    bg = state.bg + dx[9:12]
    ba = state.ba + dx[12:15]

    dwin = dx[15:15 + 6 * M].reshape(M, 6)
    win_R = jax.vmap(lambda d, Rm: mm(rodrigues(d), Rm))(dwin[:, :3],
                                                         state.win_R)
    win_p = state.win_p + dwin[:, 3:]
    state = state.replace(R=R, p=p, v=v, bg=bg, ba=ba, win_R=win_R,
                          win_p=win_p)

    # calibration tail (right-perturbation on R_bc; see _augment docstring)
    if cfg.estimate_extrinsics:
        c = cfg.ext_idx
        state = state.replace(
            R_bc=mm(state.R_bc, rodrigues(dx[c : c + 3])),
            p_bc=state.p_bc + dx[c + 3 : c + 6])
    if cfg.estimate_td:
        state = state.replace(td=state.td + dx[cfg.td_idx])
    if cfg.num_slam:
        s = cfg.slam_idx
        state = state.replace(
            lm_xw=state.lm_xw + dx[s : s + 3 * cfg.num_slam].reshape(-1, 3))
    return state
