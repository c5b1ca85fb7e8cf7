"""In-state SLAM landmarks on top of the MSCKF core (hybrid filter).

The vlslam feature lifecycle's INSTATE status (reference
protocols/vlslam.proto:11-19) records that the upstream Corvis filter
carried long-lived landmarks *inside* the EKF state vector; this module is
the TPU-native version of that mechanism. Long-lived tracks promote into
fixed-capacity 3-dof landmark slots via **delayed initialization** — the
left-range rows of the per-feature Jacobian QR, exactly the information the
MSCKF nullspace update throws away — and afterwards update the filter every
frame from a single fresh observation (O(1) per frame instead of waiting
for the track to die).

`cfg.schmidt` switches the landmark block to **Schmidt/consider** mode:
the Kalman gain rows of all landmark states are zeroed, so landmark
estimates and their covariance freeze while their cross-correlations with
the pose states still shape (damp) the pose update. This is the
Schmidt-EKF trade from the VI-SLAM literature (PAPERS.md: arXiv
1903.08636, arXiv 2109.14229): consistency of long-lived landmarks at a
fraction of the full-update cost.

Everything is fixed-shape: L = cfg.num_slam slots, empty slots carry id
-1 and exact-zero covariance rows/columns (the zero-H-row convention used
throughout update.py makes them information-free no-ops).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from visma_tpu.filter.config import FilterConfig
from visma_tpu.filter.state import FilterState
from visma_tpu.filter.triangulate import project
from visma_tpu.filter.update import apply_correction, feature_jacobians
from visma_tpu.geom.rotations import hat, mm


def in_state(lm_ids: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """(F,) bool: which of `ids` are live SLAM landmarks."""
    live = lm_ids >= 0
    return jnp.any((ids[None, :] == lm_ids[:, None]) & live[:, None], axis=0)


def slam_update(cfg: FilterConfig, state: FilterState, ids, xp,
                valid) -> FilterState:
    """Per-frame EKF update from this frame's observations of in-state
    landmarks, plus slot lifecycle (missed counting and drops).

    ids (F,), xp (F,2), valid (F,): the frame's raw feature observations.
    The newest clone (slot M-1) is the measuring camera.
    """
    L = cfg.num_slam
    M, D = cfg.window, cfg.dim
    c0 = 15 + 6 * (M - 1)            # newest clone error columns
    s0 = cfg.slam_idx

    live = state.lm_ids >= 0
    eq = (state.lm_ids[:, None] == ids[None, :]) & valid[None, :] \
        & live[:, None]
    seen = jnp.any(eq, axis=1)
    obs = xp[jnp.argmax(eq, axis=1)]                      # (L,2)

    Rc, pc = state.win_R[M - 1], state.win_p[M - 1]
    Rt = Rc.T
    X = state.lm_xw                                        # (L,3)
    Xc = jnp.einsum("ij,lj->li", Rt, X - pc[None])
    pred = project(cfg, Xc)
    depth_ok = (Xc[:, 2] > cfg.min_depth) & (Xc[:, 2] < cfg.max_depth)
    r = (obs - pred)                                       # (L,2)

    z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-6, 1e-6, Xc[:, 2])
    Jp = jnp.zeros((L, 2, 3), jnp.float32)
    Jp = Jp.at[:, 0, 0].set(cfg.fx / z)
    Jp = Jp.at[:, 0, 2].set(-cfg.fx * Xc[:, 0] / z**2)
    Jp = Jp.at[:, 1, 1].set(cfg.fy / z)
    Jp = Jp.at[:, 1, 2].set(-cfg.fy * Xc[:, 1] / z**2)

    # dXc/dtheta_c = R^T hat(X - p); dXc/dp_c = -R^T; dXc/dX = R^T
    Hth = jnp.einsum("lab,lbc->lac", Jp, jnp.einsum(
        "ij,ljk->lik", Rt, hat(X - pc[None])))             # (L,2,3)
    Hp = -jnp.einsum("lab,bc->lac", Jp, Rt)
    Hf = jnp.einsum("lab,bc->lac", Jp, Rt)

    # scatter into (L, 2, D): clone block static, landmark block strided
    H = jnp.zeros((L, 2, D), jnp.float32)
    H = H.at[:, :, c0 : c0 + 3].set(Hth)
    H = H.at[:, :, c0 + 3 : c0 + 6].set(Hp)
    lm_cols = s0 + 3 * jnp.arange(L)
    H = jax.vmap(lambda h, hf, c: jax.lax.dynamic_update_slice(h, hf,
                                                               (0, c))
                 )(H, Hf, lm_cols)

    # per-landmark chi-square gate
    P = state.P
    use = seen & depth_ok & jnp.all(jnp.isfinite(r), axis=1)

    def gate_one(h2, r2):
        S = mm(mm(h2, P), h2.T) + cfg.pixel_noise**2 * jnp.eye(2)
        m2 = r2 @ jnp.linalg.solve(S, r2)
        return m2 < cfg.slam_chi2_scale * 2.0

    use = use & jax.vmap(gate_one)(H, r)

    r = jnp.where(use[:, None], r, 0.0)
    H = jnp.where(use[:, None, None], H, 0.0)
    rbig = r.reshape(-1)
    Hbig = H.reshape(-1, D)                                 # (2L, D)

    S = mm(mm(Hbig, P), Hbig.T) \
        + cfg.pixel_noise**2 * jnp.eye(2 * L, dtype=P.dtype)
    cho = jax.scipy.linalg.cho_factor(0.5 * (S + S.T))
    K = jax.scipy.linalg.cho_solve(cho, mm(P, Hbig.T).T).T  # (D, 2L)
    if cfg.schmidt:
        # consider states: zero gain on the whole landmark block. Joseph
        # form below stays a valid covariance update for ANY gain, which
        # is exactly the Schmidt-Kalman construction.
        K = K.at[s0:].set(0.0)
    dx = K @ rbig

    IKH = jnp.eye(D, dtype=P.dtype) - mm(K, Hbig)
    P_new = mm(mm(IKH, P), IKH.T) + cfg.pixel_noise**2 * mm(K, K.T)
    P_new = 0.5 * (P_new + P_new.T)

    any_used = jnp.any(use)
    dx = jnp.where(any_used, dx, 0.0)
    P_new = jnp.where(any_used, P_new, P)
    state = apply_correction(cfg, state, dx).replace(P=P_new)

    # lifecycle: missed counters and drops
    missed = jnp.where(live & seen, 0,
                       jnp.where(live, state.lm_missed + 1, 0))
    drop = live & (missed > cfg.slam_max_missed)
    lm_ids = jnp.where(drop, -1, state.lm_ids)
    # decorrelate freed slots: zero their covariance rows/columns
    keep_row = jnp.ones(D, bool)
    keep_row = keep_row.at[s0:].set(
        jnp.repeat(~drop, 3, total_repeat_length=3 * L))
    P2 = jnp.where(keep_row[:, None] & keep_row[None, :], state.P, 0.0)
    return state.replace(lm_ids=lm_ids, lm_missed=missed, P=P2)


def slam_promote(cfg: FilterConfig, state: FilterState, cand_X, cand_obs,
                 cand_mask, cand_ids, cand_ok) -> FilterState:
    """Promote up to max_promote candidate tracks into empty landmark
    slots by delayed initialization.

    For each candidate, the window-stacked feature Jacobians (r, Hx, Hf)
    are relinearized at the post-update state; with Hf = Q [R1; 0], the
    Q2 rows were consumed by the MSCKF nullspace update, and the Q1 rows
    initialize the landmark:

        df = R1^{-1} (r1 - H1 dx - n1),  H1 = Q1^T Hx, r1 = Q1^T r
        X+    = X_tri + R1^{-1} r1
        P_fx  = A P,  A = -R1^{-1} H1
        P_ff  = A P A^T + sigma^2 R1^{-1} R1^{-T}

    cand_* have leading axis cfg.max_promote (pre-ranked, cand_ok masks
    real entries). Sequential (static Python loop): later candidates see
    earlier ones' cross-covariances. Returns (state, done (max_promote,)
    bool — which candidates actually promoted).
    """
    L, D, s0 = cfg.num_slam, cfg.dim, cfg.slam_idx
    sig2 = cfg.pixel_noise**2
    done = []

    for i in range(cfg.max_promote):
        X, obs, mask = cand_X[i], cand_obs[i], cand_mask[i]
        fid, ok = cand_ids[i], cand_ok[i]

        live = state.lm_ids >= 0
        slot = jnp.argmin(live)                 # first empty slot
        ok = ok & ~jnp.all(live) & ~jnp.any(
            (state.lm_ids == fid) & live)

        r, Hx, Hf = feature_jacobians(cfg, X, obs, mask, state.win_R,
                                      state.win_p)
        Q, Rf = jnp.linalg.qr(Hf, mode="complete")
        Q1, R1 = Q[:, :3], Rf[:3]
        ok = ok & (jnp.min(jnp.abs(jnp.diag(R1))) > cfg.slam_min_r1)
        R1s = jnp.where(ok, R1, jnp.eye(3))     # keep solve well-posed
        Minv = jax.scipy.linalg.solve_triangular(R1s, jnp.eye(3))
        H1 = Q1.T @ Hx                          # (3, D)
        r1 = Q1.T @ r

        P = state.P
        A = -(Minv @ H1)
        Pfx = mm(A, P)                          # (3, D)
        Pff = mm(Pfx, A.T) + sig2 * mm(Minv, Minv.T)
        Xn = X + Minv @ r1
        ok = ok & jnp.all(jnp.isfinite(Xn)) & jnp.all(jnp.isfinite(Pfx)) \
            & jnp.all(jnp.diag(Pff) > 0)

        row0 = s0 + 3 * slot
        Pn = jax.lax.dynamic_update_slice(P, Pfx, (row0, 0))
        Pn = jax.lax.dynamic_update_slice(Pn, jnp.swapaxes(Pfx, 0, 1),
                                          (0, row0))
        Pn = jax.lax.dynamic_update_slice(Pn, Pff, (row0, row0))
        Pn = 0.5 * (Pn + Pn.T)

        state = state.replace(
            P=jnp.where(ok, Pn, P),
            lm_ids=state.lm_ids.at[slot].set(
                jnp.where(ok, fid, state.lm_ids[slot])),
            lm_xw=state.lm_xw.at[slot].set(
                jnp.where(ok, Xn, state.lm_xw[slot])),
            lm_missed=state.lm_missed.at[slot].set(
                jnp.where(ok, 0, state.lm_missed[slot])),
        )
        done.append(ok)
    return state, jnp.stack(done) if done else jnp.zeros(0, bool)
