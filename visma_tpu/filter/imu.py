"""Error-state IMU propagation.

Standard MSCKF mechanization: nominal state integrated with the exponential
map; covariance propagated with the discrete error-state transition.
All matmuls at HIGHEST precision (covariances in f32 on TPU need it).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from visma_tpu.filter.config import FilterConfig
from visma_tpu.filter.state import FilterState
from visma_tpu.geom.rotations import einsum_hp, hat, mm, rodrigues


def _step(cfg: FilterConfig, state: FilterState, gyro, accel, dt):
    """One IMU sample. dt may be 0 (masked sample) — then it's a no-op."""
    g_w = jnp.array([0.0, 0.0, -cfg.gravity], jnp.float32)
    w = gyro - state.bg
    a = accel - state.ba

    R = state.R
    a_w = R @ a + g_w

    # nominal integration (midpoint on rotation)
    dR = rodrigues(w * dt)
    R_new = mm(R, dR)
    v_new = state.v + a_w * dt
    p_new = state.p + state.v * dt + 0.5 * a_w * dt * dt

    # error-state transition (world-frame attitude error):
    # dtheta' = dtheta - R dbg dt
    # dp'     = dp + dv dt
    # dv'     = dv - hat(R a) dtheta dt - R dba dt
    D = cfg.dim
    F = jnp.eye(D, dtype=jnp.float32)
    Ra = R @ a
    F = F.at[3:6, 6:9].set(jnp.eye(3) * dt)
    F = F.at[6:9, 0:3].set(-hat(Ra) * dt)
    F = F.at[6:9, 12:15].set(-R * dt)
    F = F.at[0:3, 9:12].set(-R * dt)

    # process noise (discrete)
    Q = jnp.zeros((D, D), jnp.float32)
    Q = Q.at[0:3, 0:3].set(jnp.eye(3) * cfg.gyro_noise**2 * dt)
    Q = Q.at[6:9, 6:9].set(jnp.eye(3) * cfg.accel_noise**2 * dt)
    Q = Q.at[9:12, 9:12].set(jnp.eye(3) * cfg.gyro_bias_walk**2 * dt)
    Q = Q.at[12:15, 12:15].set(jnp.eye(3) * cfg.accel_bias_walk**2 * dt)

    P_new = mm(mm(F, state.P), F.T) + Q
    P_new = 0.5 * (P_new + P_new.T)

    return state.replace(R=R_new, p=p_new, v=v_new, P=P_new,
                         t=state.t + dt)


def propagate_cv(cfg: FilterConfig, state: FilterState,
                 dt: jnp.ndarray) -> FilterState:
    """Vision-only process model: constant velocity, constant attitude,
    biases frozen (their noise stays zero so they never move). Used when
    cfg.use_imu is False — the fallback for sequences without raw IMU.

    Error-state transition: dp' = dp + dv dt; attitude and velocity pick up
    random-walk process noise (cv_rot_noise / cv_vel_noise)."""
    D = cfg.dim
    p_new = state.p + state.v * dt

    F = jnp.eye(D, dtype=jnp.float32).at[3:6, 6:9].set(jnp.eye(3) * dt)
    Q = jnp.zeros((D, D), jnp.float32)
    Q = Q.at[0:3, 0:3].set(jnp.eye(3) * cfg.cv_rot_noise**2 * dt)
    Q = Q.at[6:9, 6:9].set(jnp.eye(3) * cfg.cv_vel_noise**2 * dt)

    P_new = mm(mm(F, state.P), F.T) + Q
    P_new = 0.5 * (P_new + P_new.T)
    return state.replace(p=p_new, P=P_new, t=state.t + dt)


def propagate(cfg: FilterConfig, state: FilterState, gyro: jnp.ndarray,
              accel: jnp.ndarray, dts: jnp.ndarray) -> FilterState:
    """Propagate over a fixed-size IMU batch; masked samples carry dt == 0.

    gyro/accel: (S, 3); dts: (S,) with 0 for padding slots.

    TREE-PARALLEL (no sequential per-sample chain): the r3 on-chip profile
    (docs/PROFILE_FILTER_r04.md) showed the 8-sample sequential scan of
    tiny 15x15 matmuls dominating the whole frame step (0.161 of 0.32
    ms/frame — latency-bound, each sample waiting on the last). All
    per-sample quantities batch:

      1. dR_k = rodrigues((w_k - bg) dt_k), batched;
      2. attitude prefix products via lax.associative_scan (log2 S levels
         of batched 3x3 products instead of an S-chain);
      3. a_w / v / p as cumulative sums (elementwise);
      4. per-sample transitions F_k built batched, then the (Phi, Q) pair
         composed by the associative rule
             (Phi_b, Q_b) ∘ (Phi_a, Q_a) = (Phi_b Phi_a,
                                            Phi_b Q_a Phi_b^T + Q_b)
         again via associative_scan — log2 S levels of batched 15x15
         products;
      5. the full (D, D) covariance conjugated ONCE:
         P' = [[Phi P11 Phi^T + Q, Phi P12], [P21 Phi^T, P22]].

    Numerics differ from the sequential fold only by f32 association
    order; _step remains the single-sample reference implementation and
    the sequential/parallel parity is pinned in tests/test_filter.py."""
    g_w = jnp.array([0.0, 0.0, -cfg.gravity], jnp.float32)
    I3 = jnp.eye(3, dtype=jnp.float32)
    S = dts.shape[0]
    dt = dts[:, None]

    w = gyro - state.bg                                   # (S,3)
    a = accel - state.ba                                  # (S,3)
    dR = rodrigues(w * dt)                                # (S,3,3)

    # attitude prefix products (dt=0 gives dR=I: masked samples are no-ops
    # everywhere below because every contribution carries a factor dt)
    cum = jax.lax.associative_scan(mm, dR)                # (S,3,3)
    R_after = einsum_hp("ij,sjk->sik", state.R, cum)
    R_pre = jnp.concatenate([state.R[None], R_after[:-1]], axis=0)

    Ra = einsum_hp("sij,sj->si", R_pre, a)                # (S,3)
    a_w = Ra + g_w
    dv = a_w * dt
    v_after = state.v + jnp.cumsum(dv, axis=0)
    v_pre = v_after - dv
    p = state.p + jnp.sum(v_pre * dt + 0.5 * a_w * dt * dt, axis=0)
    t = state.t + jnp.sum(dts)

    # batched error-state transitions (world-frame attitude error):
    # dtheta' = dtheta - R dbg dt; dp' = dp + dv dt;
    # dv' = dv - hat(R a) dtheta dt - R dba dt
    F = jnp.broadcast_to(jnp.eye(15, dtype=jnp.float32), (S, 15, 15))
    Rdt = R_pre * dt[..., None]
    F = F.at[:, 3:6, 6:9].set(I3 * dt[..., None])
    F = F.at[:, 6:9, 0:3].set(-hat(Ra) * dt[..., None])
    F = F.at[:, 6:9, 12:15].set(-Rdt)
    F = F.at[:, 0:3, 9:12].set(-Rdt)

    Qd = jnp.zeros((S, 15), jnp.float32)
    Qd = Qd.at[:, 0:3].set(cfg.gyro_noise**2 * dt)
    Qd = Qd.at[:, 6:9].set(cfg.accel_noise**2 * dt)
    Qd = Qd.at[:, 9:12].set(cfg.gyro_bias_walk**2 * dt)
    Qd = Qd.at[:, 12:15].set(cfg.accel_bias_walk**2 * dt)
    Qk = jax.vmap(jnp.diag)(Qd)                           # (S,15,15)

    def combine(ab, cd):
        # ab happened first: composed transition = cd after ab
        Pa, Qa = ab
        Pb, Qb = cd
        return mm(Pb, Pa), mm(mm(Pb, Qa), jnp.swapaxes(Pb, -1, -2)) + Qb

    Phis, Qs = jax.lax.associative_scan(combine, (F, Qk))
    Phi, Q15 = Phis[-1], Qs[-1]

    P = state.P
    Pn = P.at[:15, :].set(mm(Phi, P[:15, :]))
    Pn = Pn.at[:, :15].set(mm(Pn[:, :15], Phi.T))
    Pn = Pn.at[:15, :15].add(Q15)
    Pn = 0.5 * (Pn + Pn.T)
    return state.replace(R=R_after[-1], p=p, v=v_after[-1], P=Pn, t=t)
