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
from visma_tpu.geom.rotations import hat, mm, rodrigues


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
    """Scan over a fixed-size IMU batch; masked samples carry dt == 0.

    gyro/accel: (S, 3); dts: (S,) with 0 for padding slots.
    """

    def body(s, inp):
        g, a, dt = inp
        return _step(cfg, s, g, a, dt), None

    out, _ = jax.lax.scan(body, state, (gyro, accel, dts))
    return out
