"""Filter state pytrees.

Error-state layout (dimension D = 15 + 6M):
  [0:3)   attitude error (world frame, R <- exp(hat(dtheta)) R)
  [3:6)   position error
  [6:9)   velocity error
  [9:12)  gyro bias error
  [12:15) accel bias error
  [15+6m : 15+6m+6)  clone m: (attitude error, position error)

Clone slot m holds the camera pose at the m-th most recent frame in the
sliding window, slot window-1 = newest (the window rolls left on clone).

The track table's status column follows vlslam_pb.Feature.Status
(proto parity: vlslam.proto:11-19) so exported packets reproduce the
reference's feature lifecycle.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from visma_tpu.filter.config import FilterConfig
from visma_tpu.proto import FeatureStatus


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class TrackTable:
    """Fixed-capacity feature tracks aligned with the clone window.

    ids:    (K,) int32, -1 = empty slot
    status: (K,) int32 FeatureStatus
    obs:    (K, M, 2) pixel observations per window slot
    mask:   (K, M) bool, observation validity
    xw:     (K, 3) last triangulated world point (diagnostics/export)
    """

    ids: jnp.ndarray
    status: jnp.ndarray
    obs: jnp.ndarray
    mask: jnp.ndarray
    xw: jnp.ndarray

    def tree_flatten(self):
        return (self.ids, self.status, self.obs, self.mask, self.xw), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def empty(cls, K: int, M: int) -> "TrackTable":
        return cls(
            ids=jnp.full((K,), -1, jnp.int32),
            status=jnp.full((K,), int(FeatureStatus.EMPTY), jnp.int32),
            obs=jnp.zeros((K, M, 2), jnp.float32),
            mask=jnp.zeros((K, M), bool),
            xw=jnp.zeros((K, 3), jnp.float32),
        )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class FilterState:
    """Nominal state + covariance + track table.

    R: (3,3) world <- body rotation; p, v: (3,) position/velocity in world;
    bg, ba: (3,) biases. win_R (M,3,3) / win_p (M,3) are camera pose clones
    (world <- camera); win_valid (M,) marks filled slots. P is the (D, D)
    error covariance. t is the current time (scalar).

    R_bc/p_bc/td are the nominal camera-IMU calibration (extrinsics
    T_bc and time offset). Constant unless cfg.estimate_extrinsics /
    estimate_td put their errors in the state.

    lm_ids (L,) int32 / lm_xw (L,3) / lm_missed (L,) int32 are the SLAM
    landmark slots (cfg.num_slam; L may be 0): feature id (-1 = empty),
    world-point estimate, and consecutive-frames-unseen counter. Their
    error states live in P at cfg.slam_idx.
    """

    R: jnp.ndarray
    p: jnp.ndarray
    v: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    win_R: jnp.ndarray
    win_p: jnp.ndarray
    win_valid: jnp.ndarray
    P: jnp.ndarray
    tracks: TrackTable
    t: jnp.ndarray
    R_bc: jnp.ndarray
    p_bc: jnp.ndarray
    td: jnp.ndarray
    lm_ids: jnp.ndarray
    lm_xw: jnp.ndarray
    lm_missed: jnp.ndarray

    def tree_flatten(self):
        return (self.R, self.p, self.v, self.bg, self.ba, self.win_R,
                self.win_p, self.win_valid, self.P, self.tracks, self.t,
                self.R_bc, self.p_bc, self.td, self.lm_ids, self.lm_xw,
                self.lm_missed), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def replace(self, **kw) -> "FilterState":
        from dataclasses import replace as _replace

        return _replace(self, **kw)


def init_state(cfg: FilterConfig, R0=None, p0=None, v0=None,
               t0: float = 0.0) -> FilterState:
    D = cfg.dim
    P = jnp.zeros((D, D), jnp.float32)
    calib = []
    if cfg.estimate_extrinsics:
        calib.append(jnp.full(3, cfg.init_ext_att_std**2))
        calib.append(jnp.full(3, cfg.init_ext_pos_std**2))
    if cfg.estimate_td:
        calib.append(jnp.full(1, cfg.init_td_std**2))
    diag = jnp.concatenate([
        jnp.full(3, cfg.init_att_std**2),
        jnp.full(3, cfg.init_pos_std**2),
        jnp.full(3, cfg.init_vel_std**2),
        jnp.full(3, cfg.init_bg_std**2),
        jnp.full(3, cfg.init_ba_std**2),
        jnp.zeros(6 * cfg.window),
        *calib,
        jnp.zeros(3 * cfg.num_slam),   # empty landmark slots carry no cov
    ])
    P = P + jnp.diag(diag.astype(jnp.float32))
    return FilterState(
        R=jnp.eye(3, dtype=jnp.float32) if R0 is None else jnp.asarray(R0, jnp.float32),
        p=jnp.zeros(3, jnp.float32) if p0 is None else jnp.asarray(p0, jnp.float32),
        v=jnp.zeros(3, jnp.float32) if v0 is None else jnp.asarray(v0, jnp.float32),
        bg=jnp.zeros(3, jnp.float32),
        ba=jnp.zeros(3, jnp.float32),
        win_R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                               (cfg.window, 3, 3)),
        win_p=jnp.zeros((cfg.window, 3), jnp.float32),
        win_valid=jnp.zeros(cfg.window, bool),
        P=P,
        tracks=TrackTable.empty(cfg.max_tracks, cfg.window),
        t=jnp.asarray(t0, jnp.float32),
        R_bc=jnp.asarray(cfg.cam_R_bc, jnp.float32),
        p_bc=jnp.asarray(cfg.cam_p_bc, jnp.float32),
        td=jnp.asarray(cfg.td0, jnp.float32),
        lm_ids=jnp.full((cfg.num_slam,), -1, jnp.int32),
        lm_xw=jnp.zeros((cfg.num_slam, 3), jnp.float32),
        lm_missed=jnp.zeros((cfg.num_slam,), jnp.int32),
    )
