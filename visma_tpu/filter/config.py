"""Filter configuration."""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FilterConfig:
    # capacities (static shapes)
    window: int = 10          # M camera pose clones
    max_tracks: int = 64      # K feature slots
    max_updates: int = 32     # features consumed per update step
    imu_per_frame: int = 8    # max IMU samples between consecutive frames

    # camera
    fx: float = 400.0
    fy: float = 400.0
    cx: float = 320.0
    cy: float = 240.0

    # IMU noise (continuous-time densities)
    gyro_noise: float = 1.2e-3      # rad/s/sqrt(Hz)
    accel_noise: float = 8e-3       # m/s^2/sqrt(Hz)
    gyro_bias_walk: float = 1e-5
    accel_bias_walk: float = 1e-4

    # measurement noise (pixels)
    pixel_noise: float = 1.0

    # priors (stddev)
    init_att_std: float = 1e-3
    init_pos_std: float = 1e-6
    init_vel_std: float = 1e-2
    init_bg_std: float = 1e-3
    init_ba_std: float = 1e-2

    gravity: float = 9.81

    # vision-only fallback: when False, IMU mechanization is replaced by a
    # constant-velocity / constant-attitude process model (the VISMA
    # sequences ship images + upstream-VIO outputs but no raw IMU;
    # SURVEY §0). Scale is then a gauge freedom — evaluate ATE after
    # similarity alignment.
    use_imu: bool = True
    cv_rot_noise: float = 0.05   # rad/sqrt(s) attitude random walk
    cv_vel_noise: float = 0.5    # m/s/sqrt(s) velocity random walk

    # camera-IMU extrinsics T_bc (camera frame expressed in body/IMU
    # frame): G_wc = G_wb * T_bc. Tuples (hashable for jit closure
    # capture); identity = camera == body.
    cam_R_bc: tuple = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    cam_p_bc: tuple = (0.0, 0.0, 0.0)

    @property
    def has_extrinsics(self) -> bool:
        import numpy as _np

        return not (_np.allclose(self.cam_R_bc, _np.eye(3))
                    and _np.allclose(self.cam_p_bc, 0.0))

    # online calibration: append error states for the camera-IMU
    # extrinsics (6: attitude+position, right-perturbation
    # R_bc <- R_bc exp(hat(dtheta_bc))) and/or the camera-IMU time offset
    # (1: frame stamped at t_imu + td). Both enter measurements through
    # the clone Jacobian built at augment time (the clone pose is a
    # function of the calibration), so update.py needs no changes.
    estimate_extrinsics: bool = False
    estimate_td: bool = False
    init_ext_att_std: float = 0.03   # rad
    init_ext_pos_std: float = 0.03   # m
    init_td_std: float = 0.02        # s
    td0: float = 0.0                 # initial time-offset estimate (s)

    # update gating
    min_track_obs: int = 3
    max_reproj_error: float = 30.0  # px, triangulation sanity gate
    min_depth: float = 0.05
    max_depth: float = 50.0

    # hybrid MSCKF + SLAM landmarks. num_slam > 0 appends that many 3-dof
    # landmark error states after the calibration tail; long-lived tracks
    # promote into empty slots via delayed initialization (the left-range
    # rows of the feature Jacobian QR that the MSCKF nullspace update
    # discards), then update the filter every frame from a single fresh
    # observation — this is the proto's INSTATE lifecycle state
    # (vlslam.proto:11-19) made literal. schmidt=True runs them as
    # Schmidt/consider states: zero gain on the landmark block, so
    # landmark estimates and their covariance freeze while their
    # cross-correlations still damp the pose update (O(1) accuracy/cost
    # trade from the Schmidt-EKF VI-SLAM literature; see PAPERS.md).
    num_slam: int = 0
    schmidt: bool = False
    max_promote: int = 2         # landmark promotions per frame
    slam_max_missed: int = 10    # frames unseen before a slot is freed
    slam_chi2_scale: float = 8.0  # per-dof gate on landmark residuals
    slam_min_r1: float = 1e-3    # min |diag R1| to accept delayed init

    @property
    def dim(self) -> int:
        """Error-state dimension: 15 IMU + 6 per clone + calibration
        + 3 per SLAM landmark slot."""
        return (15 + 6 * self.window + 6 * self.estimate_extrinsics
                + 1 * self.estimate_td + 3 * self.num_slam)

    @property
    def ext_idx(self) -> int:
        """First column of the extrinsics error block (valid iff
        estimate_extrinsics)."""
        return 15 + 6 * self.window

    @property
    def td_idx(self) -> int:
        """Column of the time-offset error (valid iff estimate_td)."""
        return 15 + 6 * self.window + 6 * self.estimate_extrinsics

    @property
    def slam_idx(self) -> int:
        """First column of the SLAM landmark block (valid iff num_slam)."""
        return (15 + 6 * self.window + 6 * self.estimate_extrinsics
                + 1 * self.estimate_td)
