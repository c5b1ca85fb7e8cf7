"""Camera-IMU extrinsics: the filter must recover the CAMERA trajectory
when the IMU rides on a displaced/rotated body frame."""
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from visma_tpu.filter import FilterConfig, Msckf
from visma_tpu.io.synthetic import (SyntheticConfig, imu_from_poses,
                                    make_dataset, make_trajectory)


def test_filter_with_extrinsics():
    syn = SyntheticConfig(num_frames=60, num_landmarks=120, pixel_noise=0.0,
                          seed=13)
    spf = 8
    dt = 1.0 / (syn.fps * spf)
    S = (syn.num_frames - 1) * spf + 1

    # camera trajectory at IMU sample times (same closed form as
    # make_trajectory but densely sampled)
    ts = np.arange(S) * dt
    th = syn.angular_rate * ts
    cam_p = np.stack([syn.radius * np.cos(th), syn.radius * np.sin(th),
                      syn.height + 0.1 * np.sin(2.3 * th)], axis=1)
    from visma_tpu.io.synthetic import _look_at

    cam_R = np.stack([_look_at(cam_p[i], np.zeros(3),
                               np.array([0.0, 0.0, 1.0])) for i in range(S)])

    # body = camera composed with T_bc^-1  (G_wb = G_wc * T_bc^-1)
    R_bc = Rotation.from_rotvec([0.1, -0.2, 0.15]).as_matrix()
    p_bc = np.array([0.08, -0.05, 0.03])
    body_R = cam_R @ R_bc.T
    body_p = cam_p - np.einsum("nij,j->ni", body_R, p_bc)

    imu = imu_from_poses(body_R, body_p, dt, gravity=syn.gravity)
    # stamps at interval ends (pack_frames convention)
    imu_feed = {"ts": ts[1:], "gyro": imu["gyro"], "accel": imu["accel"]}

    cfg = FilterConfig(window=8, max_tracks=96, max_updates=24,
                       fx=syn.fx, fy=syn.fy, cx=syn.cx, cy=syn.cy,
                       pixel_noise=0.5,
                       cam_R_bc=tuple(map(tuple, R_bc)),
                       cam_p_bc=tuple(p_bc))
    assert cfg.has_extrinsics

    ds = make_dataset(syn)  # observations are of the CAMERA trajectory
    from visma_tpu.filter.feed import pack_frames

    frames = {k: jnp.asarray(v)
              for k, v in pack_frames(cfg, ds, imu_feed, max_feats=96).items()
              if k != "ts"}
    kf = Msckf(cfg)
    s0 = kf.init(R0=body_R[0], p0=body_p[0], v0=imu["v0"])
    _, outs = kf.run(s0, frames)

    # body estimate composed with extrinsics must match the camera truth
    _, gwc = make_trajectory(syn)
    est_body_R = np.asarray(outs["R"])
    est_body_p = np.asarray(outs["p"])
    est_cam_p = est_body_p + np.einsum("nij,j->ni", est_body_R, p_bc)
    ate = float(np.sqrt(np.mean(np.sum(
        (est_cam_p - gwc[:, :, 3]) ** 2, axis=1))))
    assert ate < 0.02, f"extrinsics ATE {ate:.4f} m"


def test_identity_extrinsics_unchanged():
    cfg = FilterConfig()
    assert not cfg.has_extrinsics
