"""Hybrid MSCKF + in-state SLAM landmark tests (filter/slam.py).

The proto's INSTATE lifecycle state (vlslam.proto:11-19) made literal:
long-lived tracks promote into the EKF state by delayed initialization,
then update every frame. Covers: end-to-end recovery with landmarks on,
landmark position accuracy against the synthetic generator, Schmidt
(consider) mode, slot lifecycle, and covariance health.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from visma_tpu.filter import FilterConfig, Msckf
from visma_tpu.filter.feed import pack_frames
from visma_tpu.io.synthetic import (SyntheticConfig, make_dataset, make_imu,
                                    make_landmarks, make_trajectory)


def ate_rmse(p_est, p_gt):
    return float(np.sqrt(np.mean(np.sum((p_est - p_gt) ** 2, axis=1))))


def _run(num_slam=0, schmidt=False, num_frames=60, noise=0.5, seed=3):
    syn = SyntheticConfig(num_frames=num_frames, num_landmarks=120,
                          pixel_noise=noise, seed=seed)
    cfg = FilterConfig(window=8, max_tracks=96, max_updates=24,
                       imu_per_frame=8, fx=syn.fx, fy=syn.fy, cx=syn.cx,
                       cy=syn.cy, pixel_noise=max(noise, 0.5),
                       num_slam=num_slam, schmidt=schmidt)
    ds = make_dataset(syn)
    imu = make_imu(syn)
    frames = {k: jnp.asarray(v)
              for k, v in pack_frames(cfg, ds, imu, max_feats=96).items()
              if k != "ts"}
    _, gwc = make_trajectory(syn)
    kf = Msckf(cfg)
    s0 = kf.init(R0=gwc[0, :, :3], p0=gwc[0, :, 3], v0=imu["v0"])
    final, outs = kf.run(s0, frames)
    return syn, cfg, final, outs, gwc


class TestSlamLandmarks:
    def test_trajectory_recovery_with_landmarks(self):
        """End-to-end with 16 landmark slots: promotions happen, ATE stays
        in the pure-MSCKF envelope, covariance stays healthy."""
        syn, cfg, final, outs, gwc = _run(num_slam=16)
        ate = ate_rmse(np.asarray(outs["p"]), gwc[:, :, 3])
        assert ate < 0.03, f"ATE {ate:.4f} m with SLAM landmarks"

        lm_ids = np.asarray(final.lm_ids)
        assert (lm_ids >= 0).sum() > 0, "no landmarks ever promoted"
        P = np.asarray(final.P)
        assert np.isfinite(P).all()
        np.testing.assert_allclose(P, P.T, atol=1e-6)
        # live landmark marginals are positive, dead slots exactly zero
        s0_ = cfg.slam_idx
        for j in range(cfg.num_slam):
            d = np.diag(P)[s0_ + 3 * j : s0_ + 3 * j + 3]
            if lm_ids[j] >= 0:
                assert (d > 0).all()
            else:
                np.testing.assert_allclose(d, 0.0, atol=1e-12)

    def test_landmark_positions_match_truth(self):
        """Promoted landmark estimates converge to the generating world
        points (ids index make_landmarks)."""
        syn, cfg, final, outs, gwc = _run(num_slam=16)
        X_gt = make_landmarks(syn)
        lm_ids = np.asarray(final.lm_ids)
        lm_xw = np.asarray(final.lm_xw)
        live = lm_ids >= 0
        assert live.sum() > 0
        errs = np.linalg.norm(lm_xw[live] - X_gt[lm_ids[live]], axis=1)
        assert np.median(errs) < 0.05, f"median landmark err {errs}"

    def test_instate_status_exported(self):
        """Promotion frames mark the track INSTATE in the exported status
        stream (proto lifecycle parity)."""
        from visma_tpu.proto import FeatureStatus

        _, _, final, outs, _ = _run(num_slam=16)
        assert (np.asarray(outs["feat_status"])
                == int(FeatureStatus.INSTATE)).any()

    def test_schmidt_mode(self):
        """Schmidt/consider landmarks: estimates and their covariance
        freeze after init (zero gain on the landmark block) while the
        trajectory stays in the envelope."""
        syn, cfg, final, outs, gwc = _run(num_slam=16, schmidt=True)
        ate = ate_rmse(np.asarray(outs["p"]), gwc[:, :, 3])
        assert ate < 0.03, f"Schmidt ATE {ate:.4f} m"

        # a landmark promoted at frame t keeps its exact estimate until it
        # is dropped or the run ends: check the FIRST contiguous live
        # segment of each slot (a later re-promotion of the same feature
        # id legitimately re-estimates)
        ids = np.asarray(outs["lm_ids"])     # (N, L)
        xw = np.asarray(outs["lm_xw"])       # (N, L, 3)
        N, L = ids.shape
        checked = 0
        for j in range(L):
            runs = np.flatnonzero(ids[:, j] >= 0)
            if runs.size < 3:
                continue
            fid = ids[runs[0], j]
            seg = [runs[0]]
            for t in runs[1:]:
                if t == seg[-1] + 1 and ids[t, j] == fid:
                    seg.append(t)
                else:
                    break
            if len(seg) < 2:
                continue
            np.testing.assert_array_equal(xw[seg[1:], j],
                                          np.tile(xw[seg[0], j],
                                                  (len(seg) - 1, 1)))
            checked += 1
        assert checked > 0

    def test_slot_drop_on_loss(self):
        """slam_update lifecycle unit: a landmark unseen for
        slam_max_missed+1 frames frees its slot and zeroes its covariance
        rows/columns (decorrelation)."""
        from visma_tpu.filter.slam import slam_update
        from visma_tpu.filter.state import init_state

        cfg = FilterConfig(window=4, max_tracks=8, max_updates=4,
                           num_slam=2, slam_max_missed=2)
        s = init_state(cfg)
        s0_ = cfg.slam_idx
        # hand-install one live landmark with nonzero cov + cross terms
        P = np.asarray(s.P).copy()
        P[s0_:s0_ + 3, s0_:s0_ + 3] = 0.01 * np.eye(3)
        P[s0_:s0_ + 3, 3:6] = 1e-4
        P[3:6, s0_:s0_ + 3] = 1e-4
        s = s.replace(
            P=jnp.asarray(P),
            lm_ids=s.lm_ids.at[0].set(42),
            lm_xw=s.lm_xw.at[0].set(jnp.array([0.0, 0.0, 2.0])),
            win_valid=s.win_valid.at[-1].set(True),
        )
        ids = jnp.full(8, -1, jnp.int32)
        xp = jnp.zeros((8, 2))
        valid = jnp.zeros(8, bool)
        for k in range(cfg.slam_max_missed):
            s = slam_update(cfg, s, ids, xp, valid)
            assert int(s.lm_missed[0]) == k + 1
            assert int(s.lm_ids[0]) == 42
        s = slam_update(cfg, s, ids, xp, valid)   # missed exceeds limit
        assert int(s.lm_ids[0]) == -1
        P = np.asarray(s.P)
        np.testing.assert_allclose(P[s0_:s0_ + 3, :], 0.0, atol=1e-12)
        np.testing.assert_allclose(P[:, s0_:s0_ + 3], 0.0, atol=1e-12)

    def test_slam_beats_or_matches_msckf(self):
        """Hybrid mode must not degrade accuracy vs pure MSCKF on the
        same sequence (it consumes strictly more information)."""
        _, _, _, outs0, gwc = _run(num_slam=0)
        _, _, _, outs1, _ = _run(num_slam=16)
        ate0 = ate_rmse(np.asarray(outs0["p"]), gwc[:, :, 3])
        ate1 = ate_rmse(np.asarray(outs1["p"]), gwc[:, :, 3])
        assert ate1 < ate0 * 1.5, (ate0, ate1)

    def test_in_state_mask(self):
        from visma_tpu.filter.slam import in_state

        lm_ids = jnp.asarray([3, -1, 7, -1])
        ids = jnp.asarray([7, 1, 3, -1])
        got = np.asarray(in_state(lm_ids, ids))
        np.testing.assert_array_equal(got, [True, False, True, False])
