"""Frontend tests: pyramid, detection, KLT tracking on synthetic imagery."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visma_tpu.frontend import (build_pyramid, detect_features,
                                track_features, FeatureTracker)


def textured_image(H=128, W=160, seed=0):
    """Smooth random texture with good gradients everywhere."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (H // 8, W // 8)).astype(np.float32)
    import cv2

    return cv2.resize(img, (W, H), interpolation=cv2.INTER_CUBIC)


def shift_image(img, dx, dy):
    """Subpixel shift via cv2 warpAffine (the tracking ground truth)."""
    import cv2

    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT)


class TestPyramid:
    def test_levels_and_shapes(self):
        img = jnp.asarray(textured_image(64, 96))
        pyr = build_pyramid(img, 3)
        assert len(pyr) == 3
        assert pyr[0].shape == (64, 96)
        assert pyr[1].shape == (32, 48)
        assert pyr[2].shape == (16, 24)
        np.testing.assert_allclose(float(pyr[1].mean()),
                                   float(pyr[0].mean()), atol=1e-3)


class TestDetect:
    def test_finds_strong_corners(self):
        img = np.zeros((96, 128), np.float32)
        for (y, x) in [(30, 40), (60, 90), (20, 100)]:
            img[y:, x:] += 100.0  # stacked step corners
        xy, score, valid = detect_features(jnp.asarray(img), 16, cell=16)
        got = np.asarray(xy)[np.asarray(valid)]
        for (y, x) in [(30, 40), (60, 90)]:
            d = np.min(np.linalg.norm(got - np.array([x, y]), axis=1))
            assert d < 3.0, (x, y, d)

    def test_spread_over_grid(self):
        img = jnp.asarray(textured_image())
        xy, _, valid = detect_features(img, 32, cell=16)
        got = np.asarray(xy)[np.asarray(valid)]
        assert len(got) >= 20
        # no two detections in the same cell
        cells = {(int(x) // 16, int(y) // 16) for x, y in got}
        assert len(cells) == len(got)

    def test_occupied_cells_skipped(self):
        img = jnp.asarray(textured_image())
        H, W = img.shape
        occ = jnp.ones((H // 16, W // 16), bool).at[0, :].set(False)
        xy, _, valid = detect_features(img, 32, cell=16, occupied=occ)
        got = np.asarray(xy)[np.asarray(valid)]
        assert (got[:, 1] < 16).all()  # only top cell row allowed


class TestKLT:
    @pytest.mark.parametrize("shift", [(1.3, -0.8), (4.2, 2.7), (9.5, -6.0)])
    def test_recovers_known_shift(self, shift):
        dx, dy = shift
        img0 = textured_image()
        img1 = shift_image(img0, dx, dy)
        p0 = tuple(build_pyramid(jnp.asarray(img0), 3))
        p1 = tuple(build_pyramid(jnp.asarray(img1), 3))
        xy, _, valid = detect_features(jnp.asarray(img0), 24, cell=16,
                                       border=16)
        new_xy, ok = track_features(p0, p1, xy, valid)
        ok = np.asarray(ok)
        assert ok.sum() >= 10
        d = np.asarray(new_xy)[ok] - np.asarray(xy)[ok]
        err = np.linalg.norm(d - np.array([dx, dy]), axis=1)
        assert np.median(err) < 0.25, np.median(err)

    def test_flat_region_rejected(self):
        img0 = np.full((64, 96), 50.0, np.float32)
        p0 = tuple(build_pyramid(jnp.asarray(img0), 2))
        pts = jnp.asarray([[48.0, 32.0]])
        _, ok = track_features(p0, p0, pts, jnp.asarray([True]), levels=2)
        assert not bool(ok[0])  # degenerate gradient matrix


class TestTracker:
    def test_ids_persist_and_replenish(self):
        img0 = textured_image(seed=1)
        tr = FeatureTracker(max_features=32, cell=16)
        st = tr.init(jnp.asarray(img0))
        ids0 = np.asarray(st.ids)
        assert (ids0 >= 0).sum() >= 20

        img1 = shift_image(img0, 2.0, 1.0)
        st, ids1, xp1, valid1 = tr.step(st, jnp.asarray(img1))
        ids1, valid1 = np.asarray(ids1), np.asarray(valid1)
        survived = set(ids0[ids0 >= 0]) & set(ids1[valid1])
        assert len(survived) >= 15  # most tracks persist
        # (per-track displacement accuracy covered by TestKLT and
        # test_sequence_unique_ids)

    def test_sequence_unique_ids(self):
        img = textured_image(seed=2)
        tr = FeatureTracker(max_features=24, cell=16)
        st = tr.init(jnp.asarray(img))
        seen = {}
        for k in range(5):
            img = shift_image(img, 3.0, -2.0)
            st, ids, xp, valid = tr.step(st, jnp.asarray(img))
            ids, xp, valid = np.asarray(ids), np.asarray(xp), np.asarray(valid)
            for i in np.nonzero(valid)[0]:
                fid = int(ids[i])
                if fid in seen:
                    # same id must refer to a continuously tracked point:
                    # displacement between consecutive frames ~ (3, -2)
                    prev = seen[fid]
                    if prev[0] == k - 1:
                        d = xp[i] - prev[1]
                        assert np.linalg.norm(d - np.array([3.0, -2.0])) < 1.5
                seen[fid] = (k, xp[i].copy())
        assert len(seen) >= 24  # replenishment created new ids over time


class TestKltWindowedParity:
    """The windowed matmul-selection tracker (the production TPU path)
    must agree with the gather-based oracle implementation."""

    def test_matches_gather_oracle(self):
        """Interior features (patch fully inside the image at every
        pyramid level) must track to the same positions. Near coarse-level
        borders the two implementations clamp differently (the windowed
        path rejects conservatively where the sliding-window path tracked
        a degraded template) — excluded by the detection border."""
        from visma_tpu.frontend.klt import track_features_gather

        img0 = textured_image()
        img1 = shift_image(img0, 3.4, -2.1)
        p0 = tuple(build_pyramid(jnp.asarray(img0), 3))
        p1 = tuple(build_pyramid(jnp.asarray(img1), 3))
        # border = (r + 2) * 2^(levels-1): patches stay interior at the
        # coarsest level too
        xy, _, valid = detect_features(jnp.asarray(img0), 24, cell=16,
                                       border=28)
        new_w, ok_w = track_features(p0, p1, xy, valid)
        new_g, ok_g = track_features_gather(p0, p1, xy, valid)
        ok_w, ok_g = np.asarray(ok_w), np.asarray(ok_g)
        np.testing.assert_array_equal(ok_w, ok_g)
        both = ok_w & ok_g
        assert both.sum() >= 8
        np.testing.assert_allclose(np.asarray(new_w)[both],
                                   np.asarray(new_g)[both], atol=0.05)

    def test_window_margin_limits_large_motion(self):
        """Motion beyond what coarse levels + window margin can express is
        rejected (not silently wrong)."""
        img0 = textured_image()
        img1 = shift_image(img0, 60.0, 0.0)   # huge shift
        p0 = tuple(build_pyramid(jnp.asarray(img0), 3))
        p1 = tuple(build_pyramid(jnp.asarray(img1), 3))
        xy, _, valid = detect_features(jnp.asarray(img0), 16, cell=16,
                                       border=16)
        new_xy, ok = track_features(p0, p1, xy, valid)
        d = np.asarray(new_xy)[np.asarray(ok)] - np.asarray(xy)[np.asarray(ok)]
        if len(d):  # any survivor must be near the true shift
            err = np.linalg.norm(d - np.array([60.0, 0.0]), axis=1)
            assert np.median(err) < 1.0


class TestKltFused:
    """The fused Pallas LK (klt_fused.track_features_fused) must match the
    windowed-matmul production tracker for interior features. Kernel runs
    in interpret mode on CPU (no TPU in CI)."""

    def _setup(self, dx=3.4, dy=-2.1, border=28):
        img0 = textured_image()
        img1 = shift_image(img0, dx, dy)
        p0 = tuple(build_pyramid(jnp.asarray(img0), 3))
        p1 = tuple(build_pyramid(jnp.asarray(img1), 3))
        xy, _, valid = detect_features(jnp.asarray(img0), 24, cell=16,
                                       border=border)
        return p0, p1, xy, valid

    def test_f32_matches_windowed_tracker(self):
        from visma_tpu.frontend.klt_fused import track_features_fused

        p0, p1, xy, valid = self._setup()
        # win=40 matches klt.track_features' refinement margin so the two
        # paths see the same clamp-free interior problem
        new_f, ok_f = track_features_fused(p0, p1, xy, valid, win=40,
                                           interpret=True)
        new_w, ok_w = track_features(p0, p1, xy, valid)
        ok_f, ok_w = np.asarray(ok_f), np.asarray(ok_w)
        both = ok_f & ok_w
        assert both.sum() >= 8
        # every windowed-accepted interior feature is fused-accepted
        assert (ok_f | ~ok_w).all()
        np.testing.assert_allclose(np.asarray(new_f)[both],
                                   np.asarray(new_w)[both], atol=0.05)

    def test_recovers_known_shift_default_window(self):
        from visma_tpu.frontend.klt_fused import track_features_fused

        dx, dy = 4.2, 2.7
        p0, p1, xy, valid = self._setup(dx, dy)
        new_xy, ok = track_features_fused(p0, p1, xy, valid,
                                          interpret=True)
        ok = np.asarray(ok)
        assert ok.sum() >= 8
        d = np.asarray(new_xy)[ok] - np.asarray(xy)[ok]
        err = np.linalg.norm(d - np.array([dx, dy]), axis=1)
        assert np.median(err) < 0.25, np.median(err)

    def test_bf16_extract_close_to_f32(self):
        from visma_tpu.frontend.klt_fused import track_features_fused

        p0, p1, xy, valid = self._setup()
        new_f, ok_f = track_features_fused(p0, p1, xy, valid,
                                           interpret=True)
        new_b, ok_b = track_features_fused(p0, p1, xy, valid,
                                           interpret=True,
                                           bf16_extract=True)
        both = np.asarray(ok_f) & np.asarray(ok_b)
        assert both.sum() >= 8
        # bf16 selection rounds the image to 8 mantissa bits; subpixel
        # positions stay within a tenth of a pixel of the f32 path
        np.testing.assert_allclose(np.asarray(new_b)[both],
                                   np.asarray(new_f)[both], atol=0.1)

    def test_small_window_raises(self):
        from visma_tpu.frontend.klt_fused import lk_level_fused

        K = 8
        wins = jnp.zeros((8, 8, K))
        st = jnp.zeros((2, K))
        with pytest.raises(ValueError, match="too small"):
            lk_level_fused(wins, wins, st, st, radius=5, interpret=True)

    def test_tiny_levels_skipped_not_corrupted(self):
        """A pyramid whose coarse level cannot host the patch window must
        still track (refinement skipped there, not clamp-extrapolated)."""
        from visma_tpu.frontend.klt_fused import track_features_fused

        img0 = textured_image(48, 64)
        img1 = shift_image(img0, 2.0, 1.5)
        p0 = tuple(build_pyramid(jnp.asarray(img0), 3))  # level 2: 12x16
        p1 = tuple(build_pyramid(jnp.asarray(img1), 3))
        xy, _, valid = detect_features(jnp.asarray(img0), 8, cell=16,
                                       border=12)
        new_xy, ok = track_features_fused(p0, p1, xy, valid, radius=5,
                                          interpret=True)
        ok = np.asarray(ok)
        assert ok.sum() >= 2
        d = np.asarray(new_xy)[ok] - np.asarray(xy)[ok]
        err = np.linalg.norm(d - np.array([2.0, 1.5]), axis=1)
        assert np.median(err) < 0.3, np.median(err)

    def test_tracker_fused_flag(self):
        """FeatureTracker(fused=True) runs the fused path end-to-end."""
        import visma_tpu.frontend.klt_fused as KF

        orig = KF.track_features_fused
        calls = []

        def spy(*a, **k):
            k["interpret"] = True
            calls.append(1)
            return orig(*a, **k)

        import visma_tpu.frontend.tracker as TR

        old = TR.track_features_fused
        try:
            TR.track_features_fused = spy
            tr = FeatureTracker(max_features=16, cell=16, fused=True)
            img0 = textured_image(seed=3)
            st = tr.init(jnp.asarray(img0))
            img1 = shift_image(img0, 2.0, 1.0)
            st, ids, xp, valid = tr._step_impl(st, jnp.asarray(img1))
        finally:
            TR.track_features_fused = old
        assert calls, "fused path not taken"
        assert int(np.asarray(valid).sum()) >= 8


class TestDetectPallas:
    def test_pallas_score_matches_xla(self):
        from visma_tpu.frontend.detect import (_corner_score_xla,
                                               corner_score_pallas)

        img = jnp.asarray(textured_image())
        ref = np.asarray(_corner_score_xla(img, 5, 8, 1e-4))
        got = np.asarray(corner_score_pallas(img, 5, 8, 1e-4,
                                             interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-4 * max(1.0, ref.max()))

    def test_detect_pallas_path_matches_xla(self):
        from visma_tpu.frontend.detect import detect_features as df

        img = jnp.asarray(textured_image())
        # interpret-mode pallas full path vs xla full path
        import visma_tpu.frontend.detect as D

        orig = D.corner_score_pallas
        try:
            D.corner_score_pallas = lambda im, w, b, mr: orig(
                im, w, b, mr, interpret=True)
            xy_p, s_p, v_p = df(img, 24, cell=16, use_pallas=True)
        finally:
            D.corner_score_pallas = orig
        xy_x, s_x, v_x = df(img, 24, cell=16, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_x))
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(xy_p), np.asarray(xy_x))
