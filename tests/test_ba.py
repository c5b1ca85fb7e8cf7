"""BA + pose-graph + distributed-BA tests (8 virtual CPU devices)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from visma_tpu.ba import ba_solve, ba_step, pose_graph_solve
from visma_tpu.ba.problem import synthetic_ba_problem
from visma_tpu.ba.gauss_newton import total_cost
from visma_tpu.dist import make_mesh, sharded_ba_solve, sharded_ba_step


class TestBA:
    def test_cost_decreases_and_recovers(self):
        prob, truth = synthetic_ba_problem(num_poses=8, num_landmarks=64,
                                           noise_px=0.5, pose_noise=0.03)
        c0 = float(total_cost(prob))
        sol, hist = ba_solve(prob, iters=12)
        cf = float(total_cost(sol))
        assert cf < 0.2 * c0, (c0, cf)

        # monocular BA gauge: pose 0 pins 6 DOF, scale floats — evaluate
        # with the standard Sim(3)-aligned ATE
        from visma_tpu.align import umeyama

        T = np.asarray(umeyama(jnp.asarray(np.asarray(sol.p)),
                               jnp.asarray(truth["p"].astype(np.float32)),
                               with_scaling=True))
        scale = np.linalg.norm(T[:3, 0])
        # scale is anchored on the (noisy) init baseline: loose bound
        assert abs(scale - 1.0) < 0.25
        p_al = np.asarray(sol.p) @ T[:3, :3].T + T[:3, 3]
        p_err = np.linalg.norm(p_al - truth["p"], axis=1)
        assert p_err.max() < 0.01, p_err.max()
        for k in range(8):
            dR = Rotation.from_matrix(
                np.asarray(sol.R[k]).T @ truth["R"][k]).magnitude()
            assert dR < 0.02, (k, dR)

    def test_gauge_pose_fixed(self):
        prob, _ = synthetic_ba_problem()
        R0, p0 = np.asarray(prob.R[0]), np.asarray(prob.p[0])
        sol, _ = ba_solve(prob, iters=5)
        np.testing.assert_allclose(np.asarray(sol.R[0]), R0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sol.p[0]), p0, atol=1e-5)

    def test_huber_downweights_outliers(self):
        prob, truth = synthetic_ba_problem(num_poses=6, num_landmarks=48,
                                           noise_px=0.3, pose_noise=0.02,
                                           seed=2)
        # corrupt 5% of observations grossly
        obs = np.asarray(prob.obs)
        rng = np.random.default_rng(0)
        bad = rng.random(obs.shape[:2]) < 0.05
        obs = obs + bad[..., None] * 80.0
        from visma_tpu.ba.problem import BaProblem

        prob_bad = BaProblem(R=prob.R, p=prob.p, X=prob.X,
                             obs=jnp.asarray(obs), mask=prob.mask,
                             intr=prob.intr)
        sol, _ = ba_solve(prob_bad, iters=15)
        from visma_tpu.align import umeyama

        T = np.asarray(umeyama(jnp.asarray(np.asarray(sol.p)),
                               jnp.asarray(truth["p"].astype(np.float32)),
                               with_scaling=True))
        p_al = np.asarray(sol.p) @ T[:3, :3].T + T[:3, 3]
        p_err = np.linalg.norm(p_al - truth["p"], axis=1)
        assert p_err.max() < 0.02, p_err.max()


class TestPoseGraph:
    def test_loop_closure_fixes_drift(self):
        """Odometry chain with accumulated drift + exact loop closure."""
        K = 12
        rng = np.random.default_rng(1)
        # ground-truth poses on a circle
        R_gt, p_gt = [], []
        for k in range(K):
            th = 2 * np.pi * k / K
            R_gt.append(Rotation.from_euler("z", th).as_matrix())
            p_gt.append(np.array([np.cos(th), np.sin(th), 0.0]))
        R_gt, p_gt = np.asarray(R_gt), np.asarray(p_gt)

        # noisy odometry estimates (drifting chain)
        R_est = [R_gt[0]]
        p_est = [p_gt[0]]
        for k in range(1, K):
            dR = R_gt[k - 1].T @ R_gt[k]
            dp = R_gt[k - 1].T @ (p_gt[k] - p_gt[k - 1])
            nR = Rotation.from_rotvec(rng.normal(scale=0.03, size=3)).as_matrix()
            R_est.append(R_est[-1] @ dR @ nR)
            p_est.append(p_est[-1] + R_est[-2] @ dp + rng.normal(scale=0.02, size=3))
        R_est, p_est = np.asarray(R_est), np.asarray(p_est)
        drift0 = np.linalg.norm(p_est - p_gt, axis=1).max()

        # edges: exact relative measurements (odometry + loop closure)
        ei, ej, Rm, pm = [], [], [], []
        for k in range(1, K):
            ei.append(k - 1); ej.append(k)
            Rm.append(R_gt[k - 1].T @ R_gt[k])
            pm.append(R_gt[k - 1].T @ (p_gt[k] - p_gt[k - 1]))
        ei.append(K - 1); ej.append(0)  # loop closure
        Rm.append(R_gt[K - 1].T @ R_gt[0])
        pm.append(R_gt[K - 1].T @ (p_gt[0] - p_gt[K - 1]))

        R_opt, p_opt = pose_graph_solve(
            jnp.asarray(R_est, jnp.float32), jnp.asarray(p_est, jnp.float32),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.asarray(Rm), jnp.float32),
            jnp.asarray(np.asarray(pm), jnp.float32), iters=15)
        err = np.linalg.norm(np.asarray(p_opt) - p_gt, axis=1).max()
        assert err < 0.02, (drift0, err)
        assert err < drift0 * 0.25


class TestShardedBA:
    def test_matches_single_device(self):
        assert jax.device_count() >= 8, "conftest must provide 8 cpu devices"
        prob, truth = synthetic_ba_problem(num_poses=8, num_landmarks=96,
                                           noise_px=0.5, pose_noise=0.03)
        mesh = make_mesh(8)
        sol_d, hist_d = sharded_ba_solve(prob, mesh, iters=10)
        sol_s, hist_s = ba_solve(prob, iters=10)
        # same optimum (float-order differences compound through the LM
        # accept/reject path, so compare optima loosely and both to truth)
        np.testing.assert_allclose(np.asarray(sol_d.p), np.asarray(sol_s.p),
                                   atol=5e-3)
        from visma_tpu.align import umeyama

        for sol in (sol_d, sol_s):
            T = np.asarray(umeyama(jnp.asarray(np.asarray(sol.p)),
                                   jnp.asarray(truth["p"].astype(np.float32)),
                                   with_scaling=True))
            p_al = np.asarray(sol.p) @ T[:3, :3].T + T[:3, 3]
            assert np.linalg.norm(p_al - truth["p"], axis=1).max() < 0.01

    def test_single_step_equivalence(self):
        prob, _ = synthetic_ba_problem(num_poses=6, num_landmarks=64,
                                       seed=3)
        from visma_tpu.ba.gauss_newton import ba_step

        mesh = make_mesh(4)
        new_d, cost_d = sharded_ba_step(prob, mesh, damping=1e-3)
        anchor = jnp.linalg.norm(prob.p[-1] - prob.p[0])
        new_s, cost_s = ba_step(prob, jnp.asarray(1e-3), anchor)
        np.testing.assert_allclose(float(cost_d), float(cost_s), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(new_d.p), np.asarray(new_s.p),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(new_d.X), np.asarray(new_s.X),
                                   atol=1e-4)

    def test_landmark_padding(self):
        """L not divisible by mesh size must still work."""
        prob, _ = synthetic_ba_problem(num_poses=5, num_landmarks=50, seed=4)
        mesh = make_mesh(8)  # 50 % 8 != 0
        sol, hist = sharded_ba_solve(prob, mesh, iters=3)
        assert sol.num_landmarks == 50
        assert np.isfinite(np.asarray(sol.p)).all()
