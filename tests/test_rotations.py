"""Jacobian cross-checks for the rotation layer.

Strategy mirrors reference core/test/test_rodrigues.cpp (analytic vs numeric
Jacobians, plus small-angle branches), with jax.jacfwd as the numeric oracle
instead of finite differences.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visma_tpu.geom import (
    hat, vee, dhat, dvee, dAt_dA, dAB_dA, dAB_dB,
    rodrigues, rodrigues_jac, invrodrigues, invrodrigues_jac, project_so3,
)

KEY = jax.random.PRNGKey(0)


def rand(key, *shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


class TestHatVee:
    def test_hat_antisymmetric(self):
        w = rand(KEY, 3)
        W = hat(w)
        np.testing.assert_allclose(W, -W.T, atol=1e-7)

    def test_vee_hat_identity(self):
        # reference vee (rodrigues.h:38-41) is the doubled version:
        # vee(hat(w)) = 2w (hence the 0.5 factors in invrodrigues).
        w = rand(KEY, 3)
        np.testing.assert_allclose(vee(hat(w)), 2.0 * w, atol=1e-6)

    def test_hat_cross_product(self):
        k1, k2 = jax.random.split(KEY)
        u, v = rand(k1, 3), rand(k2, 3)
        np.testing.assert_allclose(hat(u) @ v, jnp.cross(u, v), atol=1e-6)

    def test_dhat_vs_jacfwd(self):
        w = rand(KEY, 3)
        J = jax.jacfwd(lambda x: hat(x).reshape(9))(w)
        np.testing.assert_allclose(dhat(), J, atol=1e-7)

    def test_dvee_vs_jacfwd(self):
        R = rand(KEY, 3, 3)
        J = jax.jacfwd(lambda X: vee(X.reshape(3, 3)))(R.reshape(9))
        np.testing.assert_allclose(dvee(), J, atol=1e-7)

    def test_batched(self):
        w = rand(KEY, 5, 3)
        assert hat(w).shape == (5, 3, 3)
        np.testing.assert_allclose(vee(hat(w)), 2.0 * w, atol=1e-6)


class TestMatrixCalculus:
    def test_dAt_dA(self):
        A = rand(KEY, 3, 3)
        J = jax.jacfwd(lambda x: x.reshape(3, 3).T.reshape(9))(A.reshape(9))
        np.testing.assert_allclose(dAt_dA(3, 3), J, atol=1e-7)

    def test_dAt_dA_rect(self):
        A = rand(KEY, 2, 4)
        J = jax.jacfwd(lambda x: x.reshape(2, 4).T.reshape(8))(A.reshape(8))
        np.testing.assert_allclose(dAt_dA(2, 4), J, atol=1e-7)

    def test_dAB_dA(self):
        k1, k2 = jax.random.split(KEY)
        A, B = rand(k1, 3, 3), rand(k2, 3, 3)
        J = jax.jacfwd(lambda x: (x.reshape(3, 3) @ B).reshape(9))(A.reshape(9))
        np.testing.assert_allclose(dAB_dA(A, B), J, atol=1e-6)

    def test_dAB_dB(self):
        k1, k2 = jax.random.split(KEY)
        A, B = rand(k1, 3, 3), rand(k2, 3, 3)
        J = jax.jacfwd(lambda x: (A @ x.reshape(3, 3)).reshape(9))(B.reshape(9))
        np.testing.assert_allclose(dAB_dB(A, B), J, atol=1e-6)

    def test_dAB_rectangular(self):
        k1, k2 = jax.random.split(KEY)
        A, B = rand(k1, 2, 3), rand(k2, 3, 4)
        JA = jax.jacfwd(lambda x: (x.reshape(2, 3) @ B).reshape(8))(A.reshape(6))
        JB = jax.jacfwd(lambda x: (A @ x.reshape(3, 4)).reshape(8))(B.reshape(12))
        np.testing.assert_allclose(dAB_dA(A, B), JA, atol=1e-6)
        np.testing.assert_allclose(dAB_dB(A, B), JB, atol=1e-6)


class TestRodrigues:
    @pytest.mark.parametrize("seed", range(4))
    def test_rotation_properties(self, seed):
        w = rand(jax.random.PRNGKey(seed), 3)
        R = rodrigues(w)
        np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    @pytest.mark.parametrize("seed", range(4))
    def test_jacobian_vs_jacfwd(self, seed):
        w = rand(jax.random.PRNGKey(seed), 3)
        _, J = rodrigues_jac(w)
        J_auto = jax.jacfwd(lambda x: rodrigues(x).reshape(9))(w)
        np.testing.assert_allclose(J, J_auto, atol=1e-4)

    def test_small_angle(self):
        w = jnp.array([1e-9, -2e-9, 1e-9], dtype=jnp.float32)
        R, J = rodrigues_jac(w)
        np.testing.assert_allclose(R, jnp.eye(3) + hat(w), atol=1e-7)
        np.testing.assert_allclose(J, dhat(), atol=1e-6)
        # value path too
        np.testing.assert_allclose(rodrigues(w), jnp.eye(3) + hat(w), atol=1e-7)

    def test_jacfwd_no_nan_at_zero(self):
        J = jax.jacfwd(rodrigues)(jnp.zeros(3, dtype=jnp.float32))
        assert np.isfinite(np.asarray(J)).all()

    def test_roundtrip(self):
        for seed in range(6):
            w = rand(jax.random.PRNGKey(seed), 3)
            # keep |w| < pi for invertibility
            w = w / (jnp.linalg.norm(w) + 1e-9) * (0.1 + 2.8 * jax.random.uniform(jax.random.PRNGKey(seed + 99)))
            np.testing.assert_allclose(invrodrigues(rodrigues(w)), w, atol=2e-3)

    def test_batched_matches_single(self):
        ws = rand(KEY, 7, 3)
        Rb = rodrigues(ws)
        for i in range(7):
            np.testing.assert_allclose(Rb[i], rodrigues(ws[i]), atol=1e-6)


class TestInvRodrigues:
    @pytest.mark.parametrize("seed", range(4))
    def test_jacobian_vs_jacfwd(self, seed):
        w = rand(jax.random.PRNGKey(seed), 3)
        w = w / (jnp.linalg.norm(w) + 1e-9) * 1.5
        R = rodrigues(w)
        _, J = invrodrigues_jac(R)
        J_auto = jax.jacfwd(lambda x: invrodrigues(x.reshape(3, 3)))(R.reshape(9))
        np.testing.assert_allclose(J, J_auto, atol=2e-3)

    def test_small_angle(self):
        R = jnp.eye(3, dtype=jnp.float32)
        w, J = invrodrigues_jac(R)
        np.testing.assert_allclose(w, jnp.zeros(3), atol=1e-7)
        np.testing.assert_allclose(J, 0.5 * dvee(), atol=1e-6)


class TestProjectSO3:
    def test_projects_noisy_rotation(self):
        w = rand(KEY, 3)
        R = rodrigues(w)
        noisy = R + 0.01 * rand(jax.random.PRNGKey(1), 3, 3)
        P = project_so3(noisy)
        np.testing.assert_allclose(P @ P.T, jnp.eye(3), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(P), 1.0, atol=1e-5)
        assert jnp.linalg.norm(P - R) < 0.05

    def test_fixes_reflection(self):
        R = jnp.diag(jnp.array([1.0, 1.0, -1.0], dtype=jnp.float32))
        P = project_so3(R)
        np.testing.assert_allclose(jnp.linalg.det(P), 1.0, atol=1e-5)
