"""SO3/SE3 group-law and exp/log tests (reference parity: core/se3.h)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visma_tpu.geom import SO3, SE3

KEY = jax.random.PRNGKey(42)


def rand_se3(seed, scale=1.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    w = jax.random.normal(k1, (3,), jnp.float32)
    w = w / jnp.linalg.norm(w) * (scale * 1.3)
    t = jax.random.normal(k2, (3,), jnp.float32)
    return SE3.from_Rt(SO3.exp(w), t)


class TestSO3:
    def test_compose_inv(self):
        a = SO3.exp(jnp.array([0.3, -0.2, 0.9]))
        b = SO3.exp(jnp.array([-1.0, 0.1, 0.2]))
        c = a @ b
        ident = (c @ c.inv()).matrix()
        np.testing.assert_allclose(ident, jnp.eye(3), atol=1e-6)

    def test_exp_log_roundtrip(self):
        w = jnp.array([0.4, -0.7, 0.2])
        np.testing.assert_allclose(SO3.exp(w).log(), w, atol=1e-5)

    def test_act(self):
        a = SO3.exp(jnp.array([0.0, 0.0, jnp.pi / 2]))
        v = jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(a.act(v), jnp.array([0.0, 1.0, 0.0]), atol=1e-6)


class TestSE3:
    def test_compose_matches_matrix(self):
        g1, g2 = rand_se3(0), rand_se3(1)
        prod = (g1 @ g2).matrix()
        np.testing.assert_allclose(prod, g1.matrix() @ g2.matrix(), atol=1e-5)

    def test_inv(self):
        g = rand_se3(2)
        np.testing.assert_allclose((g @ g.inv()).matrix(), jnp.eye(4), atol=1e-5)

    def test_act_matches_homogeneous(self):
        g = rand_se3(3)
        p = jnp.array([0.3, 1.0, -2.0])
        np.testing.assert_allclose(g.act(p), (g.matrix() @ jnp.append(p, 1.0))[:3], atol=1e-5)

    @pytest.mark.parametrize("seed", range(5))
    def test_exp_log_roundtrip(self, seed):
        xi = jax.random.normal(jax.random.PRNGKey(seed), (6,), jnp.float32)
        xi = xi.at[3:].multiply(0.8)
        g = SE3.exp(xi)
        np.testing.assert_allclose(g.log(), xi, atol=1e-4)

    def test_exp_zero(self):
        g = SE3.exp(jnp.zeros(6))
        np.testing.assert_allclose(g.matrix(), jnp.eye(4), atol=1e-7)

    def test_log_pure_translation(self):
        g = SE3.from_Rt(jnp.eye(3), jnp.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(g.log(), jnp.array([1, 2, 3, 0, 0, 0.0]), atol=1e-6)

    def test_from_matrix3x4_row_major(self):
        """The vlslam gwc convention: row-major 3x4 [R|t] (dataloader.cpp:103-105)."""
        g = rand_se3(4)
        flat = np.asarray(g.matrix3x4()).reshape(-1)  # row-major
        g2 = SE3.from_matrix3x4(jnp.asarray(flat).reshape(3, 4))
        np.testing.assert_allclose(g2.matrix(), g.matrix(), atol=1e-6)

    def test_jit_scan_compatible(self):
        """SE3 is a pytree: must pass through jit + scan."""
        g0 = rand_se3(5)
        delta = SE3.exp(jnp.array([0.01, 0, 0, 0, 0, 0.02]))

        @jax.jit
        def roll(g):
            def step(carry, _):
                nxt = carry @ delta
                return nxt, nxt.t
            return jax.lax.scan(step, g, None, length=10)

        _, ts = roll(g0)
        assert ts.shape == (10, 3)

    def test_vmap_batch(self):
        gs = jax.vmap(lambda s: SE3.exp(jnp.ones(6) * 0.1 * s))(jnp.arange(4.0))
        assert gs.R.shape == (4, 3, 3)
        logs = gs.log()
        assert logs.shape == (4, 6)
