"""SO(3)/SE(3) group types as JAX pytrees.

Functional parity with reference core/se3.h:11-169 (compose, act, inv,
log/exp, from_matrix3x4/from_RT, fitToSO3), extended with the full SE(3)
exp/log (the reference left OptimizeAlignment stubbed for lack of these,
src/evaluation.cpp:43-77) because BA and pose-graph layers need them.

Both types carry arbitrary leading batch dimensions and are registered
pytrees, so they pass transparently through jit/vmap/scan/pjit.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from visma_tpu.geom import rotations as rot
from visma_tpu.geom.rotations import mm, einsum_hp


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SO3:
    """Rotation group element(s); wraps a (...,3,3) matrix."""

    R: jnp.ndarray

    # --- pytree protocol ---
    def tree_flatten(self):
        return (self.R,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # --- factories ---
    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "SO3":
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        return cls(eye)

    @classmethod
    def exp(cls, w: jnp.ndarray) -> "SO3":
        return cls(rot.rodrigues(jnp.asarray(w)))

    @classmethod
    def from_matrix(cls, R: jnp.ndarray) -> "SO3":
        return cls(jnp.asarray(R))

    @classmethod
    def fit(cls, R_approx: jnp.ndarray) -> "SO3":
        """Project approximate rotation(s) onto SO(3) (se3.h:56-59)."""
        return cls(rot.project_so3(jnp.asarray(R_approx)))

    # --- group ops ---
    def __matmul__(self, other):
        if isinstance(other, SO3):
            return SO3(mm(self.R, other.R))
        return self.act(other)

    def act(self, v: jnp.ndarray) -> jnp.ndarray:
        """Rotate point(s) v with shape (...,3)."""
        return einsum_hp("...ij,...j->...i", self.R, v)

    def inv(self) -> "SO3":
        return SO3(jnp.swapaxes(self.R, -1, -2))

    def log(self) -> jnp.ndarray:
        return rot.invrodrigues(self.R)

    def matrix(self) -> jnp.ndarray:
        return self.R

    @property
    def shape(self):
        return self.R.shape[:-2]

    @property
    def dtype(self):
        return self.R.dtype


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SE3:
    """Rigid transform(s): rotation (...,3,3) + translation (...,3)."""

    R: jnp.ndarray
    t: jnp.ndarray

    def tree_flatten(self):
        return (self.R, self.t), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # --- factories ---
    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "SE3":
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return cls(eye, t)

    @classmethod
    def from_matrix3x4(cls, G: jnp.ndarray) -> "SE3":
        """(...,3,4) row-major [R|t] — the vlslam gwc convention
        (reference se3.h:147-152, dataloader.cpp:103-105)."""
        G = jnp.asarray(G)
        return cls(G[..., :3, :3], G[..., :3, 3])

    @classmethod
    def from_matrix(cls, G: jnp.ndarray) -> "SE3":
        """(...,4,4) homogeneous matrix."""
        G = jnp.asarray(G)
        return cls(G[..., :3, :3], G[..., :3, 3])

    @classmethod
    def from_Rt(cls, R, t) -> "SE3":
        R = R.R if isinstance(R, SO3) else jnp.asarray(R)
        return cls(R, jnp.asarray(t))

    @classmethod
    def exp(cls, xi: jnp.ndarray) -> "SE3":
        """SE(3) exponential. xi = (..., 6) as [rho, w] (trans, rot)."""
        xi = jnp.asarray(xi)
        rho, w = xi[..., :3], xi[..., 3:]
        R = rot.rodrigues(w)
        V = _left_jacobian(w)
        t = einsum_hp("...ij,...j->...i", V, rho)
        return cls(R, t)

    # --- group ops ---
    def __matmul__(self, other):
        if isinstance(other, SE3):
            return SE3(
                mm(self.R, other.R),
                einsum_hp("...ij,...j->...i", self.R, other.t) + self.t,
            )
        return self.act(other)

    def act(self, v: jnp.ndarray) -> jnp.ndarray:
        return einsum_hp("...ij,...j->...i", self.R, v) + self.t

    def inv(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -einsum_hp("...ij,...j->...i", Rt, self.t))

    def log(self) -> jnp.ndarray:
        """Tangent (...,6) as [rho, w]."""
        w = rot.invrodrigues(self.R)
        Vinv = _left_jacobian_inv(w)
        rho = einsum_hp("...ij,...j->...i", Vinv, self.t)
        return jnp.concatenate([rho, w], axis=-1)

    def so3(self) -> SO3:
        return SO3(self.R)

    @property
    def translation(self) -> jnp.ndarray:
        return self.t

    def matrix3x4(self) -> jnp.ndarray:
        return jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)

    def matrix(self) -> jnp.ndarray:
        G34 = self.matrix3x4()
        bottom = jnp.zeros_like(G34[..., :1, :]).at[..., 0, 3].set(1.0)
        return jnp.concatenate([G34, bottom], axis=-2)

    @property
    def shape(self):
        return self.R.shape[:-2]

    @property
    def dtype(self):
        return self.R.dtype


def _coeffs(w: jnp.ndarray):
    """Smooth series coefficients for the SE(3) left Jacobian."""
    th2 = jnp.sum(w * w, axis=-1)
    small = th2 < rot.SMALL_ANGLE**2
    th2s = jnp.where(small, jnp.ones_like(th2), th2)
    th = jnp.sqrt(th2s)
    # B = (1-cos th)/th^2, C = (th - sin th)/th^3
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2s)
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (th - jnp.sin(th)) / (th2s * th))
    return th2, small, B, C


def _left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V(w) = I + B*hat(w) + C*hat(w)^2."""
    _, _, B, C = _coeffs(w)
    W = rot.hat(w)
    W2 = mm(W, W)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def _left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of the left Jacobian."""
    th2 = jnp.sum(w * w, axis=-1)
    small = th2 < rot.SMALL_ANGLE**2
    th2s = jnp.where(small, jnp.ones_like(th2), th2)
    th = jnp.sqrt(th2s)
    half = 0.5 * th
    # D = (1 - th/2 * cot(th/2)) / th^2
    cot_term = half * jnp.cos(half) / jnp.sin(half)
    D = jnp.where(small, 1.0 / 12.0 + th2 / 720.0, (1.0 - cot_term) / th2s)
    W = rot.hat(w)
    W2 = mm(W, W)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + D[..., None, None] * W2
