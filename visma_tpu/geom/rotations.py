"""Rotation maps and matrix differential calculus in JAX.

Functional parity with the reference's core/rodrigues.h (hat/vee and their
differentials, Kronecker-style vectorized product derivatives, Rodrigues
exp/log with analytic 9x3 / 3x9 Jacobians and small-angle branches), built
TPU-first:

* everything is pure jnp, jit-safe, and batchable with vmap;
* small-angle branches are `jnp.where` selections over *safe* operands (no
  NaN leaks through jacfwd/jacrev), not Python branches;
* Jacobian vectorization is row-major throughout: for f: R^3 -> R^{3x3},
  J[3*i+j, k] = d f[i,j] / d w[k].  (The reference mixes row-major `dhat`
  with one column-major `Map` in its dR_dth term, rodrigues.h:176-179; we
  implement the consistent row-major convention — the intended behavior —
  and verify against jax.jacfwd in tests.)

Reference citations: /root/reference/core/rodrigues.h:9-237.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 3x3 geometry matmuls are tiny; always run them at full f32 precision.
# (On TPU the default f32 matmul uses bf16 passes — fine for image kernels,
# fatal for pose chains and covariance algebra.)
mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
einsum_hp = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

# Small-angle thresholds (reference: rodrigues.h:154 uses 1e-8 on the angle,
# rodrigues.h:196 uses trace-based 1e-10). In f32 those thresholds underflow
# the useful range, so we branch a little earlier; values verified against
# finite differences in tests/test_rotations.py.
SMALL_ANGLE = 1e-6
SMALL_TRACE = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: w (...,3) -> skew matrix (...,3,3)."""
    w = jnp.asarray(w)
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], z, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def vee(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat up to symmetrization: R (...,3,3) -> (...,3).

    vee(R) = [R21-R12, R02-R20, R10-R01] (reference rodrigues.h:38-41).
    """
    return jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )


def dhat(dtype=jnp.float32) -> jnp.ndarray:
    """Constant 9x3 Jacobian of hat (row-major vec): d vec(hat(w)) / d w."""
    D = jnp.zeros((9, 3), dtype=dtype)
    # element (i,j) at row 3*i+j
    D = D.at[0 * 3 + 1, 2].set(-1.0)
    D = D.at[0 * 3 + 2, 1].set(1.0)
    D = D.at[1 * 3 + 0, 2].set(1.0)
    D = D.at[1 * 3 + 2, 0].set(-1.0)
    D = D.at[2 * 3 + 0, 1].set(-1.0)
    D = D.at[2 * 3 + 1, 0].set(1.0)
    return D


def dvee(dtype=jnp.float32) -> jnp.ndarray:
    """Constant 3x9 Jacobian of vee (row-major vec of R)."""
    D = jnp.zeros((3, 9), dtype=dtype)
    D = D.at[0, 2 * 3 + 1].set(1.0)
    D = D.at[0, 1 * 3 + 2].set(-1.0)
    D = D.at[1, 0 * 3 + 2].set(1.0)
    D = D.at[1, 2 * 3 + 0].set(-1.0)
    D = D.at[2, 1 * 3 + 0].set(1.0)
    D = D.at[2, 0 * 3 + 1].set(-1.0)
    return D


def dAt_dA(n: int = 3, m: int = 3, dtype=jnp.float32) -> jnp.ndarray:
    """Jacobian of transpose under row-major vec: vec(A^T) = D @ vec(A)."""
    idx = jnp.arange(n * m)
    # row r = m*? ... for output element (j,i) of A^T at row j*n+i maps to A (i,j) at i*m+j
    rows = jnp.arange(m * n)
    j, i = rows // n, rows % n
    cols = i * m + j
    D = jnp.zeros((m * n, n * m), dtype=dtype).at[rows, cols].set(1.0)
    del idx
    return D


def dAB_dA(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """d vec(A@B) / d vec(A), row-major vec. Shape (N*P, N*M)."""
    N, M = A.shape
    P = B.shape[1]
    eye = jnp.eye(N, dtype=A.dtype)
    # d(AB)[n,p]/dA[n,m] = B[m,p]  ->  kron(I_N, B^T)
    return jnp.kron(eye, B.T.astype(A.dtype)).reshape(N * P, N * M)


def dAB_dB(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """d vec(A@B) / d vec(B), row-major vec. Shape (N*P, M*P)."""
    N, M = A.shape
    P = B.shape[1]
    eye = jnp.eye(P, dtype=A.dtype)
    # d(AB)[n,p]/dB[m,p] = A[n,m]  ->  kron(A, I_P)
    return jnp.kron(A, eye).reshape(N * P, M * P)


def _safe_norm(w: jnp.ndarray, eps: float):
    """Norm that is safe to differentiate at 0: returns (norm, is_small)."""
    sq = jnp.sum(w * w, axis=-1)
    is_small = sq < eps * eps
    # keep the sqrt argument bounded away from 0 on the small branch so its
    # gradient is finite; the branch result is discarded there.
    safe = jnp.sqrt(jnp.where(is_small, jnp.ones_like(sq), sq))
    return safe, is_small


def rodrigues(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: axis-angle (...,3) -> rotation matrix (...,3,3).

    R = I + sin(th)/th * hat(w) + (1-cos(th))/th^2 * hat(w)^2, with the
    reference's small-angle fallback R = I + hat(w) (rodrigues.h:154-161)
    realized as the first-order limit of the smooth coefficients.
    """
    w = jnp.asarray(w)
    th, is_small = _safe_norm(w, SMALL_ANGLE)
    W = hat(w)
    W2 = mm(W, W)
    sin_c = jnp.where(is_small, jnp.ones_like(th), jnp.sin(th) / th)
    cos_c = jnp.where(is_small, 0.5 * jnp.ones_like(th), (1.0 - jnp.cos(th)) / (th * th))
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + sin_c[..., None, None] * W + cos_c[..., None, None] * W2


def rodrigues_jac(w: jnp.ndarray):
    """Rodrigues with analytic Jacobian.

    Returns (R, dR_dw) where dR_dw has shape (9, 3) (row-major vec of R),
    matching the closed-form derivation in reference rodrigues.h:143-182
    (with the consistent row-major stacking, see module docstring).
    Unbatched input only; vmap for batches.
    """
    w = jnp.asarray(w)
    th, is_small = _safe_norm(w, SMALL_ANGLE)
    inv_th = 1.0 / th
    u = w * inv_th[..., None]
    U = hat(u)
    U2 = mm(U, U)
    sin_th, cos_th = jnp.sin(th), jnp.cos(th)

    eye = jnp.eye(3, dtype=w.dtype)
    R_big = eye + sin_th * U + (1.0 - cos_th) * U2
    R_small = eye + hat(w)
    R = jnp.where(is_small, R_small, R_big)

    D = dhat(w.dtype)
    # dR_du = sin(th) dhat + (1-cos)(dAB_dA(U,U)+dAB_dB(U,U)) dhat
    dR_du = sin_th * D + (1.0 - cos_th) * mm(dAB_dA(U, U) + dAB_dB(U, U), D)
    du_dw = inv_th * (eye - jnp.outer(u, u))
    dR_dth = (U * cos_th + U2 * sin_th).reshape(9, 1)  # row-major vec
    J_big = mm(dR_du, du_dw) + mm(dR_dth, u.reshape(1, 3))
    J = jnp.where(is_small, D, J_big)
    return R, J


def invrodrigues(R: jnp.ndarray) -> jnp.ndarray:
    """Log map: rotation matrix (...,3,3) -> axis-angle (...,3).

    Mirrors reference rodrigues.h:184-226: w = th/(2 sin th) * vee(R) with
    small-angle fallback w = vee(R)/2 when trace(R) ~ 3.

    Note: like the reference, accurate away from th = pi (the reference has
    no pi-branch either; angles in VISMA data are frame-to-frame increments).
    """
    tmp = 0.5 * (jnp.trace(R, axis1=-2, axis2=-1) - 1.0)
    v = vee(R)
    is_small = tmp > 1.0 - SMALL_TRACE
    tmp_c = jnp.clip(tmp, -1.0 + 1e-7, 1.0 - 1e-7)
    th = jnp.arccos(tmp_c)
    sin_th = jnp.sin(th)
    coef = jnp.where(is_small, 0.5 * jnp.ones_like(th), 0.5 * th / sin_th)
    return coef[..., None] * v


def invrodrigues_jac(R: jnp.ndarray):
    """Log map with analytic 3x9 Jacobian (row-major vec of R).

    Matches reference rodrigues.h:212-224. Unbatched; vmap for batches.
    """
    tmp = 0.5 * (jnp.trace(R) - 1.0)
    v = vee(R)
    is_small = tmp > 1.0 - SMALL_TRACE
    Dv = dvee(R.dtype)

    tmp_c = jnp.clip(tmp, -1.0 + 1e-7, 1.0 - 1e-7)
    th = jnp.arccos(tmp_c)
    sin_th = jnp.sin(th)
    inv_sin = 1.0 / sin_th
    u = 0.5 * v * inv_sin
    w_big = th * u
    w_small = 0.5 * v
    w = jnp.where(is_small, w_small, w_big)

    # dth_dR = -1/sqrt(1-tmp^2) * 0.5 * vec(I)
    dtmp_dR = 0.5 * jnp.eye(3, dtype=R.dtype).reshape(1, 9)
    denom = jnp.sqrt(jnp.maximum(1.0 - tmp_c * tmp_c, 1e-12))
    dth_dR = (-1.0 / denom) * dtmp_dR
    du_dR = 0.5 * (Dv * inv_sin - jnp.outer(v, (jnp.cos(th) * inv_sin * inv_sin) * dth_dR.ravel()))
    J_big = jnp.outer(u, dth_dR.ravel()) + th * du_dR
    J_small = 0.5 * Dv
    J = jnp.where(is_small, J_small, J_big)
    return w, J


def project_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Project an approximate rotation to SO(3) via SVD (rodrigues.h:229-237).

    Uses the sign-corrected projection U diag(1,1,det(UV^T)) V^T so the
    result is a proper rotation even if the input has negative determinant
    (the reference omits the sign fix; for near-rotations they coincide).
    """
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(mm(U, Vt))
    S = jnp.concatenate(
        [jnp.ones_like(R[..., :2, 0]), det[..., None]], axis=-1
    )
    return mm(U * S[..., None, :], Vt)
