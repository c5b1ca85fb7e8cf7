"""Gauss-Newton BA with Schur-complement landmark marginalization.

TPU shape: all per-landmark algebra is batched (L, ...) einsums; the
reduced camera system assembly is one scatter-add into (K,K,6,6) blocks;
the only sequential parts are the dense (6K x 6K) Cholesky and the GN
outer loop. Landmark axis L is the sharding axis for the distributed
version (visma_tpu.dist.sharded_ba) — this module exposes the per-shard
pieces (`build_reduced_system`, `backsub_landmarks`) it reuses.

Robustness: Huber weights on the pixel residual; Levenberg damping;
gauge fixed by freezing pose 0.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from visma_tpu.ba.problem import BaProblem
from visma_tpu.geom.rotations import hat, mm, rodrigues


def _residual_jacobians(prob: BaProblem):
    """Vectorized residuals + Jacobians for every (landmark, pose) pair.

    r (L,K,2); Jp (L,K,2,6) w.r.t. pose error [dtheta(world), dp];
    Jl (L,K,2,3) w.r.t. landmark. Masked pairs are zeroed.
    """
    fx, fy, cx, cy = prob.intr[0], prob.intr[1], prob.intr[2], prob.intr[3]
    Rt = jnp.swapaxes(prob.R, -1, -2)                       # (K,3,3)
    diff = prob.X[:, None, :] - prob.p[None, :, :]          # (L,K,3)
    Xc = jnp.einsum("kij,lkj->lki", Rt, diff)               # (L,K,3)
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-6, 1e-6, Xc[..., 2])
    pred = jnp.stack([fx * Xc[..., 0] / z + cx,
                      fy * Xc[..., 1] / z + cy], axis=-1)
    r = (prob.obs - pred) * prob.mask[..., None]

    L, K = prob.mask.shape
    Jproj = jnp.zeros((L, K, 2, 3), jnp.float32)
    Jproj = Jproj.at[..., 0, 0].set(fx / z)
    Jproj = Jproj.at[..., 0, 2].set(-fx * Xc[..., 0] / z**2)
    Jproj = Jproj.at[..., 1, 1].set(fy / z)
    Jproj = Jproj.at[..., 1, 2].set(-fy * Xc[..., 1] / z**2)
    Jproj = Jproj * prob.mask[..., None, None]

    # dXc/dtheta_k = R_k^T hat(X - p_k); dXc/dp_k = -R_k^T; dXc/dX = R_k^T
    dXc_dth = jnp.einsum("kij,lkjm->lkim", Rt, hat(diff))   # (L,K,3,3)
    Jth = jnp.einsum("lkab,lkbc->lkac", Jproj, dXc_dth)
    Jp_pos = -jnp.einsum("lkab,kbc->lkac", Jproj, Rt)
    Jp = jnp.concatenate([Jth, Jp_pos], axis=-1)            # (L,K,2,6)
    Jl = jnp.einsum("lkab,kbc->lkac", Jproj, Rt)            # (L,K,2,3)
    return r, Jp, Jl


def _huber_weights(r: jnp.ndarray, delta: float):
    """Huber IRLS weights with a hard trim: residuals beyond 5*delta are
    gross outliers (w=0) — pure Huber leaves 80px outliers pulling with
    weight delta/r, which measurably biases pose and scale."""
    nrm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(nrm <= delta, 1.0, delta / jnp.maximum(nrm, 1e-9))
    return jnp.where(nrm > 5.0 * delta, 0.0, w)


def build_blocks(prob: BaProblem, damping: float, huber_delta: float = 5.0):
    """Per-shard Schur building blocks (everything the distributed solvers
    need locally): Hpp (K,6,6) per-pose Hessian partial, bp (K,6),
    Hll_inv (L,3,3), Hpl (L,K,6,3), bl (L,3). Sums over the landmark axis
    are PARTIAL on a landmark shard — psum them over the mesh."""
    r, Jp, Jl = _residual_jacobians(prob)
    w = _huber_weights(r, huber_delta) * prob.mask          # (L,K)

    Jp_w = Jp * w[..., None, None]
    Hpp = jnp.einsum("lkai,lkaj->kij", Jp_w, Jp)
    bp = jnp.einsum("lkai,lka->ki", Jp_w, r)
    Hll = jnp.einsum("lkai,lkaj->lij", Jl * w[..., None, None], Jl)
    Hll = Hll + (damping + 1e-6) * jnp.eye(3)[None]
    bl = jnp.einsum("lkai,lka->li", Jl * w[..., None, None], r)
    Hpl = jnp.einsum("lkai,lkaj->lkij", Jp_w, Jl)           # (L,K,6,3)
    Hll_inv = jnp.linalg.inv(Hll)                           # (L,3,3)
    return Hpp, bp, Hll_inv, Hpl, bl


def build_reduced_system(prob: BaProblem, damping: float,
                         huber_delta: float = 5.0,
                         scale_anchor: jnp.ndarray = None,
                         scale_weight: float = 1e6):
    """Schur-reduce landmarks. Returns (S (6K,6K), b (6K,), aux) where aux
    carries what back-substitution needs (Hll_inv, Hpl, bl).

    scale_anchor: target ||p1 - p0|| closing the monocular scale gauge
    (reprojection cost is exactly invariant to scaling the scene about the
    fixed pose 0; without this prior the solver random-walks along that
    null direction)."""
    L, K = prob.mask.shape
    Hpp, bp, Hll_inv, Hpl, bl = build_blocks(prob, damping, huber_delta)

    # S = Hpp(diag) - sum_l Hpl Hll^-1 Hpl^T  (full (K,K) block structure)
    T1 = jnp.einsum("lkij,ljm->lkim", Hpl, Hll_inv)         # (L,K,6,3)
    S_off = jnp.einsum("lkim,lqjm->kqij", T1, Hpl)          # (K,K,6,6)
    S = -S_off
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hpp)
    b = bp - jnp.einsum("lkim,lm->ki", T1, bl)              # (K,6)

    S_dense = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    # Levenberg damping on the camera system + gauge fixing of pose 0.
    # The additive floor must scale with the matrix: f32 roundoff in the
    # Schur einsums perturbs eigenvalues by ~eps * ||S||, which drives
    # weakly-constrained directions slightly negative and kills Cholesky.
    floor = 1e-6 * jnp.max(jnp.abs(jnp.diag(S_dense))) + 1e-8
    S_dense = S_dense + damping * jnp.diag(jnp.diag(S_dense)) \
        + floor * jnp.eye(6 * K)
    gauge = jnp.arange(6 * K) < 6
    S_dense = jnp.where(gauge[:, None] | gauge[None, :],
                        jnp.where(jnp.arange(6 * K)[:, None]
                                  == jnp.arange(6 * K)[None, :], 1e6, 0.0),
                        S_dense)
    b_dense = jnp.where(gauge, 0.0, b.reshape(-1))

    if scale_anchor is not None:
        # prior residual: scale_anchor - ||p_last - p0||, anchored on the
        # LONGEST baseline (pose K-1) so initialization noise perturbs the
        # pinned scale least. Jacobian w.r.t. p_last = e.
        dvec = prob.p[K - 1] - prob.p[0]
        dn = jnp.maximum(jnp.linalg.norm(dvec), 1e-9)
        e = dvec / dn
        base = 6 * (K - 1) + 3  # last pose's position rows
        S_dense = S_dense.at[base : base + 3, base : base + 3].add(
            scale_weight * jnp.outer(e, e))
        b_dense = b_dense.at[base : base + 3].add(
            scale_weight * e * (scale_anchor - dn))
    return S_dense, b_dense, (Hll_inv, Hpl, bl)


def backsub_landmarks(aux, dxp: jnp.ndarray):
    """dxl_l = Hll^-1 (bl - Hpl^T dxp)."""
    Hll_inv, Hpl, bl = aux
    K = Hpl.shape[1]
    dxp_k = dxp.reshape(K, 6)
    rhs = bl - jnp.einsum("lkij,ki->lj", Hpl, dxp_k)
    return jnp.einsum("lij,lj->li", Hll_inv, rhs)


def _apply(prob: BaProblem, dxp, dxl) -> BaProblem:
    K = prob.num_poses
    d = dxp.reshape(K, 6)
    R = jax.vmap(lambda w, Rm: mm(rodrigues(w), Rm))(d[:, :3], prob.R)
    return BaProblem(R=R, p=prob.p + d[:, 3:], X=prob.X + dxl,
                     obs=prob.obs, mask=prob.mask, intr=prob.intr)


def total_cost(prob: BaProblem, huber_delta: float = 5.0):
    r, _, _ = _residual_jacobians(prob)
    nrm = jnp.linalg.norm(r, axis=-1)
    quad = 0.5 * nrm**2
    lin = huber_delta * (nrm - 0.5 * huber_delta)
    c = jnp.where(nrm <= huber_delta, quad, lin) * prob.mask
    return jnp.sum(c)


@functools.partial(jax.jit, static_argnames=())
def ba_step(prob: BaProblem, damping: jnp.ndarray,
            scale_anchor: jnp.ndarray = None) -> Tuple[BaProblem, jnp.ndarray]:
    """One damped GN step; returns (new problem, new cost)."""
    with jax.default_matmul_precision("highest"):
        S, b, aux = build_reduced_system(prob, damping,
                                         scale_anchor=scale_anchor)
        cho = jax.scipy.linalg.cho_factor(0.5 * (S + S.T))
        dxp = jax.scipy.linalg.cho_solve(cho, b)
        dxl = backsub_landmarks(aux, dxp)
        new = _apply(prob, dxp, dxl)
        return new, total_cost(new)


@functools.partial(jax.jit, static_argnames=("iters",))
def _ba_run(prob0: BaProblem, damping: jnp.ndarray, iters: int):
    anchor = jnp.linalg.norm(prob0.p[-1] - prob0.p[0])

    def body(carry, _):
        cur, lam, cost = carry
        cand, cand_cost = ba_step(cur, lam, anchor)
        better = cand_cost < cost
        nxt = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), cand, cur)
        lam_new = jnp.where(better, jnp.maximum(lam * 0.5, 1e-6),
                            jnp.minimum(lam * 4.0, 1e2))
        c_new = jnp.where(better, cand_cost, cost)
        return (nxt, lam_new, c_new), c_new

    c0 = total_cost(prob0)
    (sol, _, _), hist = jax.lax.scan(
        body, (prob0, damping, c0), None, length=iters)
    return sol, hist


def ba_solve(prob: BaProblem, iters: int = 10, damping: float = 1e-3
             ) -> Tuple[BaProblem, jnp.ndarray]:
    """LM-flavored loop: accept steps that reduce cost, else raise damping.

    Returns (solution, cost history (iters,)). The jitted loop is a
    module-level function so repeated solves reuse the live executable
    (a per-call jit closure would redo persistent-cache deserialization
    every call — the Msckf.run lesson)."""
    return _ba_run(prob, jnp.asarray(damping, jnp.float32), iters)
