"""Pose-graph optimization: GN on SE(3) relative-pose constraints.

Edges (i, j, T_ij_meas): residual = log(T_ij_meas^-1 T_i^-1 T_j) in se(3).
Jacobians by jax.jacfwd over the 6-dof perturbations (graphs in the VISMA
setting are window-scale, so dense assembly + Cholesky is the right shape
for one chip; cross-window graphs shard by edge in visma_tpu.dist).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from visma_tpu.geom import SE3
from visma_tpu.geom.rotations import mm, rodrigues


def _edge_residual(Ri, pi, Rj, pj, Rm, pm):
    """log( T_meas^-1 * T_i^-1 * T_j )."""
    Ti = SE3(Ri, pi)
    Tj = SE3(Rj, pj)
    Tm = SE3(Rm, pm)
    return (Tm.inv() @ (Ti.inv() @ Tj)).log()


def _edge_res_perturbed(xi_i, xi_j, Ri, pi, Rj, pj, Rm, pm):
    Rip = mm(rodrigues(xi_i[:3]), Ri)
    Rjp = mm(rodrigues(xi_j[:3]), Rj)
    return _edge_residual(Rip, pi + xi_i[3:], Rjp, pj + xi_j[3:], Rm, pm)


@functools.partial(jax.jit, static_argnames=("iters",))
def pose_graph_solve(R: jnp.ndarray, p: jnp.ndarray,
                     edges_i: jnp.ndarray, edges_j: jnp.ndarray,
                     R_meas: jnp.ndarray, p_meas: jnp.ndarray,
                     edge_valid: jnp.ndarray = None,
                     iters: int = 10, damping: float = 1e-4
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """R (K,3,3), p (K,3); edges_* (E,) indices; R_meas/p_meas (E,3,3)/(E,3).

    Node 0 is gauge-fixed. Returns optimized (R, p).
    """
    K = R.shape[0]
    E = edges_i.shape[0]
    if edge_valid is None:
        edge_valid = jnp.ones(E, bool)

    def gn(state, _):
        Rc, pc = state

        def one_edge(i, j, Rm, pm):
            z = jnp.zeros(6)
            res = _edge_res_perturbed(z, z, Rc[i], pc[i], Rc[j], pc[j], Rm, pm)
            Ji = jax.jacfwd(
                lambda x: _edge_res_perturbed(x, z, Rc[i], pc[i], Rc[j],
                                              pc[j], Rm, pm))(z)
            Jj = jax.jacfwd(
                lambda x: _edge_res_perturbed(z, x, Rc[i], pc[i], Rc[j],
                                              pc[j], Rm, pm))(z)
            return res, Ji, Jj

        res, Ji, Jj = jax.vmap(one_edge)(edges_i, edges_j, R_meas, p_meas)
        w = edge_valid.astype(jnp.float32)
        res = res * w[:, None]
        Ji = Ji * w[:, None, None]
        Jj = Jj * w[:, None, None]

        D = 6 * K
        H = jnp.zeros((K, K, 6, 6))
        b = jnp.zeros((K, 6))
        H = H.at[edges_i, edges_i].add(jnp.einsum("eai,eaj->eij", Ji, Ji))
        H = H.at[edges_j, edges_j].add(jnp.einsum("eai,eaj->eij", Jj, Jj))
        H = H.at[edges_i, edges_j].add(jnp.einsum("eai,eaj->eij", Ji, Jj))
        H = H.at[edges_j, edges_i].add(jnp.einsum("eai,eaj->eij", Jj, Ji))
        b = b.at[edges_i].add(-jnp.einsum("eai,ea->ei", Ji, res))
        b = b.at[edges_j].add(-jnp.einsum("eai,ea->ei", Jj, res))

        Hd = H.transpose(0, 2, 1, 3).reshape(D, D)
        Hd = Hd + damping * jnp.eye(D)
        gauge = jnp.arange(D) < 6
        Hd = jnp.where(gauge[:, None] | gauge[None, :],
                       jnp.where(jnp.arange(D)[:, None]
                                 == jnp.arange(D)[None, :], 1e6, 0.0), Hd)
        bd = jnp.where(gauge, 0.0, b.reshape(-1))

        dx = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(0.5 * (Hd + Hd.T)), bd).reshape(K, 6)
        R_new = jax.vmap(lambda d, Rm_: mm(rodrigues(d), Rm_))(dx[:, :3], Rc)
        return (R_new, pc + dx[:, 3:]), jnp.sum(res * res)

    with jax.default_matmul_precision("highest"):
        (R_out, p_out), _ = jax.lax.scan(gn, (R, p), None, length=iters)
    return R_out, p_out
