"""Error metrics (reference parity: include/geometry.h:80-180,
evaluation.cpp:307-329).

Surface error replaces igl::AABB tree queries with tiled brute-force
point-to-triangle distances — O(P*T) flops shaped for the TPU's vector
units (chunked so memory stays bounded).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from visma_tpu.eval.sampling import sample_mesh


@dataclass
class ErrorMetric:
    mean: float
    std: float
    median: float
    min: float
    max: float

    def to_json(self) -> Dict[str, float]:
        """Key layout of the reference's save_metric (evaluation.cpp:339-345)."""
        return {"mean": self.mean, "std": self.std, "median": self.median,
                "min": self.min, "max": self.max}

    def scaled(self, s: float) -> "ErrorMetric":
        return ErrorMetric(self.mean * s, self.std * s, self.median * s,
                           self.min * s, self.max * s)


def compute_error_metric(errors: np.ndarray) -> ErrorMetric:
    """Matches reference ComputeErrorMetric (geometry.h:86-101) including
    the population std and the sorted[n >> 1] median."""
    e = np.asarray(errors, np.float64)
    if e.size == 0:
        return ErrorMetric(0.0, 0.0, 0.0, 0.0, 0.0)
    mean = float(e.mean())
    std = float(np.sqrt(np.maximum((e * e).mean() - mean * mean, 0.0)))
    srt = np.sort(e)
    return ErrorMetric(mean=mean, std=std, median=float(srt[len(srt) >> 1]),
                       min=float(e.min()), max=float(e.max()))


def _point_triangle_d2(p, a, b, c):
    """Squared distance point -> triangle (vectorized over trailing dims).

    Standard region classification (Ericson, Real-Time Collision
    Detection §5.1.5) in branch-free jnp form.
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_pl = jnp.maximum(va + vb + vc, 1e-30)
    v_face = vb / denom_pl
    w_face = vc / denom_pl

    # edge/vertex clamps
    v_ab = jnp.clip(jnp.where(d1 - d3 != 0, d1 / jnp.where(
        jnp.abs(d1 - d3) < 1e-30, 1e-30, d1 - d3), 0.0), 0.0, 1.0)
    v_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) < 1e-30, 1e-30, d2 - d6),
                    0.0, 1.0)
    v_bc = jnp.clip((d4 - d3) / jnp.where(
        jnp.abs((d4 - d3) + (d5 - d6)) < 1e-30, 1e-30,
        (d4 - d3) + (d5 - d6)), 0.0, 1.0)

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0) & ~in_a & ~in_b
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0) & ~in_a & ~in_c
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0) & ~in_b & ~in_c

    q_face = a + v_face[..., None] * ab + w_face[..., None] * ac
    q = q_face
    q = jnp.where(on_bc[..., None], b + v_bc[..., None] * (c - b), q)
    q = jnp.where(on_ac[..., None], a + v_ac[..., None] * ac, q)
    q = jnp.where(on_ab[..., None], a + v_ab[..., None] * ab, q)
    q = jnp.where(in_c[..., None], c, q)
    q = jnp.where(in_b[..., None], b, q)
    q = jnp.where(in_a[..., None], a, q)
    return jnp.sum((p - q) ** 2, -1)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _pm_dist_aos(P, A, B, C, chunk: int = 1024):
    """Array-of-structs form: (chunk, T, 3) pairwise vector arrays. Kept
    as the exactness oracle — on TPU the 3-wide minor dim lane-pads every
    pairwise intermediate ~42x, so this form runs ~10x slower than the
    SoA form below (measured 1.30 s vs ~0.15 s at 500k x 10k faces)."""
    n = P.shape[0]
    pad = (-n) % chunk
    Pp = jnp.pad(P, ((0, pad), (0, 0)))

    def body(pc):
        d2 = _point_triangle_d2(pc[:, None, :], A[None], B[None], C[None])
        return jnp.min(d2, axis=1)

    d2 = jax.lax.map(body, Pp.reshape(-1, chunk, 3))
    return d2.reshape(-1)[:n]


_HI = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("chunk",))
def _pm_dist(P, A, B, C, chunk: int = 1024):
    """Structure-of-arrays point-to-mesh distance.

    Every pairwise dot product in the Ericson region classification is
    affine in p, so ALL six region fields come from ONE (chunk, 3) @
    (3, 4T) HIGHEST matmul (p.ab, p.ac, p.a, p.n) plus per-triangle
    constants; region tests and squared distances are then scalar
    (chunk, T) arithmetic with T minor — no (..., 3) pairwise arrays.
    The two best triangles per point are re-evaluated with the exact
    pairwise formula (_point_triangle_d2), so the result keeps the AoS
    path's accuracy except where the SoA fields mis-RANK candidates:
    the pp - 2 p.a + aa form loses ~eps*|p|^2 absolute to cancellation,
    so triangles within ~|p|*sqrt(eps) of the winner can tie. Inputs are
    centered on the mesh centroid to minimize |p|; the residual is a
    documented approximation floor of ~1 mm worst-case on metre-scale
    scenes, only at near-surface queries near high-valence vertices —
    irrelevant to the cm-scale surface statistics this feeds
    (geometry.h:118-141), and 100x below the eval ICP radius. Callers
    needing bit-exact distances use _pm_dist_aos.
    """
    center = jnp.mean(A, axis=0)
    A, B, C = A - center, B - center, C - center
    P = P - center
    ab, ac, bc = B - A, C - A, C - B
    nrm = jnp.cross(ab, ac)
    M = jnp.concatenate([ab.T, ac.T, A.T, nrm.T], axis=1)    # (3, 4T)
    T = A.shape[0]
    a_ab, b_ab, c_ab = (jnp.sum(x * ab, 1) for x in (A, B, C))
    a_ac, b_ac, c_ac = (jnp.sum(x * ac, 1) for x in (A, B, C))
    aa, bb, cc = (jnp.sum(x * x, 1) for x in (A, B, C))
    abab = jnp.sum(ab * ab, 1)
    acac = jnp.sum(ac * ac, 1)
    bcbc = jnp.sum(bc * bc, 1)
    nn = jnp.sum(nrm * nrm, 1)
    na = jnp.sum(nrm * A, 1)
    big = jnp.float32(1e30)

    def safe(x):
        return jnp.where(jnp.abs(x) < 1e-30, 1e-30, x)

    def body(pc):
        F4 = jnp.dot(pc, M, precision=_HI)                   # (chunk, 4T)
        pab, pac, pa, pn = (F4[:, :T], F4[:, T:2 * T],
                            F4[:, 2 * T:3 * T], F4[:, 3 * T:])
        pp = jnp.sum(pc * pc, 1, keepdims=True)
        d1, d3, d5 = pab - a_ab, pab - b_ab, pab - c_ab
        d2_, d4, d6 = pac - a_ac, pac - b_ac, pac - c_ac
        va = d3 * d6 - d5 * d4
        vb = d5 * d2_ - d1 * d6
        vc = d1 * d4 - d3 * d2_
        in_a = (d1 <= 0) & (d2_ <= 0)
        in_b = (d3 >= 0) & (d4 <= d3)
        in_c = (d6 >= 0) & (d5 <= d6)
        on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0) & ~in_a & ~in_b
        on_ac = (vb <= 0) & (d2_ >= 0) & (d6 <= 0) & ~in_a & ~in_c
        on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0) \
            & ~in_b & ~in_c
        dA = pp - 2 * pa + aa
        dB_ = pp - 2 * (pa + pab) + bb
        dC = pp - 2 * (pa + pac) + cc
        t1 = jnp.clip(d1 / safe(d1 - d3), 0.0, 1.0)
        t2 = jnp.clip(d2_ / safe(d2_ - d6), 0.0, 1.0)
        t3 = jnp.clip((d4 - d3) / safe((d4 - d3) + (d5 - d6)), 0.0, 1.0)
        dAB = dA - 2 * t1 * d1 + t1 * t1 * abab
        dAC = dA - 2 * t2 * d2_ + t2 * t2 * acac
        dBC = dB_ - 2 * t3 * (d4 - d3) + t3 * t3 * bcbc
        dF = jnp.where(nn > 1e-30, (pn - na) ** 2 / safe(nn), big)
        d2_all = dF
        d2_all = jnp.where(on_bc, dBC, d2_all)
        d2_all = jnp.where(on_ac, dAC, d2_all)
        d2_all = jnp.where(on_ab, dAB, d2_all)
        d2_all = jnp.where(in_c, dC, d2_all)
        d2_all = jnp.where(in_b, dB_, d2_all)
        d2_all = jnp.where(in_a, dA, d2_all)
        # exact refine over the TWO best candidates: the SoA fields carry
        # ~1e-7 absolute d^2 cancellation error, which can mis-RANK
        # triangles within ~5e-4 m of each other (dense meshes have
        # several near the winner). Two exact evaluations bring parity
        # with the AoS oracle to ~1e-7 m (measured on the 5k-face bench
        # chair); lax.top_k(4) achieved the same but cost 3x the whole
        # kernel in sort work.
        d2w = jnp.maximum(d2_all, 0.0)
        i = jnp.argmin(d2w, axis=1)
        e1 = _point_triangle_d2(pc, A[i], B[i], C[i])
        d2w = jnp.where(jnp.arange(T)[None, :] == i[:, None], jnp.inf, d2w)
        j = jnp.argmin(d2w, axis=1)
        e2 = _point_triangle_d2(pc, A[j], B[j], C[j])
        return jnp.minimum(e1, e2)

    n = P.shape[0]
    pad = (-n) % chunk
    Pp = jnp.pad(P, ((0, pad), (0, 0)))
    d2 = jax.lax.map(body, Pp.reshape(-1, chunk, 3))
    return d2.reshape(-1)[:n]


def point_mesh_distances(points: np.ndarray, V: np.ndarray, F: np.ndarray,
                         chunk: int = 1024) -> np.ndarray:
    """Unsigned distance of each point to the mesh surface."""
    V = jnp.asarray(V, jnp.float32)
    F = jnp.asarray(F, jnp.int32)
    A, B, C = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    d2 = _pm_dist(jnp.asarray(points, jnp.float32), A, B, C, chunk)
    return np.sqrt(np.asarray(d2, np.float64))


def measure_surface_error(Vs, Fs, Vt, Ft, num_samples: int,
                          seed: int = 0) -> ErrorMetric:
    """Sample the source mesh, measure distances to the target mesh
    (geometry.h:118-141 semantics, AABB tree -> tiled brute force)."""
    pts = sample_mesh(Vs, Fs, num_samples, seed=seed)
    d = point_mesh_distances(pts, Vt, Ft)
    return compute_error_metric(d)


def measure_pose_error(Gs, Gt, dist_thresh: float = 0.5):
    """Translation + rotation error between matched object poses.

    Gs, Gt: lists of (3,4) poses. NN matching within `dist_thresh` then
    ||dt|| and axis-angle of Rt^T Rs (geometry.h:148-180). Divergence
    documented: the reference accumulates one match per *candidate* scan
    step (inner-loop push_back, geometry.h:164-176), inflating counts; we
    record each source object's final best match once — the intended
    metric.
    Returns (translation ErrorMetric, rotation ErrorMetric [radians]).
    """
    t_err, r_err = [], []
    for Gsi in Gs:
        best, best_d = -1, dist_thresh
        for j, Gtj in enumerate(Gt):
            d = float(np.linalg.norm(Gtj[:3, 3] - Gsi[:3, 3]))
            if d < best_d:
                best_d, best = d, j
        if best >= 0:
            dR = Gt[best][:3, :3].T @ Gsi[:3, :3]
            angle = float(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            t_err.append(best_d)
            r_err.append(angle)
    return compute_error_metric(np.asarray(t_err)), \
        compute_error_metric(np.asarray(r_err))
