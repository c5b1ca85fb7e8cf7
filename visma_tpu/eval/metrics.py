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
def _pm_dist(P, A, B, C, chunk: int = 1024):
    n = P.shape[0]
    pad = (-n) % chunk
    Pp = jnp.pad(P, ((0, pad), (0, 0)))

    def body(pc):
        d2 = _point_triangle_d2(pc[:, None, :], A[None], B[None], C[None])
        return jnp.min(d2, axis=1)

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
