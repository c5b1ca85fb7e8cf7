"""Cross-entropy-method SE(3) pose refinement by batched edge likelihood.

Each iteration samples N pose perturbations around the current mean in
se(3), renders+scores all of them in one vmapped pass (the TPU-native
replacement for the reference renderer's one-hypothesis-at-a-time loop,
SURVEY §3.3), and refits the sampling distribution to the elite fraction.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visma_tpu.geom import SE3
from visma_tpu.render.likelihood import (edge_distance_transform,
                                          occlusion_aware_edge_score,
                                          symmetric_edge_score)


def refine_pose_cem(renderer, observed_edges: jnp.ndarray,
                    init_pose: np.ndarray,
                    iters: int = 6, samples: int = 64,
                    elite_frac: float = 0.25,
                    init_sigma: Tuple[float, float] = (0.15, 0.08),
                    yaw_only: bool = False,
                    seed: int = 0,
                    tau: float = 10.0,
                    occluder_depth: Optional[jnp.ndarray] = None,
                    ) -> Tuple[np.ndarray, float]:
    """Refine a (3,4) or (4,4) model->camera pose against observed edges.

    init_sigma: (rotation rad, translation m) initial sampling stddevs.
    yaw_only: restrict rotation sampling to the camera-Y axis (gravity-
    aligned object assumption, as in the annotation tool's yaw sweep).
    occluder_depth: optional (H, W) joint depth of all other scene objects;
    when given, hypotheses are scored occlusion-aware (composited z-buffer).
    Returns (refined (3,4) pose, best score).
    """
    dt = edge_distance_transform(jnp.asarray(observed_edges))
    n_elite = max(2, int(samples * elite_frac))
    rng = np.random.default_rng(seed)

    mean = SE3.from_matrix3x4(jnp.asarray(np.asarray(init_pose)[:3, :4],
                                          np.float32))
    sig = np.concatenate([np.full(3, init_sigma[1]),
                          np.full(3, init_sigma[0])]).astype(np.float32)
    if yaw_only:
        sig[3] = sig[5] = 1e-4

    best_pose, best_score = np.asarray(mean.matrix3x4()), np.inf
    for _ in range(iters):
        xi = rng.standard_normal((samples, 6)).astype(np.float32) * sig
        xi[0] = 0.0  # always include the current mean
        # RIGHT-multiplied perturbations: rotations act about the MODEL
        # frame (object center), not the camera origin
        perturb = SE3.exp(jnp.asarray(xi))
        hyps = jax.vmap(lambda d: (mean @ d).matrix3x4())(perturb)
        obs = jnp.asarray(observed_edges)
        if occluder_depth is not None:
            depths = renderer.render_depth(hyps)
            scores = np.asarray(occlusion_aware_edge_score(
                depths, jnp.asarray(occluder_depth), dt, obs, tau=tau))
        else:
            edges = renderer.render_edge(hyps)
            scores = np.asarray(symmetric_edge_score(edges, dt, obs, tau=tau))

        order = np.argsort(scores)
        elite = xi[order[:n_elite]]
        if scores[order[0]] < best_score:
            best_score = float(scores[order[0]])
            best_pose = np.asarray(
                (mean @ SE3.exp(jnp.asarray(xi[order[0]]))).matrix3x4())

        mu = elite.mean(axis=0)
        sig = elite.std(axis=0) * 1.1 + 1e-4
        if yaw_only:
            sig[3] = sig[5] = 1e-4
        mean = mean @ SE3.exp(jnp.asarray(mu))

    return best_pose, best_score
