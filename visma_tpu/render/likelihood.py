"""Edge-based object-pose likelihood evaluation.

The papers' throughput-critical inner loop (SURVEY §3.3: the reference
renderer is called per object-pose hypothesis for likelihood evaluation):
render a batch of pose hypotheses -> depth -> edge maps, score each
against the observed edge evidence. TPU-first: one vmapped rasterize +
one Pallas edge kernel + one batched scoring reduction for hundreds of
hypotheses per call.

Scoring: truncated-chamfer likelihood on a distance transform of the
observed edges — mean distance from rendered edge pixels to the nearest
observed edge (robust-truncated), optionally symmetrized with an edge-
coverage term. The distance transform is computed once per frame (it
depends only on the observation) with an exact two-pass jnp sweep.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("iters",))
def edge_distance_transform(edges: jnp.ndarray, threshold: float = 0.5,
                            iters: Optional[int] = None) -> jnp.ndarray:
    """Approximate Euclidean distance transform of an edge map (H, W).

    Chamfer two-pass sweeps are sequential; on TPU we instead iterate a
    vectorized min-plus relaxation (d <- min(d, shift(d)+1, diag+sqrt2))
    until convergence. `iters` bounds the propagation radius (default:
    enough for the image diagonal; scoring truncates distances anyway, so
    ~tau iterations suffice in practice).
    """
    H, W = edges.shape
    is_edge = edges > threshold
    big = jnp.float32(H + W)
    d0 = jnp.where(is_edge, 0.0, big)
    n_iters = iters if iters is not None else 32
    s2 = jnp.float32(jnp.sqrt(2.0))

    def body(_, d):
        def sh(dy, dx, cost):
            rolled = jnp.roll(d, (dy, dx), axis=(0, 1))
            # roll wraps; mask the wrapped border back to big
            if dy == 1:
                rolled = rolled.at[0, :].set(big)
            if dy == -1:
                rolled = rolled.at[-1, :].set(big)
            if dx == 1:
                rolled = rolled.at[:, 0].set(big)
            if dx == -1:
                rolled = rolled.at[:, -1].set(big)
            return rolled + cost

        d = jnp.minimum(d, sh(1, 0, 1.0))
        d = jnp.minimum(d, sh(-1, 0, 1.0))
        d = jnp.minimum(d, sh(0, 1, 1.0))
        d = jnp.minimum(d, sh(0, -1, 1.0))
        d = jnp.minimum(d, sh(1, 1, s2))
        d = jnp.minimum(d, sh(1, -1, s2))
        d = jnp.minimum(d, sh(-1, 1, s2))
        d = jnp.minimum(d, sh(-1, -1, s2))
        return d

    return jax.lax.fori_loop(0, n_iters, body, d0)


@functools.partial(jax.jit, static_argnames=("tau",))
def chamfer_score(rendered_edges: jnp.ndarray, dt: jnp.ndarray,
                  tau: float = 10.0) -> jnp.ndarray:
    """Truncated-chamfer score for rendered edge map(s) (..., H, W) against
    a precomputed observed-edge distance transform (H, W).

    Lower is better; returns (...) mean truncated distance over rendered
    edge pixels (tau when a hypothesis renders no edges — maximally bad).
    """
    w = rendered_edges  # soft edge weights in [0, 1]
    num = jnp.sum(w * jnp.minimum(dt, tau), axis=(-2, -1))
    den = jnp.sum(w, axis=(-2, -1))
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-6), tau)


@functools.partial(jax.jit, static_argnames=("tau", "radius",
                                             "coverage_weight"))
def symmetric_edge_score(rendered_edges: jnp.ndarray, dt: jnp.ndarray,
                         observed_edges: jnp.ndarray, tau: float = 10.0,
                         radius: int = 2,
                         coverage_weight: float = 5.0,
                         obs_mass: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """Chamfer + coverage: penalize hypotheses whose renders leave observed
    edges unexplained (pure one-directional chamfer has a degenerate
    optimum where geometry "hides" so every rendered pixel lands on an
    observed edge). Coverage = fraction of observed edge mass within
    `radius` px of a rendered edge (dilated-maxpool test).

    obs_mass: pass the FULL-FRAME observed edge mass when dt/observed_edges
    are ROI windows — the coverage numerator is local to rendered edges
    (zero outside any window covering them), but the denominator must stay
    global for window scores to equal full-frame scores.
    """
    base = chamfer_score(rendered_edges, dt, tau)
    k = 2 * radius + 1
    batched = rendered_edges.ndim == 3
    r = rendered_edges if batched else rendered_edges[None]
    dil = jax.lax.reduce_window(r, -jnp.inf, jax.lax.max, (1, k, k),
                                (1, 1, 1), "SAME")
    obs = observed_edges[None]
    denom = jnp.sum(obs) if obs_mass is None else obs_mass
    cov = jnp.sum(jnp.minimum(dil, 1.0) * obs, axis=(-2, -1)) \
        / jnp.maximum(denom, 1e-6)
    score = base + coverage_weight * (1.0 - (cov if batched else cov[0]))
    return score


@functools.partial(jax.jit, static_argnames=("tau", "radius",
                                             "coverage_weight"))
def occlusion_aware_edge_score(rendered_depth: jnp.ndarray,
                               occluder_depth: jnp.ndarray,
                               dt: jnp.ndarray,
                               observed_edges: jnp.ndarray,
                               tau: float = 10.0, radius: int = 2,
                               coverage_weight: float = 5.0,
                               obs_mass: Optional[jnp.ndarray] = None
                               ) -> jnp.ndarray:
    """Score pose hypotheses of ONE object in a multi-object scene.

    rendered_depth (B, H, W): hypothesis depth renders of the object;
    occluder_depth (H, W): joint z-buffer of all OTHER objects at their
    current poses (+inf where none). Edges are taken on the composited
    min-depth, so the occluding contour between the object and its
    occluders is rendered exactly where the real depth discontinuity is;
    edges attributable only to the occluders (constant across hypotheses)
    are subtracted so they neither add chamfer mass nor fake coverage.

    This is the multi-object generalization of the papers' per-hypothesis
    likelihood (the reference renderer scores one isolated mesh per call,
    render/renderer.cpp:353-400 — no occlusion handling exists there).
    """
    from visma_tpu.image.edges import depth_edge

    occ = occluder_depth[None]
    joint = jnp.minimum(rendered_depth, occ)
    e_joint = depth_edge(joint)
    # occluder edges don't depend on the hypothesis: ONE stencil pass,
    # broadcast into the subtraction (was depth_edge of a (B,H,W)
    # broadcast — B identical stencil passes)
    e_occ = depth_edge(occ)
    attributable = jnp.maximum(e_joint - e_occ, 0.0)
    return symmetric_edge_score(attributable, dt, observed_edges, tau=tau,
                                radius=radius,
                                coverage_weight=coverage_weight,
                                obs_mass=obs_mass)


def scene_depth(renderers, poses_cm):
    """Joint z-buffer over N objects: renderers[i] (mesh set) at pose
    poses_cm[i] (3,4)/(4,4) model->camera. Returns (joint (H,W) depth with
    +inf background, per-object depth stack (N,H,W)).

    Per-object visibility masks are `(stack == joint) & isfinite(joint)` —
    the TPU-native equivalent of rendering each mesh into one shared GL
    depth buffer (the reference renders one mesh per FBO pass;
    renderer.cpp:303-351)."""
    ds = jnp.stack([r.render_depth(p) for r, p in zip(renderers, poses_cm)])
    return jnp.min(ds, axis=0), ds


def score_hypotheses(renderer, g_cm: jnp.ndarray,
                     observed_edges: jnp.ndarray,
                     tau: float = 10.0, dt_iters: int = 32) -> jnp.ndarray:
    """Full likelihood pass: batch-render pose hypotheses and chamfer-score
    them against observed edges.

    renderer: visma_tpu.render.Renderer with mesh set; g_cm (B,3,4)
    model->camera hypotheses; observed_edges (H, W) in [0,1].
    Returns (B,) scores (lower = better).
    """
    dt = edge_distance_transform(observed_edges, iters=dt_iters)
    edges = renderer.render_edge(g_cm)
    return chamfer_score(edges, dt, tau=tau)
