"""Camera intrinsics and depth conventions for the renderer.

We keep the CV convention throughout (+z forward, +y down, pixel (0,0) top
left): the reference's vision_to_graphics flip (renderer.cpp:250-267)
exists only because of OpenGL and is dropped by design. Metric depth with
+inf background is the native output; `to_gl_depth` converts to the GL
nonlinear depth-buffer values the reference's RenderDepth returns
(renderer.cpp:321-351) for parity testing.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Intrinsics:
    fx: float
    fy: float
    cx: float
    cy: float
    rows: int
    cols: int
    z_near: float = 0.05  # misc/render_depth.json defaults
    z_far: float = 5.0

    @classmethod
    def from_K(cls, K, rows: int, cols: int, z_near: float = 0.05,
               z_far: float = 5.0) -> "Intrinsics":
        return cls(float(K[0][0]), float(K[1][1]), float(K[0][2]),
                   float(K[1][2]), rows, cols, z_near, z_far)


def to_gl_depth(depth: jnp.ndarray, z_near: float, z_far: float) -> jnp.ndarray:
    """Metric depth (+inf background) -> GL depth-buffer value in [0,1]
    (background -> 1.0), the inverse of image.edges.linearize_gl_depth."""
    z = jnp.clip(depth, z_near, z_far)
    a = (z_far + z_near) / (z_far - z_near)
    b = -2.0 * z_far * z_near / (z_far - z_near)
    ndc = a + b / z
    gl = 0.5 * (ndc + 1.0)
    return jnp.where(jnp.isfinite(depth), gl, 1.0)
