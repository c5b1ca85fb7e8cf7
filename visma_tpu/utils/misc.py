"""Small utilities (reference parity: core/utils.h RandomMatrix/RandomVector
:169-183, anynan :184-191, BilinearSample :265-274, GenerateRandomColorMap)."""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def random_matrix(n: int, m: int, scale: float = 1.0, seed: int = 0
                  ) -> np.ndarray:
    return (np.random.default_rng(seed).random((n, m)) * 2 - 1) * scale


def random_vector(n: int, scale: float = 1.0, seed: int = 0) -> np.ndarray:
    return random_matrix(n, 1, scale, seed)[:, 0]


def any_nan(x) -> bool:
    """Finite-check guard (reference anynan; also the jitted-state health
    check suggested by SURVEY §5 — works on pytrees)."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    return any(bool(jnp.any(~jnp.isfinite(leaf))) for leaf in leaves
               if hasattr(leaf, "dtype")
               and jnp.issubdtype(leaf.dtype, jnp.floating))


def finite_tree(x) -> jnp.ndarray:
    """Traceable all-finite reduction over a pytree's float leaves: one
    scalar bool, usable INSIDE jit/scan (the jitted health gate of
    SURVEY §5 — `any_nan` above is the host-side variant, this one rides
    along with the computation at ~zero cost)."""
    import jax

    flags = [jnp.all(jnp.isfinite(leaf))
             for leaf in jax.tree_util.tree_leaves(x)
             if hasattr(leaf, "dtype")
             and jnp.issubdtype(leaf.dtype, jnp.floating)]
    if not flags:
        return jnp.asarray(True)
    return jnp.stack(flags).all()


class DivergenceError(RuntimeError):
    """Filter state went non-finite. Carries the first bad frame index so
    callers can recover from the last healthy checkpoint instead of
    exporting NaN poses."""

    def __init__(self, frame: int, detail: str = ""):
        self.frame = int(frame)
        super().__init__(
            f"filter state non-finite at frame {frame}"
            + (f" ({detail})" if detail else ""))


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H,W) at (...,2) float pixel coords."""
    H, W = img.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    flat = img.reshape(-1)
    b = y0 * W + x0
    return (flat[b] * (1 - fx) * (1 - fy) + flat[b + 1] * fx * (1 - fy)
            + flat[b + W] * (1 - fx) * fy + flat[b + W + 1] * fx * fy)


def generate_random_color_map(n: int = 256, seed: int = 0
                              ) -> Dict[int, np.ndarray]:
    """id -> BGR color (reference GenerateRandomColorMap; label displays)."""
    rng = np.random.default_rng(seed)
    return {i: rng.integers(0, 255, 3).astype(np.uint8) for i in range(n)}
