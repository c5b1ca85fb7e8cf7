"""Corner detection: Shi-Tomasi response + NMS + grid-distributed top-k.

Grid bucketing (best corner per cell, then global top-k over cells) gives
spatially spread features with fully static shapes — no dynamic
suppression loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from visma_tpu.image.edges import shi_tomasi_response


@functools.partial(jax.jit, static_argnames=("max_features", "cell",
                                             "border"))
def detect_features(image: jnp.ndarray, max_features: int = 64,
                    cell: int = 16, border: int = 8,
                    min_response: float = 1e-4,
                    occupied: jnp.ndarray = None):
    """Detect up to `max_features` corners.

    image: (H, W) float32 (grayscale, any scale).
    occupied: optional (H//cell, W//cell) bool — cells to skip (cells
    already holding live tracks, for replenishment).

    Returns (xy (N,2) float32 pixel coords, score (N,), valid (N,)).
    """
    H, W = image.shape
    resp = shi_tomasi_response(image)

    # 3x3 NMS: keep local maxima only
    neigh = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                  "SAME")
    is_max = resp >= neigh

    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    inside = ((row >= border) & (row < H - border)
              & (col >= border) & (col < W - border))
    score = jnp.where(is_max & inside & (resp > min_response), resp, 0.0)

    # best corner per cell
    gh, gw = H // cell, W // cell
    cells = score[: gh * cell, : gw * cell].reshape(gh, cell, gw, cell)
    cells = cells.transpose(0, 2, 1, 3).reshape(gh * gw, cell * cell)
    best = jnp.argmax(cells, axis=1)
    best_score = jnp.take_along_axis(cells, best[:, None], axis=1)[:, 0]
    if occupied is not None:
        best_score = jnp.where(occupied.reshape(-1), 0.0, best_score)

    cy = best // cell + (jnp.arange(gh * gw) // gw) * cell
    cx = best % cell + (jnp.arange(gh * gw) % gw) * cell

    k = min(max_features, gh * gw)
    top_score, top_idx = jax.lax.top_k(best_score, k)
    xy = jnp.stack([cx[top_idx], cy[top_idx]], axis=-1).astype(jnp.float32)
    valid = top_score > 0
    if k < max_features:
        pad = max_features - k
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        top_score = jnp.pad(top_score, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return xy, top_score, valid
