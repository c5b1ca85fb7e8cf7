"""Synthetic image sequences for the full camera pipeline.

Renders the synthetic landmarks as gaussian blobs on a dark background so
the KLT frontend has trackable, physically-consistent texture (each blob
center IS the projection of a fixed 3-D point along the trajectory).
"""
from __future__ import annotations

import numpy as np

from visma_tpu.io.synthetic import (SyntheticConfig, make_landmarks,
                                    make_trajectory, project)


def render_blob_frames(cfg: SyntheticConfig, sigma: float = 2.0,
                       amplitude: float = 200.0, background: float = 20.0):
    """Returns (frames (N,H,W) float32, gwc (N,3,4), X (L,3))."""
    ts, gwc = make_trajectory(cfg)
    X = make_landmarks(cfg)
    H, W = cfg.rows, cfg.cols
    frames = np.full((cfg.num_frames, H, W), background, np.float32)

    yy, xx = np.mgrid[-4:5, -4:5].astype(np.float32)
    kern = np.exp(-(xx**2 + yy**2) / (2 * sigma**2))

    rng = np.random.default_rng(cfg.seed + 9)
    # static per-landmark brightness so appearance is temporally stable
    amp = amplitude * rng.uniform(0.6, 1.0, size=len(X)).astype(np.float32)

    for i in range(cfg.num_frames):
        xp, depth, valid = project(gwc[i], X, cfg)
        img = frames[i]
        for j in np.nonzero(valid)[0]:
            u, v = xp[j]
            iu, iv = int(round(u)), int(round(v))
            du, dv = u - iu, v - iv
            if 5 <= iu < W - 5 and 5 <= iv < H - 5:
                # subpixel-shifted gaussian
                k = np.exp(-(((xx - du) ** 2) + ((yy - dv) ** 2))
                           / (2 * sigma**2))
                img[iv - 4 : iv + 5, iu - 4 : iu + 5] += amp[j] * k
        np.clip(img, 0, 255, out=img)
    del kern
    return frames, gwc, X
