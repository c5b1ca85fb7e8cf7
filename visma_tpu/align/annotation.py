"""Annotation-tool alignment primitives (reference parity:
src/annotation.cpp — the GT-pose authoring algorithm; stale/unbuilt in the
reference but it documents the procedure that produced alignment.json).

`register_model_to_scene` enumerates N yaw hypotheses x ICP and keeps the
max-support fit (annotation.cpp:29-64) — the yaw sweep is a vmap-shaped
batch on TPU (each hypothesis is an independent ICP; we loop host-side
since each ICP is itself a jitted scan).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from visma_tpu.align.icp import IcpResult, icp
from visma_tpu.align.voxel import voxel_downsample


def find_plane_normal(points: np.ndarray) -> np.ndarray:
    """PCA floor normal (reference geometry.h:18-26)."""
    pts = np.asarray(points, np.float64)
    c = pts - pts.mean(axis=0)
    _, _, Vt = np.linalg.svd(c / np.sqrt(len(pts)), full_matrices=False)
    n = Vt[2]
    return n / np.linalg.norm(n)


def register_model_to_scene(model_pts: np.ndarray, scene_pts: np.ndarray,
                            num_yaw: int = 24, max_distance: float = 0.02,
                            voxel: float = 0.01,
                            point_to_plane: bool = False,
                            gravity_axis: int = 2
                            ) -> Tuple[np.ndarray, IcpResult]:
    """Center both clouds, try `num_yaw` initial yaws, ICP each, keep the
    fit with most correspondences (annotation.cpp:103-168 semantics,
    cfg/tool.json ICP operating point: voxel 0.01, 24 yaws, 0.02 thresh).

    Returns (T_scene_model (4,4), best IcpResult).
    """
    scene_ds, scene_valid = voxel_downsample(
        jnp.asarray(scene_pts, jnp.float32), voxel)
    scene_np = np.asarray(scene_ds)
    sv = np.asarray(scene_valid)

    model_c = model_pts.mean(axis=0)
    scene_c = (scene_np[sv]).mean(axis=0)

    best: IcpResult = None
    best_T = np.eye(4)
    for k in range(num_yaw):
        th = 2.0 * np.pi * k / num_yaw
        c, s = np.cos(th), np.sin(th)
        R = np.eye(3)
        ax = [i for i in range(3) if i != gravity_axis]
        R[ax[0], ax[0]], R[ax[0], ax[1]] = c, -s
        R[ax[1], ax[0]], R[ax[1], ax[1]] = s, c
        T0 = np.eye(4)
        T0[:3, :3] = R
        T0[:3, 3] = scene_c - R @ model_c

        res = icp(model_pts, scene_np, max_distance, init=T0,
                  point_to_plane=point_to_plane,
                  target_valid=jnp.asarray(sv))
        if best is None or res.correspondences > best.correspondences:
            best, best_T = res, res.transformation
    return best_T, best
