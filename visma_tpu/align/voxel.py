"""Voxel-grid downsampling (Open3D VoxelDownSample parity:
used at evaluation.cpp:258, annotation.cpp voxel 0.01 / eval voxel 0.05).

Sort-based segment mean with a fixed output capacity: quantize to voxel
keys, sort, average runs. Output is padded with a validity mask (static
shapes for jit).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_out",))
def voxel_downsample(points: jnp.ndarray, voxel_size: float,
                     valid=None, max_out: int = 0):
    """points (N,3) -> (out (K,3), out_valid (K,)) with K = max_out or N.

    Each voxel's points average to one output point (Open3D semantics).
    """
    N = points.shape[0]
    K = max_out or N
    if valid is None:
        valid = jnp.ones(N, bool)

    # pack 3x10-bit into one int32 key (jax default is 32-bit ints).
    # Voxel indices clip to [-512, 511]: supports scenes up to
    # 1024*voxel_size across (e.g. 51 m at the eval voxel 0.05).
    vox = jnp.clip(jnp.floor(points / voxel_size), -512, 511).astype(jnp.int32)
    off = jnp.int32(512)
    key = (((vox[:, 0] + off) << 20) | ((vox[:, 1] + off) << 10)
           | (vox[:, 2] + off))
    key = jnp.where(valid, key, jnp.int32(2**31 - 1))  # invalid -> tail

    order = jnp.argsort(key)
    k_sorted = key[order]
    p_sorted = points[order]
    v_sorted = valid[order]

    is_head = jnp.concatenate([jnp.ones(1, bool),
                               k_sorted[1:] != k_sorted[:-1]])
    seg = jnp.cumsum(is_head.astype(jnp.int32)) - 1   # segment id per point

    sums = jnp.zeros((K, 3), points.dtype).at[seg].add(
        jnp.where(v_sorted[:, None], p_sorted, 0.0), mode="drop")
    cnts = jnp.zeros(K, jnp.float32).at[seg].add(
        v_sorted.astype(jnp.float32), mode="drop")
    out = sums / jnp.maximum(cnts[:, None], 1.0)
    return out, cnts > 0
