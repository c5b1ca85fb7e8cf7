"""Pyramidal inverse-compositional Lucas-Kanade tracking.

vmapped over features, lax.fori over iterations, python loop over the
(static) pyramid levels — the whole tracker jits into one kernel chain.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sample_patch(img: jnp.ndarray, center: jnp.ndarray, radius: int):
    """Bilinear (2r+1)^2 patch around `center` (x, y). Out-of-bounds clamps."""
    H, W = img.shape
    r = radius
    dy, dx = jnp.mgrid[-r : r + 1, -r : r + 1]
    xs = center[0] + dx.astype(jnp.float32)
    ys = center[1] + dy.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 2)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 2)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    flat = img.reshape(-1)
    base = yi * W + xi
    p00 = flat[base]
    p01 = flat[base + 1]
    p10 = flat[base + W]
    p11 = flat[base + W + 1]
    return (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
            + p10 * (1 - fx) * fy + p11 * fx * fy)


def _track_level(prev_img, cur_img, pt_prev, guess, radius, iters):
    """One pyramid level of inverse-compositional LK for one feature.

    pt_prev: feature position in prev_img; guess: current displacement
    estimate. Returns (new displacement, residual norm)."""
    T = _sample_patch(prev_img, pt_prev, radius)
    eps = 0.5
    Tx = (_sample_patch(prev_img, pt_prev + jnp.array([eps, 0.0]), radius)
          - _sample_patch(prev_img, pt_prev - jnp.array([eps, 0.0]), radius)) / (2 * eps)
    Ty = (_sample_patch(prev_img, pt_prev + jnp.array([0.0, eps]), radius)
          - _sample_patch(prev_img, pt_prev - jnp.array([0.0, eps]), radius)) / (2 * eps)
    Gxx = jnp.sum(Tx * Tx)
    Gxy = jnp.sum(Tx * Ty)
    Gyy = jnp.sum(Ty * Ty)
    det = Gxx * Gyy - Gxy * Gxy
    ok = det > 1e-6
    inv_det = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-12), 0.0)

    def body(_, d):
        I = _sample_patch(cur_img, pt_prev + d, radius)
        e = I - T
        bx = jnp.sum(Tx * e)
        by = jnp.sum(Ty * e)
        dx = inv_det * (Gyy * bx - Gxy * by)
        dy = inv_det * (-Gxy * bx + Gxx * by)
        return d - jnp.stack([dx, dy])

    d = jax.lax.fori_loop(0, iters, body, guess)
    I = _sample_patch(cur_img, pt_prev + d, radius)
    res = jnp.sqrt(jnp.mean((I - T) ** 2))
    return d, res, ok


@functools.partial(jax.jit, static_argnames=("radius", "iters", "levels"))
def track_features(prev_pyr, cur_pyr, pts: jnp.ndarray, valid: jnp.ndarray,
                   radius: int = 5, iters: int = 8, levels: int = 3,
                   max_residual: float = 12.0, fb_thresh: float = 1.0):
    """Track `pts` (N,2) from prev to cur pyramid.

    Returns (new_pts (N,2), still_valid (N,)). Validity requires LK
    convergence at every level, in-bounds result, residual below
    `max_residual` (intensity units), and forward-backward error below
    `fb_thresh` pixels.
    """
    H, W = cur_pyr[0].shape

    def one(pt, ok_in):
        d = jnp.zeros(2)
        ok = ok_in
        for lv in range(levels - 1, -1, -1):
            scale = 2.0 ** lv
            dl, res, ok_l = _track_level(prev_pyr[lv], cur_pyr[lv],
                                         pt / scale, d / scale, radius, iters)
            d = dl * scale
            ok = ok & ok_l
        new_pt = pt + d

        # forward-backward check at level 0
        db, _, _ = _track_level(cur_pyr[0], prev_pyr[0], new_pt, -d, radius,
                                iters)
        fb_err = jnp.linalg.norm(db + d)

        I = _sample_patch(cur_pyr[0], new_pt, radius)
        Tp = _sample_patch(prev_pyr[0], pt, radius)
        res0 = jnp.sqrt(jnp.mean((I - Tp) ** 2))

        inb = ((new_pt[0] >= radius + 1) & (new_pt[0] < W - radius - 1)
               & (new_pt[1] >= radius + 1) & (new_pt[1] < H - radius - 1))
        ok = ok & inb & (res0 < max_residual) & (fb_err < fb_thresh) \
             & jnp.all(jnp.isfinite(new_pt))
        return jnp.where(ok, new_pt, pt), ok

    return jax.vmap(one)(pts, valid)
