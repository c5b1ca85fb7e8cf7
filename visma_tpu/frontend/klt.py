"""Pyramidal inverse-compositional Lucas-Kanade tracking.

vmapped over features, lax.fori over iterations, python loop over the
(static) pyramid levels — the whole tracker jits into one kernel chain.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sample_patch(img: jnp.ndarray, center: jnp.ndarray, radius: int):
    """Bilinear (2r+1)^2 patch around `center` (x, y).

    TPU-shaped: ONE dynamic_slice of a (2r+2)^2 window + 4 shifted
    sub-window multiplies, instead of 4*(2r+1)^2 scattered element
    gathers (the patch grid is regular, so the fractional offset is
    uniform across the patch). Near the image border the window clamps
    (slides inward) rather than clamping per pixel — features that close
    to the border are rejected by track_features' in-bounds gate anyway.
    """
    H, W = img.shape
    r = radius
    n = 2 * r + 2
    x0 = jnp.clip(jnp.floor(center[0]) - r, 0, W - n)
    y0 = jnp.clip(jnp.floor(center[1]) - r, 0, H - n)
    fx = jnp.clip(center[0] - r - x0, 0.0, 1.0)
    fy = jnp.clip(center[1] - r - y0, 0.0, 1.0)
    win = jax.lax.dynamic_slice(
        img, (y0.astype(jnp.int32), x0.astype(jnp.int32)), (n, n))
    m = 2 * r + 1
    return (win[0:m, 0:m] * (1 - fx) * (1 - fy)
            + win[0:m, 1 : m + 1] * fx * (1 - fy)
            + win[1 : m + 1, 0:m] * (1 - fx) * fy
            + win[1 : m + 1, 1 : m + 1] * fx * fy)


def _template_and_grads(img: jnp.ndarray, center: jnp.ndarray, radius: int):
    """Template patch + its spatial gradients from ONE (2r+4)^2 window.

    T is the bilinear patch; Tx/Ty are central differences of the
    bilinear surface at +-0.5 px, which reduce to differences of shifted
    sub-windows of the same slice (no extra dynamic_slices)."""
    H, W = img.shape
    r = radius
    n = 2 * r + 4                       # +1 px margin each side for +-0.5
    x0 = jnp.clip(jnp.floor(center[0]) - r - 1, 0, W - n)
    y0 = jnp.clip(jnp.floor(center[1]) - r - 1, 0, H - n)
    fx = jnp.clip(center[0] - r - 1 - x0, 0.0, 1.0)
    fy = jnp.clip(center[1] - r - 1 - y0, 0.0, 1.0)
    win = jax.lax.dynamic_slice(
        img, (y0.astype(jnp.int32), x0.astype(jnp.int32)), (n, n))
    m = 2 * r + 1

    def interp(i0, j0):
        """Bilinear patch whose (0,0) pixel sits at window coord
        (i0 + fy, j0 + fx)."""
        return (win[i0 : i0 + m, j0 : j0 + m] * (1 - fx) * (1 - fy)
                + win[i0 : i0 + m, j0 + 1 : j0 + m + 1] * fx * (1 - fy)
                + win[i0 + 1 : i0 + m + 1, j0 : j0 + m] * (1 - fx) * fy
                + win[i0 + 1 : i0 + m + 1, j0 + 1 : j0 + m + 1] * fx * fy)

    T = interp(1, 1)
    # +-0.5 px central differences: average of the two integer-offset
    # patches bracketing the half-pixel shift
    Tx = 0.5 * (interp(1, 2) - interp(1, 0))
    Ty = 0.5 * (interp(2, 1) - interp(0, 1))
    return T, Tx, Ty


def _track_level(prev_img, cur_img, pt_prev, guess, radius, iters):
    """One pyramid level of inverse-compositional LK for one feature.

    pt_prev: feature position in prev_img; guess: current displacement
    estimate. Returns (new displacement, residual norm)."""
    T, Tx, Ty = _template_and_grads(prev_img, pt_prev, radius)
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
