"""Fused Pallas pyramidal LK: one kernel per level, features on lanes.

Why: the windowed-matmul tracker (klt.py) is correct and gather-free, but
on a real v5e its cost is dominated by KERNEL-LAUNCH LATENCY, not compute
(profiled: ~12 us/LK-iteration across 5 sequential while-loops plus a
~0.4 ms tail of tiny setup ops = ~0.9 of the 1.15 ms/frame). This module
keeps the same math and collapses each pyramid level's entire LK solve —
template + gradients + normal matrix + all iterations + residual — into
ONE Pallas kernel, so per-iteration cost is VPU instructions instead of
dispatches.

Two TPU-shaping ideas:

1. **Features ride the 128-lane axis.** Windows are extracted in
   (win, win, K) layout, so every per-feature elementwise op processes
   all K features per vector instruction (a (K, m, win) layout would pad
   win=24 lanes up to 128 and waste 5x).
2. **Bilinear sampling = static-slice hat taps.** Sampling an (m, m)
   patch at per-feature continuous offset s is
       I = sum_a hat(s_y - a) * W[a:a+m]      (rows, then cols)
   where a ranges over the STATIC tap set [0, win-m]. Every slice is
   static; per-feature dynamics live only in the scalar hat weights
   (hat(t) = max(0, 1-|t|) reproduces two-tap bilinear exactly, including
   the clamped-edge behavior of klt._bilinear_taps). No gathers, no
   per-feature dynamic slices, no batched matmuls inside the kernel.

Window extraction stays on the MXU (one-hot selection, klt.py's idea) but
contracts columns first — (H, W) @ (W, K*win) is one well-shaped matmul —
and emits (win, win, K) directly. On TPU the selection runs in bf16
(`extract_dtype`): one-hot times image only rounds the IMAGE to bf16
(<=0.4% intensity), worth 6x fewer MXU passes; tests pin the f32 path
against klt.track_features and run the kernel in interpret mode on CPU.

Semantics match klt.track_features for interior features; near image
borders the clamped template (floor- vs round-based origins) may differ
— both paths reject such features via the residual/FB gates. Documented
divergence (deliberate): the default window is win=24 (vs 40 for
klt.track_features), i.e. a per-level refinement margin of ~6 px instead
of ~14 px on top of the coarse-to-fine guess — the fused kernel holds
both (win, win, K) window stacks in VMEM and runs `win-m+1` static hat
taps per sample, so the smaller window IS its perf point. Fast motions
beyond the margin clamp-sample at the window edge and are rejected by
the residual/FB gates (not silently wrong); pass win=40 for the full
margin. Pyramid levels too small to host a (2r+4) patch window are
skipped (no refinement at that level) rather than clamp-extrapolated.
tests/test_frontend.py::TestKltFused pins the f32 path against
klt.track_features and runs the kernel in interpret mode on CPU.

Reference for the tracking contract: the dataset's tracklets
(vlslam.proto:21-36) are produced by exactly this kind of pyramidal-LK
frontend upstream of feixh/VISMA (SURVEY.md section 2.2 item 9).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _extract_windows_klast(img: jnp.ndarray, centers: jnp.ndarray,
                           win: int, dtype=None):
    """One (win, win) window per feature, output layout (win, win, K).

    Origins are floor(center) - win//2, clipped to the image, so the
    in-window fractional position of `center` is origin-independent for
    interior features. `dtype` selects the MXU selection precision:
    jnp.bfloat16 (one pass; exact 0/1 one-hots, image rounded to bf16) or
    float32 (HIGHEST, 6 passes, bit-matching the f32 reference path).

    Returns (wins (win, win, K) f32, origin_xy (K, 2) int32).
    """
    H, W = img.shape
    if dtype is None:
        dtype = jnp.float32
    cx, cy = centers[:, 0], centers[:, 1]
    x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32) - win // 2, 0, W - win)
    y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32) - win // 2, 0, H - win)

    prec = None if dtype == jnp.bfloat16 else _HI
    cols = x0[:, None] + jnp.arange(win, dtype=jnp.int32)[None, :]  # (K,win)
    B = (cols[:, :, None]
         == jnp.arange(W, dtype=jnp.int32)[None, None, :]).astype(dtype)
    # columns first: (H, W) @ (W, K*win) is one MXU-friendly matmul
    C = jnp.einsum("hw,kjw->hjk", img.astype(dtype), B, precision=prec,
                   preferred_element_type=jnp.float32)       # (H, win, K)

    rows = y0[:, None] + jnp.arange(win, dtype=jnp.int32)[None, :]
    A = (rows[:, :, None]
         == jnp.arange(H, dtype=jnp.int32)[None, None, :]).astype(dtype)
    wins = jnp.einsum("kih,hjk->ijk", A, C.astype(dtype), precision=prec,
                      preferred_element_type=jnp.float32)    # (win, win, K)
    return wins, jnp.stack([x0, y0], axis=-1)


def _hat_sample(wins, sy, sx, m: int):
    """(m, m, K) bilinear patch at per-feature start (sy, sx) from
    (win, win, K) windows via static-slice hat taps. sy/sx (K,) floats,
    caller-clamped to [0, win - m]."""
    win = wins.shape[0]
    acc = None
    for a in range(win - m + 1):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(sy - a))[None, None, :]
        t = wins[a : a + m] * w
        acc = t if acc is None else acc + t                  # (m, win, K)
    out = None
    for b in range(win - m + 1):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(sx - b))[None, None, :]
        t = acc[:, b : b + m] * w
        out = t if out is None else out + t                  # (m, m, K)
    return out


def _lk_level_kernel(winsT_ref, winsI_ref, stT_ref, sI0_ref,
                     u_ref, stat_ref, *, radius: int, iters: int):
    """One pyramid level of inverse-compositional LK for ALL features.

    winsT/winsI (win, win, K): template/search windows. stT (2, K):
    continuous template start (row, col) inside winsT. sI0 (2, K):
    sample start inside winsI for u = 0. Writes u (2, K) = (uy, ux)
    displacement refinement and stat (2, K) = (residual, ok).
    """
    m = 2 * radius + 1
    M = m + 2
    winsT = winsT_ref[...]
    winsI = winsI_ref[...]
    win = winsT.shape[0]

    # template + gradients from one padded (M, M) patch; start clamped so
    # the +-1-px gradient shifts stay inside the window
    ty = jnp.clip(stT_ref[0], 1.0, win - m - 1.0)
    tx = jnp.clip(stT_ref[1], 1.0, win - m - 1.0)
    Tp = _hat_sample(winsT, ty - 1.0, tx - 1.0, M)           # (M, M, K)
    T = Tp[1 : 1 + m, 1 : 1 + m]
    Tx = 0.5 * (Tp[1 : 1 + m, 2 : 2 + m] - Tp[1 : 1 + m, 0:m])
    Ty = 0.5 * (Tp[2 : 2 + m, 1 : 1 + m] - Tp[0:m, 1 : 1 + m])

    Gxx = jnp.sum(Tx * Tx, axis=(0, 1))
    Gxy = jnp.sum(Tx * Ty, axis=(0, 1))
    Gyy = jnp.sum(Ty * Ty, axis=(0, 1))
    det = Gxx * Gyy - Gxy * Gxy
    ok = det > 1e-6
    inv_det = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-12), 0.0)

    lim = win - m - 1e-4
    s0y, s0x = sI0_ref[0], sI0_ref[1]

    def body(_, u):
        uy, ux = u
        I = _hat_sample(winsI, jnp.clip(s0y + uy, 0.0, lim),
                        jnp.clip(s0x + ux, 0.0, lim), m)
        e = I - T
        bx = jnp.sum(Tx * e, axis=(0, 1))
        by = jnp.sum(Ty * e, axis=(0, 1))
        dx = inv_det * (Gyy * bx - Gxy * by)
        dy = inv_det * (-Gxy * bx + Gxx * by)
        return (uy - dy, ux - dx)

    K = winsT.shape[-1]
    z = jnp.zeros((K,), jnp.float32)
    uy, ux = jax.lax.fori_loop(0, iters, body, (z, z))

    I = _hat_sample(winsI, jnp.clip(s0y + uy, 0.0, lim),
                    jnp.clip(s0x + ux, 0.0, lim), m)
    res = jnp.sqrt(jnp.mean((I - T) ** 2, axis=(0, 1)))
    u_ref[0, :] = uy
    u_ref[1, :] = ux
    stat_ref[0, :] = res
    stat_ref[1, :] = ok.astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("radius", "iters", "interpret"))
def lk_level_fused(winsT, winsI, stT, sI0, radius: int = 5, iters: int = 8,
                   interpret: bool = False):
    """Run the fused LK level kernel. winsT/winsI (win, win, K) f32;
    stT/sI0 (2, K). Returns (u (2, K), res (K,), ok (K,) bool)."""
    win, _, K = winsT.shape
    if win < 2 * radius + 4:
        # the kernel samples an (m+2, m+2) padded patch with +-1-px
        # clamped shifts; below this the start clamp inverts (hi < lo)
        raise ValueError(
            f"window {win} too small for radius {radius}: need "
            f"win >= 2*radius+4 = {2 * radius + 4}")
    u, stat = pl.pallas_call(
        functools.partial(_lk_level_kernel, radius=radius, iters=iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((2, K), jnp.float32),
                   jax.ShapeDtypeStruct((2, K), jnp.float32)],
        interpret=interpret,
    )(winsT, winsI, stT, sI0)
    return u, stat[0], stat[1] > 0.5


@functools.partial(jax.jit, static_argnames=(
    "radius", "iters", "levels", "win", "interpret", "bf16_extract"))
def track_features_fused(prev_pyr, cur_pyr, pts: jnp.ndarray,
                         valid: jnp.ndarray, radius: int = 5,
                         iters: int = 8, levels: int = 3,
                         max_residual: float = 12.0, fb_thresh: float = 1.0,
                         win: int = 24, interpret: bool = False,
                         bf16_extract: bool = False):
    """Track `pts` (N, 2) from prev to cur pyramid. Same contract and
    gates as klt.track_features (convergence at every level, in-bounds,
    residual, forward-backward); see module docstring for the divergence
    at image borders."""
    H, W = cur_pyr[0].shape
    r = radius
    edt = jnp.bfloat16 if bf16_extract else jnp.float32

    d = jnp.zeros_like(pts)
    ok = valid
    lvl0 = None
    for lv in range(levels - 1, -1, -1):
        scale = 2.0 ** lv
        Hl, Wl = prev_pyr[lv].shape
        wl = min(win, Hl - Hl % 8 or Hl, Wl - Wl % 8 or Wl)
        if wl < 2 * r + 4:
            if lv == 0:
                raise ValueError(
                    f"level-0 window {wl} too small for radius {r}")
            continue  # level too small to host the patch: skip refinement
        pts_l = pts / scale
        est = pts_l + d / scale
        winsP, orgP = _extract_windows_klast(prev_pyr[lv], pts_l, wl, edt)
        winsC, orgC = _extract_windows_klast(cur_pyr[lv], est, wl, edt)
        # continuous starts of the (m, m) patches inside each window
        stT = (pts_l - r - orgP.astype(jnp.float32)).T[::-1]   # (2,K) row,col
        sI0 = (est - r - orgC.astype(jnp.float32)).T[::-1]
        u, res, ok_l = lk_level_fused(winsP, winsC, stT, sI0, radius=r,
                                      iters=iters, interpret=interpret)
        d = (est + jnp.stack([u[1], u[0]], axis=-1) - pts_l) * scale
        ok = ok & ok_l
        if lv == 0:
            lvl0 = (winsP, orgP, winsC, orgC, res, u)
    new_pt = pts + d
    winsP0, orgP0, winsC0, orgC0, res0, u0 = lvl0

    # forward-backward: template from CUR at new_pt, iterate sampling PREV
    stT_fb = (new_pt - r - orgC0.astype(jnp.float32)).T[::-1]
    sI0_fb = (pts - r - orgP0.astype(jnp.float32)).T[::-1]
    v, _, _ = lk_level_fused(winsC0, winsP0, stT_fb, sI0_fb, radius=r,
                             iters=iters, interpret=interpret)
    fb_err = jnp.sqrt(v[0] ** 2 + v[1] ** 2)

    inb = ((new_pt[:, 0] >= r + 1) & (new_pt[:, 0] < W - r - 1)
           & (new_pt[:, 1] >= r + 1) & (new_pt[:, 1] < H - r - 1))
    ok = ok & inb & (res0 < max_residual) & (fb_err < fb_thresh) \
        & jnp.all(jnp.isfinite(new_pt), axis=-1)
    return jnp.where(ok[:, None], new_pt, pts), ok
