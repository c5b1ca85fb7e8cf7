"""Camera undistortion: ATAN (PTAM/FOV) and OpenCV radial-tangential models.

Reference parity: src/undistorter.cpp (UndistorterPTAM table build
:193-374, output-K solving for crop/full :216-308, UndistorterOpenCV
:467-575, format sniffing :34-80). TPU-first design: the remap *table* is
built once per calibration as a vectorized JAX computation; per-frame
undistortion is a batched bilinear gather (visma_tpu.image.remap) running
on device, not a scalar CPU loop.

Conventions match the reference exactly:
* calibration text files carry fx, fy, cx, cy in *relative* units
  (multiples of image size) with the LSD-SLAM -0.5 pixel-center shift;
* invalid output pixels (source falls outside the input frame) get map
  value -1 and sample to 0;
* the "rounding resistant" nudges at exact borders (undistorter.cpp:332-336)
  are reproduced, including the reference's ix/iy typo on the last line —
  see _nudge (divergence documented there).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# The hardcoded Corvis ATAN calibration used by example/undistort_images.cpp:22-28
# (fx, fy, cx, cy, s) relative; 600x960 raw -> 600x960 crop, of which the
# central 500 rows are kept (the example crops 50 px top+bottom, :51-52).
CORVIS_ATAN_CALIB = dict(
    fx=0.561859, fy=0.901540, cx=0.491896, cy=0.512629,
    s=0.709402, in_rows=600, in_cols=960, mode="crop", out_rows=600,
    out_cols=960, final_rows=500, crop_top=50,
)


@dataclass(frozen=True)
class AtanModel:
    """PTAM/FOV camera model (UndistorterPTAM).

    Relative-coordinate calibration [fx, fy, cx, cy, s]; distortion
    r_d = atan(r_u * 2 tan(s/2)) / s on the undistorted radius.
    """

    fx: float
    fy: float
    cx: float
    cy: float
    s: float
    in_rows: int
    in_cols: int

    def absolute(self) -> Tuple[float, float, float, float]:
        """Pixel-unit intrinsics with the LSD-SLAM -0.5 shift
        (undistorter.cpp:200-203)."""
        return (
            self.fx * self.in_cols,
            self.fy * self.in_rows,
            self.cx * self.in_cols - 0.5,
            self.cy * self.in_rows - 0.5,
        )

    def distort_radius_factor(self, r: jnp.ndarray) -> jnp.ndarray:
        """fac(r) = atan(r * 2 tan(s/2)) / (s * r), ==1 when r or s == 0
        (undistorter.cpp:326-327)."""
        d2t = 2.0 * jnp.tan(self.s / 2.0)
        safe_r = jnp.where(r == 0, jnp.ones_like(r), r)
        fac = jnp.arctan(safe_r * d2t) / (self.s * safe_r)
        return jnp.where((r == 0) | (self.s == 0), jnp.ones_like(r), fac)


@dataclass(frozen=True)
class RadTanModel:
    """OpenCV radial-tangential model (UndistorterOpenCV): k1, k2, p1, p2."""

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float
    k2: float
    p1: float
    p2: float
    in_rows: int
    in_cols: int

    def absolute(self) -> Tuple[float, float, float, float]:
        """Relative calibrations (cx<1) scale by image size WITHOUT the
        -0.5 shift (undistorter.cpp:525-539); absolute ones pass through."""
        if self.cx < 1.0:
            return (self.fx * self.in_cols, self.fy * self.in_rows,
                    self.cx * self.in_cols, self.cy * self.in_rows)
        return (self.fx, self.fy, self.cx, self.cy)

    def distort_normalized(self, x: jnp.ndarray, y: jnp.ndarray):
        r2 = x * x + y * y
        radial = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
        xd = x * radial + 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        yd = y * radial + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return xd, yd


def _solve_output_K_atan(model: AtanModel, mode: str, out_rows: int,
                         out_cols: int) -> Tuple[float, float, float, float]:
    """Reference crop/full output-K solving (undistorter.cpp:216-308)."""
    fx, fy, cx, cy = model.absolute()
    dist = model.s
    in_w, in_h = model.in_cols, model.in_rows
    out_w, out_h = out_cols, out_rows
    d2t = 2.0 * np.tan(dist / 2.0)

    if dist == 0:
        ofx = model.fx * out_w
        ofy = model.fy * out_h
        ocx = model.cx * out_w - 0.5
        ocy = model.cy * out_h - 0.5
    elif mode == "crop":
        left_r = cx / fx
        right_r = (in_w - 1 - cx) / fx
        top_r = cy / fy
        bottom_r = (in_h - 1 - cy) / fy
        tl, tr = np.tan(left_r * dist) / d2t, np.tan(right_r * dist) / d2t
        tt, tb = np.tan(top_r * dist) / d2t, np.tan(bottom_r * dist) / d2t
        ofy = fy * ((top_r + bottom_r) / (tt + tb)) * (out_h / in_h)
        ocy = (tt / top_r) * ofy * cy / fy
        ofx = fx * ((left_r + right_r) / (tl + tr)) * (out_w / in_w)
        ocx = (tl / left_r) * ofx * cx / fx
    elif mode == "full":
        left_r = cx / fx
        right_r = (in_w - 1 - cx) / fx
        top_r = cy / fy
        bottom_r = (in_h - 1 - cy) / fy
        tl_r = np.hypot(left_r, top_r)
        tr_r = np.hypot(right_r, top_r)
        bl_r = np.hypot(left_r, bottom_r)
        br_r = np.hypot(right_r, bottom_r)
        t_tl = np.tan(tl_r * dist) / d2t
        t_tr = np.tan(tr_r * dist) / d2t
        t_bl = np.tan(bl_r * dist) / d2t
        t_br = np.tan(br_r * dist) / d2t
        hor = max(br_r, tr_r) + max(bl_r, tl_r)
        vert = max(tr_r, tl_r) + max(bl_r, br_r)
        t_hor = max(t_br, t_tr) + max(t_bl, t_tl)
        t_vert = max(t_tr, t_tl) + max(t_bl, t_br)
        ofy = fy * (vert / t_vert) * (out_h / in_h)
        ocy = max(t_tl / tl_r, t_tr / tr_r) * ofy * cy / fy
        ofx = fx * (hor / t_hor) * (out_w / in_w)
        ocx = max(t_bl / bl_r, t_tl / tl_r) * ofx * cx / fx
    else:
        raise ValueError(f"unknown mode {mode}")
    return float(ofx), float(ofy), float(ocx), float(ocy)


def _nudge(ix: jnp.ndarray, iy: jnp.ndarray, in_w: int, in_h: int):
    """'Rounding resistant' border nudges (undistorter.cpp:332-336).

    Note: the reference's last line `if (iy == in_height-1) ix = ...` writes
    ix where iy was clearly intended; we implement the *intended* behavior
    (nudge iy) — divergence documented here.
    """
    ix = jnp.where(ix == 0, 0.01, ix)
    iy = jnp.where(iy == 0, 0.01, iy)
    ix = jnp.where(ix == in_w - 1, in_w - 1.01, ix)
    iy = jnp.where(iy == in_h - 1, in_h - 1.01, iy)
    return ix, iy


class Undistorter:
    """Remap-table undistorter; per-frame work is pure device gather.

    Mirrors the reference Undistorter class family: `K` is the output
    intrinsics (absolute pixels), `remap` the (out_h, out_w, 2) source
    coordinate table with -1 marking invalid pixels.
    """

    def __init__(self, model, mode: str = "crop", out_rows: Optional[int] = None,
                 out_cols: Optional[int] = None):
        self.model = model
        self.in_rows, self.in_cols = model.in_rows, model.in_cols
        self.out_rows = out_rows or model.in_rows
        self.out_cols = out_cols or model.in_cols
        self.mode = mode

        if isinstance(model, AtanModel):
            ofx, ofy, ocx, ocy = (
                _solve_output_K_atan(model, mode, self.out_rows, self.out_cols)
                if mode in ("crop", "full")
                else model.absolute()
            )
            self.K = np.array(
                [[ofx, 0, ocx], [0, ofy, ocy], [0, 0, 1]], np.float64)
            self.remap = np.asarray(
                _build_remap_atan(model, ofx, ofy, ocx, ocy,
                                  self.out_rows, self.out_cols))
        elif isinstance(model, RadTanModel):
            self.K, self.remap = _build_remap_radtan(
                model, mode, self.out_rows, self.out_cols)
        else:
            raise TypeError(type(model))

    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        """Undistort one image or a batch (leading dims allowed)."""
        from visma_tpu.image.remap import bilinear_remap

        return bilinear_remap(image, jnp.asarray(self.remap))


@functools.partial(jax.jit, static_argnums=(10, 11, 12, 13))
def _remap_grid_atan(fx_abs, fy_abs, cx_abs, cy_abs, ofx, ofy, ocx, ocy,
                     d2t, s, out_rows, out_cols, in_w, in_h):
    y = jnp.arange(out_rows, dtype=jnp.float32)[:, None]
    x = jnp.arange(out_cols, dtype=jnp.float32)[None, :]
    ix = (x - ocx) / ofx
    iy = (y - ocy) / ofy
    ix, iy = jnp.broadcast_to(ix, (out_rows, out_cols)), jnp.broadcast_to(
        iy, (out_rows, out_cols))
    r = jnp.sqrt(ix * ix + iy * iy)
    safe_r = jnp.where(r == 0, 1.0, r)
    fac = jnp.where((r == 0) | (s == 0), 1.0,
                    jnp.arctan(safe_r * d2t) / (s * safe_r))
    sx = fx_abs * fac * ix + cx_abs
    sy = fy_abs * fac * iy + cy_abs
    sx, sy = _nudge(sx, sy, in_w, in_h)
    valid = (sx > 0) & (sy > 0) & (sx < in_w - 1) & (sy < in_h - 1)
    sx = jnp.where(valid, sx, -1.0)
    sy = jnp.where(valid, sy, -1.0)
    return jnp.stack([sx, sy], axis=-1)


def _build_remap_atan(model: AtanModel, ofx, ofy, ocx, ocy,
                      out_rows: int, out_cols: int) -> jnp.ndarray:
    fx, fy, cx, cy = model.absolute()
    d2t = 2.0 * np.tan(model.s / 2.0)
    return _remap_grid_atan(
        fx, fy, cx, cy, ofx, ofy, ocx, ocy, d2t, model.s,
        out_rows, out_cols, model.in_cols, model.in_rows)


def _build_remap_radtan(model: RadTanModel, mode: str, out_rows: int,
                        out_cols: int):
    """OpenCV-model table: getOptimalNewCameraMatrix + inverse-distortion map
    (undistorter.cpp:548-558). Uses cv2 host-side (table build is one-time)."""
    import cv2

    fx, fy, cx, cy = model.absolute()
    K_in = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    dist = np.array([model.k1, model.k2, model.p1, model.p2], np.float32)
    alpha = 1 if mode == "full" else 0
    K_new, _ = cv2.getOptimalNewCameraMatrix(
        K_in, dist, (model.in_cols, model.in_rows), alpha,
        (out_cols, out_rows), centerPrincipalPoint=False)
    mapx, mapy = cv2.initUndistortRectifyMap(
        K_in, dist, None, K_new, (out_cols, out_rows), cv2.CV_32FC1)
    invalid = ((mapx < 0) | (mapy < 0) | (mapx > model.in_cols - 1)
               | (mapy > model.in_rows - 1))
    mapx = np.where(invalid, -1.0, mapx)
    mapy = np.where(invalid, -1.0, mapy)
    return K_new, np.stack([mapx, mapy], axis=-1).astype(np.float32)


def undistorter_from_file(path: str) -> Undistorter:
    """Calibration-file factory with format sniffing: 8 floats on line 1 ->
    OpenCV model, else ATAN (undistorter.cpp:34-80). File layout:
    line1 calib, line2 'in_w in_h', line3 mode, line4 'out_w out_h'."""
    with open(path) as fp:
        lines = [fp.readline().strip() for _ in range(4)]
    vals = lines[0].split()
    in_w, in_h = (int(v) for v in lines[1].split()[:2])
    mode = lines[2]
    out_w, out_h = (int(v) for v in lines[3].split()[:2])
    if len(vals) >= 8:
        m = RadTanModel(*[float(v) for v in vals[:8]], in_rows=in_h,
                        in_cols=in_w)
    else:
        m = AtanModel(*[float(v) for v in vals[:5]], in_rows=in_h,
                      in_cols=in_w)
    return Undistorter(m, mode=mode, out_rows=out_h, out_cols=out_w)


def corvis_undistorter() -> Undistorter:
    """The hardcoded Corvis rig undistorter (example/undistort_images.cpp)."""
    c = CORVIS_ATAN_CALIB
    m = AtanModel(c["fx"], c["fy"], c["cx"], c["cy"], c["s"],
                  in_rows=c["in_rows"], in_cols=c["in_cols"])
    return Undistorter(m, mode=c["mode"], out_rows=c["out_rows"],
                       out_cols=c["out_cols"])
