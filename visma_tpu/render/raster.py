"""TPU triangle rasterizer: depth / mask / edge images from meshes.

Replaces the reference's OpenGL pipeline (render/renderer.cpp: hidden GLFW
window + FBO + glReadPixels) with a pure-XLA tile-binned rasterizer that
vmaps over pose hypotheses — the papers' object-pose likelihood evaluation
renders hundreds of hypotheses per frame, which is exactly the batch axis
TPUs want.

Algorithm (all static shapes, no scatter):
  1. transform+project vertices (MXU-friendly batched matmul);
  2. triangle setup: screen bboxes, per-edge coefficients;
  3. bin: for each image tile, select the first `tile_capacity` triangles
     whose bbox overlaps the tile (top_k on a boolean score — fixed-size
     compaction instead of dynamic lists);
  4. per tile, evaluate edge functions for tile_pixels x capacity pairs,
     perspective-correct 1/z interpolation, min-reduce over triangles
     (z-buffer as a reduction, not a scatter);
  5. stitch tiles back.

No backface culling (the reference doesn't enable GL_CULL_FACE).
Depth is metric with +inf background (see render/camera.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visma_tpu.render.camera import Intrinsics


def _project(V: jnp.ndarray, pose_cw: jnp.ndarray, intr: Intrinsics):
    """V (N,3) world/model -> screen xy (N,2), camera z (N,).

    pose_cw: (3,4) model/world -> camera transform.
    """
    R, t = pose_cw[:, :3], pose_cw[:, 3]
    Vc = V @ R.T + t
    z = Vc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = intr.fx * Vc[:, 0] / safe_z + intr.cx
    v = intr.fy * Vc[:, 1] / safe_z + intr.cy
    return jnp.stack([u, v], axis=-1), z


def _raster_tiles(xy, z, F, intr: Intrinsics, tile: int, capacity: int):
    """Core binned rasterization for one pose. Returns depth (H, W)."""
    H, W = intr.rows, intr.cols
    nty, ntx = -(-H // tile), -(-W // tile)
    T = F.shape[0]

    p0, p1, p2 = xy[F[:, 0]], xy[F[:, 1]], xy[F[:, 2]]
    z0, z1, z2 = z[F[:, 0]], z[F[:, 1]], z[F[:, 2]]

    # a triangle participates if fully in front of the near plane
    zmin = jnp.minimum(jnp.minimum(z0, z1), z2)
    zmax = jnp.maximum(jnp.maximum(z0, z1), z2)
    tri_ok = (zmin > intr.z_near) & (zmin < intr.z_far)

    # screen bbox per triangle
    xs = jnp.stack([p0[:, 0], p1[:, 0], p2[:, 0]], axis=0)
    ys = jnp.stack([p0[:, 1], p1[:, 1], p2[:, 1]], axis=0)
    bb_x0, bb_x1 = jnp.min(xs, 0), jnp.max(xs, 0)
    bb_y0, bb_y1 = jnp.min(ys, 0), jnp.max(ys, 0)

    # tile grid bounds
    ty0 = jnp.arange(nty) * tile
    tx0 = jnp.arange(ntx) * tile

    # overlap (nty, ntx, T)
    ov_x = (bb_x0[None, :] <= (tx0[:, None] + tile - 1)) & (bb_x1[None, :] >= tx0[:, None])
    ov_y = (bb_y0[None, :] <= (ty0[:, None] + tile - 1)) & (bb_y1[None, :] >= ty0[:, None])
    overlap = (ov_y[:, None, :] & ov_x[None, :, :]) & tri_ok[None, None, :]

    # fixed-size compaction: first `capacity` overlapping triangle ids
    score = overlap.astype(jnp.int32) * (T - jnp.arange(T, dtype=jnp.int32))[None, None, :]
    top, idx = jax.lax.top_k(score.reshape(nty * ntx, T), min(capacity, T))
    sel_valid = top > 0                       # (tiles, K)
    sel = idx                                 # (tiles, K)

    # gather per-tile triangle data (tiles, K, ...)
    tp0, tp1, tp2 = p0[sel], p1[sel], p2[sel]
    tw0, tw1, tw2 = 1.0 / z0[sel], 1.0 / z1[sel], 1.0 / z2[sel]

    # pixel centers per tile (tiles, tile*tile, 2)
    py, px = jnp.mgrid[0:tile, 0:tile]
    tile_y = (ty0[:, None] + py.reshape(-1)[None, :])  # (nty, P)
    tile_x = (tx0[:, None] + px.reshape(-1)[None, :])  # (ntx, P)
    # combine into (tiles, P)
    yy = jnp.repeat(tile_y[:, None, :], ntx, axis=1).reshape(nty * ntx, -1)
    xx = jnp.repeat(tile_x[None, :, :], nty, axis=0).reshape(nty * ntx, -1)
    pix = jnp.stack([xx, yy], axis=-1).astype(jnp.float32)  # (tiles, P, 2)

    def edge(a, b, p):
        # signed area of (a, b, p): (b-a) x (p-a)
        return ((b[..., 0] - a[..., 0])[:, None, :] * (p[..., 1][..., None] - a[..., 1][:, None, :])
                - (b[..., 1] - a[..., 1])[:, None, :] * (p[..., 0][..., None] - a[..., 0][:, None, :]))

    # (tiles, P, K) barycentric areas
    w0 = edge(tp1, tp2, pix)
    w1 = edge(tp2, tp0, pix)
    w2 = edge(tp0, tp1, pix)
    area = ((tp1[..., 0] - tp0[..., 0]) * (tp2[..., 1] - tp0[..., 1])
            - (tp1[..., 1] - tp0[..., 1]) * (tp2[..., 0] - tp0[..., 0]))  # (tiles, K)

    area_b = area[:, None, :]
    # inside if all barycentrics share the sign of the full area (both
    # windings accepted: no backface culling)
    pos = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (area_b > 1e-12)
    neg = (w0 <= 0) & (w1 <= 0) & (w2 <= 0) & (area_b < -1e-12)
    inside = (pos | neg) & sel_valid[:, None, :]

    safe_area = jnp.where(jnp.abs(area_b) < 1e-12, 1.0, area_b)
    b0, b1, b2 = w0 / safe_area, w1 / safe_area, w2 / safe_area
    invz = b0 * tw0[:, None, :] + b1 * tw1[:, None, :] + b2 * tw2[:, None, :]
    depth = 1.0 / jnp.maximum(invz, 1e-9)
    depth = jnp.where(inside & (depth > intr.z_near) & (depth < intr.z_far),
                      depth, jnp.inf)
    tile_depth = jnp.min(depth, axis=-1)  # (tiles, P)

    # stitch (nty, ntx, tile, tile) -> (H', W') -> crop
    out = tile_depth.reshape(nty, ntx, tile, tile).transpose(0, 2, 1, 3)
    out = out.reshape(nty * tile, ntx * tile)[:H, :W]
    return out


# ---------------------------------------------------------------------------
# Fast path (TPU): plane-equation rasterization in a Pallas VMEM kernel.
#
# Key reformulation (vs _raster_tiles above): for a triangle with screen
# vertices p0,p1,p2 and signed area A, each edge function w_i(p) and the
# perspective-correct 1/z interpolant are AFFINE in pixel coordinates:
#     w_i(p)/A = a_i*px + b_i*py + c_i          (normalized barycentric)
#     1/z(p)   = az*px + bz*py + cz             (sum of barycentrics * 1/z_i)
# Dividing by A folds both windings into one test (inside ⇔ all w_i/A >= 0,
# no backface culling — the reference doesn't enable GL_CULL_FACE), and
# z-buffering becomes max(1/z) so the kernel does ZERO per-pixel divisions.
# ---------------------------------------------------------------------------

def _triangle_planes(xy, z, F, intr: Intrinsics):
    """Per-triangle affine plane coefficients (T, 12):
    rows [a0,b0,c0, a1,b1,c1, a2,b2,c2, az,bz,cz] (see module comment).
    Degenerate / z-clipped triangles get the always-fail plane c0 = -1."""
    p0, p1, p2 = xy[F[:, 0]], xy[F[:, 1]], xy[F[:, 2]]
    z0, z1, z2 = z[F[:, 0]], z[F[:, 1]], z[F[:, 2]]

    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]

    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    zmin = jnp.minimum(jnp.minimum(z0, z1), z2)
    ok = (zmin > intr.z_near) & (zmin < intr.z_far) & (jnp.abs(area) > 1e-12)
    inv_area = jnp.where(ok, 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0), 0.0)

    def edge(xa, ya, xb, yb):
        # w(p) = (xb-xa)*(py-ya) - (yb-ya)*(px-xa)
        a = -(yb - ya)
        b = xb - xa
        c = (yb - ya) * xa - (xb - xa) * ya
        return a * inv_area, b * inv_area, c * inv_area

    a0, b0, c0 = edge(x1, y1, x2, y2)
    a1, b1, c1 = edge(x2, y2, x0, y0)
    a2, b2, c2 = edge(x0, y0, x1, y1)
    iz0 = jnp.where(ok, 1.0 / jnp.maximum(z0, 1e-9), 0.0)
    iz1 = jnp.where(ok, 1.0 / jnp.maximum(z1, 1e-9), 0.0)
    iz2 = jnp.where(ok, 1.0 / jnp.maximum(z2, 1e-9), 0.0)
    az = a0 * iz0 + a1 * iz1 + a2 * iz2
    bz = b0 * iz0 + b1 * iz1 + b2 * iz2
    cz = c0 * iz0 + c1 * iz1 + c2 * iz2

    c0 = jnp.where(ok, c0, -1.0)  # fail the inside test for dead triangles
    planes = jnp.stack([a0, b0, c0, a1, b1, c1, a2, b2, c2, az, bz, cz], -1)
    return planes, ok


# ---------------------------------------------------------------------------
# Binning-free chunked rasterization (the production TPU path).
#
# top_k tile binning was measured to dominate the plane kernel (170 ms of a
# 227 ms batch). Instead: faces are Morton-sorted ONCE at mesh load so
# consecutive faces are spatially local; triangles are processed in chunks
# of 128; host-side XLA packs, per image tile, the id list of chunks whose
# screen bbox hits that tile (a tiny (tiles, nchunks) boolean problem); the
# kernel scalar-prefetches those lists and runs a DYNAMIC-trip-count loop
# over only the hitting chunks (mean ~1.6 of 40 per tile on the VISMA chair;
# 76% of tiles do zero work). Exact: every triangle is considered for every
# tile it touches — no fixed-capacity drop like the binned paths.
# Measured on one v5e (chair mesh, 5k faces, 500x960, 64 poses): 1.5 ms/pose
# vs 6.4 ms/pose for the XLA tile path — with NO host transfer in the loop.
# ---------------------------------------------------------------------------

def sort_faces_morton(V: np.ndarray, F: np.ndarray) -> np.ndarray:
    """Reorder faces by Morton code of their centroid (host-side, once per
    mesh). Guarantees chunk spatial locality for rasterize_depth_chunked."""
    V = np.asarray(V, np.float64)
    F = np.asarray(F, np.int64)
    cent = V[F].mean(axis=1)
    lo, hi = cent.min(0), cent.max(0)
    q = ((cent - lo) / np.maximum(hi - lo, 1e-12) * 1023).astype(np.uint64)

    def spread(x):
        x &= 0x3FF
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.asarray(F[np.argsort(code, kind="stable")], np.int32)


# Binning stays at 32x32 tiles (best chunk selectivity: mean hitting
# chunks/tile ~3.7 on the 5k-face bench meshes), but each GRID STEP
# computes FOUR adjacent subtiles and writes one lane-aligned (32, 128)
# block STRAIGHT into the final (H', W') image layout. This removes the
# old stitch transpose entirely — its 32-wide minor dim made XLA's copy
# run at sub-GB/s (materializing it for the semantic scorer cost ~55 ms
# per 3x128-hypothesis CEM frame, more than raster+score combined) —
# without paying the ~1.5-3x bin-coverage inflation that full-width
# strip tiles cost (measured: strip binning pushed the kernel from
# ~0.11 to ~0.38 ms/pose on the bench meshes).
_SUB = 32          # binning tile edge (square, like the original kernel)
_TILE_H = 32       # output block rows
_TILE_W = 128      # output block cols = 4 subtiles = VPU lane width


def _chunk_raster_kernel(counts_ref, ids_ref, planes_ref, out_ref, *,
                         ntx: int, chunk: int,
                         inv_near: float, inv_far: float, sub_px: int):
    """sub_px: binning subtile edge. 32 is the full-frame default; the
    semantic ROI path uses 16 — the kernel is VPU-bound on
    (subtile pixels x chunk triangles) pair evaluations, and a 16-px
    subtile roughly halves the wasted coverage of a ~30-px chunk bbox
    (measured 22 -> 12 ms per 96-pose CEM iteration on v5e)."""
    t = pl.program_id(0)
    ty0 = (t // ntx) * _TILE_H
    P = sub_px * sub_px
    pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pxl = (pid % sub_px).astype(jnp.float32)
    pyl0 = (pid // sub_px).astype(jnp.float32)

    nsy = _TILE_H // sub_px
    nsx_blk = _TILE_W // sub_px
    # subtile ids are row-major over the (image_rows/sub_px,
    # image_cols/sub_px) grid — matching _prep_chunks_all's binning
    nsx_img = ntx * nsx_blk
    for sy in range(nsy):                        # static unroll
        pyl = pyl0 + jnp.float32(ty0 + sy * sub_px)
        for sx in range(nsx_blk):
            st = ((ty0 // sub_px + sy) * nsx_img
                  + (t % ntx) * nsx_blk + sx)    # subtile id (row-major)
            px = pxl + ((t % ntx) * _TILE_W + sx * sub_px).astype(
                jnp.float32)

            def body(i, best):
                c = planes_ref[ids_ref[i, st]]           # (16, chunk)

                def plane(k):
                    return (px * c[3 * k:3 * k + 1, :]
                            + pyl * c[3 * k + 1:3 * k + 2, :]
                            + c[3 * k + 2:3 * k + 3, :])  # (P, chunk)

                inside = plane(0) >= 0
                inside &= plane(1) >= 0
                inside &= plane(2) >= 0
                iz = plane(3)
                inside &= (iz > inv_far) & (iz < inv_near)
                m = jnp.max(jnp.where(inside, iz, 0.0).reshape(
                    sub_px, sub_px, chunk), axis=-1)
                return jnp.maximum(best, m)

            # dynamic trip count: only the chunks whose screen bbox hits
            # this subtile (packed id list from the batched prep) are
            # ever touched.
            out_ref[sy * sub_px:(sy + 1) * sub_px,
                    sx * sub_px:(sx + 1) * sub_px] = jax.lax.fori_loop(
                0, counts_ref[st], body,
                jnp.zeros((sub_px, sub_px), jnp.float32))


def _chunk_raster_kernel_batched(counts_ref, ids_ref, planes_ref, out_ref,
                                 *, ntx: int, chunk: int,
                                 inv_near: float, inv_far: float,
                                 sub_px: int):
    """Pose-batched twin of _chunk_raster_kernel: grid (G, ntiles), pose g
    renders from its own plane table / chunk lists. One pallas call covers
    a whole pose group (fewer call boundaries; pose g+1's plane-table DMA
    pipelines under pose g's compute)."""
    g = pl.program_id(0)
    t = pl.program_id(1)
    ty0 = (t // ntx) * _TILE_H
    P = sub_px * sub_px
    pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pxl = (pid % sub_px).astype(jnp.float32)
    pyl0 = (pid // sub_px).astype(jnp.float32)

    nsy = _TILE_H // sub_px
    nsx_blk = _TILE_W // sub_px
    nsx_img = ntx * nsx_blk
    for sy in range(nsy):                        # static unroll
        pyl = pyl0 + jnp.float32(ty0 + sy * sub_px)
        for sx in range(nsx_blk):
            st = ((ty0 // sub_px + sy) * nsx_img
                  + (t % ntx) * nsx_blk + sx)    # subtile id (row-major)
            px = pxl + ((t % ntx) * _TILE_W + sx * sub_px).astype(
                jnp.float32)

            def body(i, best):
                c = planes_ref[0, ids_ref[g, i, st]]     # (16, chunk)

                def plane(k):
                    return (px * c[3 * k:3 * k + 1, :]
                            + pyl * c[3 * k + 1:3 * k + 2, :]
                            + c[3 * k + 2:3 * k + 3, :])  # (P, chunk)

                inside = plane(0) >= 0
                inside &= plane(1) >= 0
                inside &= plane(2) >= 0
                iz = plane(3)
                inside &= (iz > inv_far) & (iz < inv_near)
                m = jnp.max(jnp.where(inside, iz, 0.0).reshape(
                    sub_px, sub_px, chunk), axis=-1)
                return jnp.maximum(best, m)

            out_ref[0, sy * sub_px:(sy + 1) * sub_px,
                    sx * sub_px:(sx + 1) * sub_px] = jax.lax.fori_loop(
                0, counts_ref[g, st], body,
                jnp.zeros((sub_px, sub_px), jnp.float32))


def _chunk_raster_call_batched(intr: Intrinsics, T: int, tile: int,
                               chunk: int, interpret: bool, G: int,
                               sub_px: int = _SUB):
    """pallas_call rendering G poses per dispatch: grid (G, ntiles); takes
    (counts (G, nsub), ids (G, nsub, nc), planes (G, nc, 16, chunk)) and
    returns (G, nty*_TILE_H, ntx*_TILE_W) inverse depth in final layout.
    ntiles iterates fastest, so pose g's plane table stays VMEM-resident
    across its tiles and is double-buffered against pose g+1's. SMEM
    bounds G: the whole (G, nsub, nc) id table is scalar-prefetched
    (G=32 at ROI 256x256/5k faces already exceeds the 1 MB SMEM)."""
    H, W = intr.rows, intr.cols
    nty, ntx = -(-H // _TILE_H), -(-W // _TILE_W)
    ntiles = nty * ntx
    nc = (T + (-T) % chunk) // chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, ntiles),
        in_specs=[
            pl.BlockSpec((1, nc, 16, chunk), lambda g, t, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE_H, _TILE_W),
                               lambda g, t, *_: (g, t // ntx, t % ntx),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_chunk_raster_kernel_batched, ntx=ntx,
                          chunk=chunk,
                          inv_near=1.0 / intr.z_near,
                          inv_far=1.0 / intr.z_far, sub_px=sub_px),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, nty * _TILE_H, ntx * _TILE_W),
                                       jnp.float32),
        interpret=interpret,
    )


def _prep_chunks(V, F, pose, intr: Intrinsics, tile: int, chunk: int):
    """Per-pose chunked-kernel inputs: packed plane table + per-tile chunk
    id lists. V/F may be traced arrays (per-hypothesis meshes) — only their
    SHAPES must be static."""
    xy, z = _project(V, pose, intr)
    return _prep_chunks_xy(xy, z, F, intr, tile, chunk)


def _prep_chunks_xy(xy, z, F, intr: Intrinsics, tile: int, chunk: int,
                    sub_px: int = _SUB):
    """_prep_chunks body on pre-projected screen coords — the ROI paths
    shift xy by a per-hypothesis window origin before binning. `tile` is
    accepted for signature stability but the chunked kernel's subtile
    geometry (sub_px x sub_px over the _TILE_W-padded width) is what's
    binned against."""
    H, W = intr.rows, intr.cols
    nty = -(-H // _TILE_H) * (_TILE_H // sub_px)
    nsx = -(-W // _TILE_W) * (_TILE_W // sub_px)
    ntiles = nty * nsx
    _SUB = sub_px
    T = F.shape[0]
    pad = (-T) % chunk
    nc = (T + pad) // chunk

    planes, ok = _triangle_planes(xy, z, F, intr)
    fail = jnp.zeros((12,), jnp.float32).at[2].set(-1.0)
    planes = jnp.concatenate(
        [planes, jnp.broadcast_to(fail, (pad, 12))], axis=0)
    # triangle screen bboxes; dead triangles excluded from chunk bboxes
    p0, p1, p2 = xy[F[:, 0]], xy[F[:, 1]], xy[F[:, 2]]
    xs = jnp.stack([p0[:, 0], p1[:, 0], p2[:, 0]], 0)
    ys = jnp.stack([p0[:, 1], p1[:, 1], p2[:, 1]], 0)
    big = jnp.float32(1e9)
    x0 = jnp.where(ok, jnp.min(xs, 0), big)
    x1 = jnp.where(ok, jnp.max(xs, 0), -big)
    y0 = jnp.where(ok, jnp.min(ys, 0), big)
    y1 = jnp.where(ok, jnp.max(ys, 0), -big)
    x0 = jnp.pad(x0, (0, pad), constant_values=big)
    x1 = jnp.pad(x1, (0, pad), constant_values=-big)
    y0 = jnp.pad(y0, (0, pad), constant_values=big)
    y1 = jnp.pad(y1, (0, pad), constant_values=-big)
    cx0, cx1 = x0.reshape(nc, chunk).min(1), x1.reshape(nc, chunk).max(1)
    cy0, cy1 = y0.reshape(nc, chunk).min(1), y1.reshape(nc, chunk).max(1)
    # packed per-tile lists of overlapping chunk ids (+ counts): the
    # kernel's dynamic trip count. Tiny: (tiles, nc) booleans.
    ty0 = jnp.arange(nty) * _SUB
    tx0 = jnp.arange(nsx) * _SUB
    ov_x = (cx0[None, :] <= (tx0[:, None] + _SUB - 1)) & (cx1[None, :] >= tx0[:, None])
    ov_y = (cy0[None, :] <= (ty0[:, None] + _SUB - 1)) & (cy1[None, :] >= ty0[:, None])
    ov = (ov_y[:, None, :] & ov_x[None, :, :]).reshape(ntiles, nc)
    score = ov.astype(jnp.int32) * (nc - jnp.arange(nc, dtype=jnp.int32))
    _, ids = jax.lax.top_k(score, nc)
    counts = jnp.sum(ov, axis=1, dtype=jnp.int32)

    cpl = planes.reshape(nc, chunk, 12).transpose(0, 2, 1)
    cpl = jnp.pad(cpl, ((0, 0), (0, 4), (0, 0)))              # (nc,16,chunk)
    # ids ship (nc, ntiles): SMEM pads the MINOR dim to 128 lanes, so the
    # id-list axis (nc ~ 41) must not be minor — the (ntiles, nc) layout
    # cost a 3x padded SMEM footprint and overflowed the 1 MB SMEM for
    # pose-batched calls (kernel reads ids_ref[i, st])
    return cpl, ids.astype(jnp.int32).T, counts


# ---------------------------------------------------------------------------
# Batched prep for the multi-mesh paths.
#
# The scan-per-pose prep (_prep_chunks) re-runs ~50 small ops per pose —
# gathers, (T,) vector arithmetic, top_k, layout transposes — and was
# measured to DOMINATE the chunked rasterizer on real 5k-face meshes
# (0.34 of 0.42 ms/pose on v5e; the Pallas kernel itself is ~0.08). Here
# every per-pose quantity is computed for the WHOLE hypothesis batch in
# one pass over (B, T) tensors: corner positions are pre-gathered per
# mesh (no per-pose vertex gathers), projection is one batched matmul,
# plane/bbox arithmetic is elementwise on (B, T), and the per-tile chunk
# id lists come from one batched top_k. The scan then carries ONLY the
# pallas kernel over the precomputed (counts, ids, planes) slices.
# ---------------------------------------------------------------------------

def _planes_batched(C, poses_cw, intr: Intrinsics, origins=None):
    """Batched triangle setup. C (B,T,3,3) model-frame face-corner
    positions; poses_cw (B,3,4); origins (B,2) optional screen-window
    top-lefts subtracted from projected coords. Returns (planes (B,T,12),
    ok (B,T), bbox x0/x1/y0/y1 each (B,T)) — same math as
    _project + _triangle_planes, vectorized over B."""
    R = poses_cw[:, :, :3]
    t = poses_cw[:, :, 3]
    Vc = jnp.einsum("bij,btkj->btki", R, C,
                    precision=jax.lax.Precision.HIGHEST) \
        + t[:, None, None, :]
    z = Vc[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = intr.fx * Vc[..., 0] / safe_z + intr.cx
    v = intr.fy * Vc[..., 1] / safe_z + intr.cy
    if origins is not None:
        u = u - origins[:, 0][:, None, None]
        v = v - origins[:, 1][:, None, None]

    x0, y0, z0 = u[..., 0], v[..., 0], z[..., 0]
    x1, y1, z1 = u[..., 1], v[..., 1], z[..., 1]
    x2, y2, z2 = u[..., 2], v[..., 2], z[..., 2]

    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    zmin = jnp.minimum(jnp.minimum(z0, z1), z2)
    ok = (zmin > intr.z_near) & (zmin < intr.z_far) & (jnp.abs(area) > 1e-12)
    inv_area = jnp.where(ok, 1.0 / jnp.where(jnp.abs(area) > 1e-12, area,
                                             1.0), 0.0)

    def edge(xa, ya, xb, yb):
        a = -(yb - ya)
        b = xb - xa
        c = (yb - ya) * xa - (xb - xa) * ya
        return a * inv_area, b * inv_area, c * inv_area

    a0, b0, c0 = edge(x1, y1, x2, y2)
    a1, b1, c1 = edge(x2, y2, x0, y0)
    a2, b2, c2 = edge(x0, y0, x1, y1)
    iz0 = jnp.where(ok, 1.0 / jnp.maximum(z0, 1e-9), 0.0)
    iz1 = jnp.where(ok, 1.0 / jnp.maximum(z1, 1e-9), 0.0)
    iz2 = jnp.where(ok, 1.0 / jnp.maximum(z2, 1e-9), 0.0)
    az = a0 * iz0 + a1 * iz1 + a2 * iz2
    bz = b0 * iz0 + b1 * iz1 + b2 * iz2
    cz = c0 * iz0 + c1 * iz1 + c2 * iz2
    c0 = jnp.where(ok, c0, -1.0)
    planes = jnp.stack([a0, b0, c0, a1, b1, c1, a2, b2, c2, az, bz, cz], -1)

    xs = jnp.stack([x0, x1, x2], 0)
    ys = jnp.stack([y0, y1, y2], 0)
    big = jnp.float32(1e9)
    bx0 = jnp.where(ok, jnp.min(xs, 0), big)
    bx1 = jnp.where(ok, jnp.max(xs, 0), -big)
    by0 = jnp.where(ok, jnp.min(ys, 0), big)
    by1 = jnp.where(ok, jnp.max(ys, 0), -big)
    return planes, ok, bx0, bx1, by0, by1


def _prep_chunks_all(C, poses_cw, intr: Intrinsics, tile: int, chunk: int,
                     origins=None, sub_px: int = _SUB):
    """Batched _prep_chunks over B poses: C (B,T,3,3) face corners ->
    (planes (B,nc,16,chunk), ids (B,ntiles,nc) i32, counts (B,ntiles) i32).
    sub_px: binning subtile edge, must match the kernel's (see
    _chunk_raster_kernel).
    """
    H, W = intr.rows, intr.cols
    nty = -(-H // _TILE_H) * (_TILE_H // sub_px)
    nsx = -(-W // _TILE_W) * (_TILE_W // sub_px)
    ntiles = nty * nsx
    _SUB = sub_px  # local shadow: subtile extents below follow sub_px
    B, T = C.shape[:2]
    pad = (-T) % chunk
    nc = (T + pad) // chunk

    planes, ok, x0, x1, y0, y1 = _planes_batched(C, poses_cw, intr,
                                                 origins=origins)
    fail = jnp.zeros((12,), jnp.float32).at[2].set(-1.0)
    planes = jnp.concatenate(
        [planes, jnp.broadcast_to(fail, (B, pad, 12))], axis=1)
    big = jnp.float32(1e9)
    x0 = jnp.pad(x0, ((0, 0), (0, pad)), constant_values=big)
    x1 = jnp.pad(x1, ((0, 0), (0, pad)), constant_values=-big)
    y0 = jnp.pad(y0, ((0, 0), (0, pad)), constant_values=big)
    y1 = jnp.pad(y1, ((0, 0), (0, pad)), constant_values=-big)
    cx0 = x0.reshape(B, nc, chunk).min(-1)
    cx1 = x1.reshape(B, nc, chunk).max(-1)
    cy0 = y0.reshape(B, nc, chunk).min(-1)
    cy1 = y1.reshape(B, nc, chunk).max(-1)

    ty0 = jnp.arange(nty) * _SUB
    tx0 = jnp.arange(nsx) * _SUB
    ov_x = (cx0[:, None, :] <= (tx0[None, :, None] + _SUB - 1)) \
        & (cx1[:, None, :] >= tx0[None, :, None])               # (B,nsx,nc)
    ov_y = (cy0[:, None, :] <= (ty0[None, :, None] + _SUB - 1)) \
        & (cy1[:, None, :] >= ty0[None, :, None])               # (B,nty,nc)
    ov = (ov_y[:, :, None, :] & ov_x[:, None, :, :]).reshape(B, ntiles, nc)
    score = ov.astype(jnp.int32) * (nc - jnp.arange(nc, dtype=jnp.int32))
    _, ids = jax.lax.top_k(score, nc)
    counts = jnp.sum(ov, axis=-1, dtype=jnp.int32)

    cpl = planes.reshape(B, nc, chunk, 12).transpose(0, 1, 3, 2)
    cpl = jnp.pad(cpl, ((0, 0), (0, 0), (0, 4), (0, 0)))
    # ids ship (B, nc, ntiles) — see _prep_chunks_xy's SMEM layout note
    return cpl, ids.astype(jnp.int32).transpose(0, 2, 1), counts


def _face_corners(Vs: jnp.ndarray, Fs: jnp.ndarray) -> jnp.ndarray:
    """(M,Vmax,3), (M,Tmax,3) -> per-face corner positions (M,Tmax,3,3).
    Padded faces [0,0,0] become three copies of vertex 0 — zero area,
    rejected by the plane setup.

    PRECOMPUTE this once per mesh database and pass it as `Cs` to the
    multi-mesh rasterizers: when Vs/Fs are traced jit arguments the V[F]
    gather (15k+ dynamic indices) runs per call — measured ~20 ms per CEM
    iteration on v5e, 3x the whole raster+score cost — whereas the padded
    Cs[mesh_idx] row gather is a contiguous DMA."""
    return jax.vmap(lambda V, F: V[F])(Vs, Fs)


def face_corner_stack(Vs, Fs) -> np.ndarray:
    """Host-side _face_corners for mesh-database setup (numpy in, numpy
    out; no device dispatch)."""
    Vs = np.asarray(Vs)
    Fs = np.asarray(Fs)
    return np.stack([V[F] for V, F in zip(Vs, Fs)]).astype(np.float32)


def _chunk_raster_call(intr: Intrinsics, T: int, tile: int, chunk: int,
                       interpret: bool, sub_px: int = _SUB):
    """Build the pallas_call for a given (image, facecount) geometry. The
    output is a per-pose (nty*_TILE_H, ntx*_TILE_W) inverse-depth image in
    FINAL layout: each grid step writes its lane-aligned strip block
    directly, so no stitch transpose exists downstream."""
    H, W = intr.rows, intr.cols
    nty, ntx = -(-H // _TILE_H), -(-W // _TILE_W)
    ntiles = nty * ntx
    nc = (T + (-T) % chunk) // chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((nc, 16, chunk), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_H, _TILE_W),
                               lambda t, *_: (t // ntx, t % ntx),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_chunk_raster_kernel, ntx=ntx,
                          chunk=chunk,
                          inv_near=1.0 / intr.z_near,
                          inv_far=1.0 / intr.z_far, sub_px=sub_px),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nty * _TILE_H, ntx * _TILE_W),
                                       jnp.float32),
        interpret=interpret,
    )


def _stitch_inv(inv, intr: Intrinsics, tile: int):
    """Crop the padded strip image and convert inverse depth -> depth.
    (inv arrives in final layout already — see _chunk_raster_call.)"""
    H, W = intr.rows, intr.cols
    inv = inv[:, :H, :W]
    return jnp.where(inv > 0, 1.0 / jnp.maximum(inv, 1e-12), jnp.inf)


@functools.partial(jax.jit, static_argnames=("intr", "tile", "chunk",
                                             "interpret"))
def rasterize_depth_chunked(V: jnp.ndarray, F: jnp.ndarray,
                            poses_cw: jnp.ndarray, intr: Intrinsics,
                            tile: int = 32, chunk: int = 128,
                            interpret: bool = False) -> jnp.ndarray:
    """Batched exact rasterizer: poses_cw (B,3,4) -> depth (B,H,W) f32,
    +inf background. Pass F through sort_faces_morton for performance (the
    result is identical for any face order)."""
    call = _chunk_raster_call(intr, F.shape[0], tile, chunk, interpret)

    def one_pose(_, pose):
        # scanned (not vmapped): the scalar-prefetch id table must stay
        # per-pose to fit SMEM, and poses are serial on one core anyway
        planes, ids, counts = _prep_chunks(V, F, pose, intr, tile, chunk)
        return None, call(counts, ids, planes)

    _, inv = jax.lax.scan(one_pose, None, poses_cw)
    return _stitch_inv(inv, intr, tile)


@functools.partial(jax.jit, static_argnames=("intr", "tile", "chunk",
                                             "interpret"))
def rasterize_depth_chunked_multi(Vs: jnp.ndarray, Fs: jnp.ndarray,
                                  poses_cw: jnp.ndarray,
                                  mesh_idx: jnp.ndarray, intr: Intrinsics,
                                  tile: int = 32, chunk: int = 128,
                                  interpret: bool = False,
                                  Cs: Optional[jnp.ndarray] = None
                                  ) -> jnp.ndarray:
    """Chunked rasterizer over a STACK of padded meshes: hypothesis b
    renders mesh Vs[mesh_idx[b]], Fs[mesh_idx[b]] at poses_cw[b].

    Vs (M,Vmax,3) zero-padded vertices, Fs (M,Tmax,3) faces padded with
    degenerate [0,0,0] rows (zero area -> rejected by _triangle_planes).
    One dispatch renders hypotheses of DIFFERENT objects — the multi-object
    mapper's whole per-frame hypothesis batch at once. Triangle setup is
    batched over all poses (see _prep_chunks_all); the scan carries only
    the Pallas kernel. Cs: optional precomputed face_corner_stack(Vs, Fs)
    — pass it whenever Vs/Fs are traced jit arguments (see
    _face_corners)."""
    call = _chunk_raster_call(intr, Fs.shape[1], tile, chunk, interpret)

    if Cs is None:
        Cs = _face_corners(Vs, Fs)
    C = Cs[mesh_idx.astype(jnp.int32)]
    planes, ids, counts = _prep_chunks_all(C, poses_cw, intr, tile, chunk)

    def one_pose(_, args):
        cpl, idl, cnt = args
        return None, call(cnt, idl, cpl)

    _, inv = jax.lax.scan(one_pose, None, (planes, ids, counts))
    return _stitch_inv(inv, intr, tile)


def _roi_intr(intr: Intrinsics, roi) -> Intrinsics:
    return Intrinsics(fx=intr.fx, fy=intr.fy, cx=intr.cx, cy=intr.cy,
                      rows=roi[0], cols=roi[1],
                      z_near=intr.z_near, z_far=intr.z_far)


@functools.partial(jax.jit, static_argnames=("intr", "roi", "tile", "chunk",
                                             "interpret"))
def rasterize_depth_chunked_multi_roi(Vs: jnp.ndarray, Fs: jnp.ndarray,
                                      poses_cw: jnp.ndarray,
                                      mesh_idx: jnp.ndarray,
                                      origins: jnp.ndarray,
                                      intr: Intrinsics, roi,
                                      tile: int = 32, chunk: int = 128,
                                      interpret: bool = False,
                                      Cs: Optional[jnp.ndarray] = None
                                      ) -> jnp.ndarray:
    """ROI-windowed chunked rasterizer: hypothesis b renders mesh
    mesh_idx[b] at poses_cw[b] into a (roi[0], roi[1]) window whose
    top-left GLOBAL pixel is origins[b] = (x0, y0) float32.

    Equals the full-frame render cropped at the same window up to float
    roundoff (the edge/interpolation planes are affine in pixel coords; an
    ROI is a screen-space translation: shift projected xy, raster a
    smaller tile grid) — for ALL geometry, whether or not it fits the
    window. This is the semantic CEM's key economy — object hypotheses
    cover a small screen region, so the per-hypothesis raster/score cost
    drops from H*W to the window size (the reference renders full frames
    per hypothesis, renderer.cpp:353-400)."""
    roi_intr = _roi_intr(intr, roi)
    call = _chunk_raster_call(roi_intr, Fs.shape[1], tile, chunk, interpret)

    if Cs is None:
        Cs = _face_corners(Vs, Fs)
    C = Cs[mesh_idx.astype(jnp.int32)]
    planes, ids, counts = _prep_chunks_all(
        C, poses_cw, roi_intr, tile, chunk,
        origins=jnp.asarray(origins, jnp.float32))

    def one_pose(_, args):
        cpl, idl, cnt = args
        return None, call(cnt, idl, cpl)

    _, inv = jax.lax.scan(one_pose, None, (planes, ids, counts))
    return _stitch_inv(inv, roi_intr, tile)


@functools.partial(jax.jit, static_argnames=("intr", "roi", "tile",
                                             "capacity"))
def rasterize_depth_roi(V: jnp.ndarray, F: jnp.ndarray,
                        pose_cw: jnp.ndarray, origin: jnp.ndarray,
                        intr: Intrinsics, roi, tile: int = 32,
                        capacity: int = 128) -> jnp.ndarray:
    """XLA-path ROI render (CPU/tests twin of
    rasterize_depth_chunked_multi_roi): one pose into a (roi[0], roi[1])
    window at global top-left `origin` (x0, y0). vmap for batches."""
    roi_intr = _roi_intr(intr, roi)
    xy, z = _project(V, pose_cw, intr)
    return _raster_tiles(xy - jnp.asarray(origin, jnp.float32)[None, :], z,
                         F, roi_intr, tile, capacity)


@functools.partial(jax.jit, static_argnames=("intr", "tile", "capacity"))
def rasterize_depth(V: jnp.ndarray, F: jnp.ndarray, pose_cw: jnp.ndarray,
                    intr: Intrinsics, tile: int = 32,
                    capacity: int = 128) -> jnp.ndarray:
    """Depth image (rows, cols) f32, +inf background.

    V (N,3) model vertices, F (T,3) int32 faces, pose_cw (3,4) model->camera.
    vmap over pose_cw for hypothesis batches.
    """
    xy, z = _project(V, pose_cw, intr)
    return _raster_tiles(xy, z, F, intr, tile, capacity)


@functools.partial(jax.jit, static_argnames=("intr", "chunk"))
def rasterize_depth_brute(V: jnp.ndarray, F: jnp.ndarray, pose_cw: jnp.ndarray,
                          intr: Intrinsics, chunk: int = 8) -> jnp.ndarray:
    """Reference implementation: all pixels x all triangles, scanned in
    triangle chunks (correctness oracle for the binned version)."""
    H, W = intr.rows, intr.cols
    xy, z = _project(V, pose_cw, intr)
    T = F.shape[0]
    pad = (-T) % chunk
    Fp = jnp.pad(F, ((0, pad), (0, 0)))
    valid_tri = jnp.pad(jnp.ones(T, bool), (0, pad))

    yy, xx = jnp.mgrid[0:H, 0:W]
    pix = jnp.stack([xx, yy], -1).astype(jnp.float32).reshape(-1, 2)  # (P,2)

    def body(carry, args):
        Fc, vc = args
        p0, p1, p2 = xy[Fc[:, 0]], xy[Fc[:, 1]], xy[Fc[:, 2]]
        z0, z1, z2 = z[Fc[:, 0]], z[Fc[:, 1]], z[Fc[:, 2]]

        def edge(a, b):
            return ((b[:, 0] - a[:, 0])[:, None] * (pix[None, :, 1] - a[:, 1][:, None])
                    - (b[:, 1] - a[:, 1])[:, None] * (pix[None, :, 0] - a[:, 0][:, None]))

        w0, w1, w2 = edge(p1, p2), edge(p2, p0), edge(p0, p1)
        area = ((p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1])
                - (p1[:, 1] - p0[:, 1]) * (p2[:, 0] - p0[:, 0]))[:, None]
        pos = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (area > 1e-12)
        neg = (w0 <= 0) & (w1 <= 0) & (w2 <= 0) & (area < -1e-12)
        zmin = jnp.minimum(jnp.minimum(z0, z1), z2)[:, None]
        inside = (pos | neg) & vc[:, None] & (zmin > intr.z_near)

        safe_area = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
        b0, b1, b2 = w0 / safe_area, w1 / safe_area, w2 / safe_area
        invz = (b0 / z0[:, None] + b1 / z1[:, None] + b2 / z2[:, None])
        d = 1.0 / jnp.maximum(invz, 1e-9)
        d = jnp.where(inside & (d > intr.z_near) & (d < intr.z_far), d, jnp.inf)
        return jnp.minimum(carry, jnp.min(d, axis=0)), None

    init = jnp.full(H * W, jnp.inf, jnp.float32)
    out, _ = jax.lax.scan(
        body, init,
        (Fp.reshape(-1, chunk, 3), valid_tri.reshape(-1, chunk)))
    return out.reshape(H, W)


class Renderer:
    """Drop-in equivalent of the reference Renderer
    (render/renderer.h:41-158): set camera + mesh once, then render depth /
    mask / edge per pose — except poses are batched.

    Pose convention: `g_cm` maps model coords to camera coords (the
    reference passes `model` to the shader and `view = vision_to_graphics`,
    renderer.cpp:293; with the GL flip dropped, model->camera is the single
    transform).
    """

    def __init__(self, intr: Intrinsics, tile: int = 32, capacity: int = 128,
                 use_pallas: Optional[bool] = None):
        self.intr = intr
        self.tile = tile
        self.capacity = capacity
        # Pallas plane-equation kernel on TPU (~80x faster on real meshes);
        # the pure-XLA tile path elsewhere (CPU tests, interpret-free).
        self.use_pallas = (jax.default_backend() == "tpu"
                           if use_pallas is None else use_pallas)
        self.V: Optional[jnp.ndarray] = None
        self.F: Optional[jnp.ndarray] = None

    def set_mesh(self, V, F):
        self.V = jnp.asarray(V, jnp.float32)
        # Morton order is a pure permutation (identical output, any path);
        # it gives the chunked kernel its spatial-coherence chunk skips.
        self.F = jnp.asarray(sort_faces_morton(np.asarray(V), np.asarray(F)))

    def _poses(self, g_cm):
        g = jnp.asarray(g_cm, jnp.float32)
        if g.shape[-2:] == (4, 4):
            g = g[..., :3, :]
        return g.reshape(-1, 3, 4), g.shape[:-2]

    def render_depth(self, g_cm) -> jnp.ndarray:
        """g_cm: (...,3,4) or (...,4,4) model->camera. Returns (...,H,W)."""
        poses, batch = self._poses(g_cm)
        if self.use_pallas and self.tile * self.tile % 128 == 0:
            out = rasterize_depth_chunked(self.V, self.F, poses, self.intr,
                                          self.tile)
        else:
            out = jax.vmap(
                lambda p: rasterize_depth(self.V, self.F, p, self.intr,
                                          self.tile, self.capacity))(poses)
        return out.reshape(*batch, self.intr.rows, self.intr.cols) if batch else out[0]

    def render_mask(self, g_cm) -> jnp.ndarray:
        """uint8 mask: 255 where the mesh covers the pixel (RenderMask
        parity, renderer.cpp:403-433)."""
        d = self.render_depth(g_cm)
        return (jnp.isfinite(d) * 255).astype(jnp.uint8)

    def render_edge(self, g_cm) -> jnp.ndarray:
        """Edge image in [0,1] from linearized depth (RenderEdge parity:
        depth pass + edge_detection.frag; renderer.cpp:353-400)."""
        from visma_tpu.image.edges import depth_edge

        d = self.render_depth(g_cm)
        return depth_edge(d)


def pad_mesh_stack(meshes):
    """Stack meshes of different sizes into padded arrays for
    rasterize_depth_chunked_multi.

    meshes: list of (V (Ni,3), F (Ti,3)). Faces are Morton-sorted per mesh
    (identical output, chunk locality); V is zero-padded, F padded with
    degenerate [0,0,0] rows that _triangle_planes rejects (zero area).
    Returns (Vs (M,Vmax,3) f32, Fs (M,Tmax,3) i32).
    """
    Vmax = max(len(V) for V, _ in meshes)
    Tmax = max(len(F) for _, F in meshes)
    Vs = np.zeros((len(meshes), Vmax, 3), np.float32)
    Fs = np.zeros((len(meshes), Tmax, 3), np.int32)
    for i, (V, F) in enumerate(meshes):
        V = np.asarray(V, np.float32)
        Vs[i, : len(V)] = V
        Fm = sort_faces_morton(V, np.asarray(F))
        Fs[i, : len(Fm)] = Fm
    return jnp.asarray(Vs), jnp.asarray(Fs)


class MultiMeshRenderer:
    """Renderer over a DATABASE of meshes: every call takes a per-hypothesis
    mesh index, so one dispatch renders hypothesis batches of different
    objects (the semantic mapper's whole frame at once — the reference
    renders one mesh per GL pass, renderer.cpp:303-351).
    """

    def __init__(self, intr: Intrinsics, tile: int = 32,
                 capacity: int = 128, use_pallas: Optional[bool] = None):
        self.intr = intr
        self.tile = tile
        self.capacity = capacity
        self.use_pallas = (jax.default_backend() == "tpu"
                           if use_pallas is None else use_pallas)
        self.names: list = []
        self.Vs: Optional[jnp.ndarray] = None
        self.Fs: Optional[jnp.ndarray] = None
        self.Cs: Optional[jnp.ndarray] = None

    def set_meshes(self, mesh_db) -> None:
        """mesh_db: {name: (V, F)} (insertion order fixes indices).

        Invalidates every executor that closed over the previous mesh
        stack as compile-time constants (the fused-CEM cache, see
        semantic.cem.fused_cem_executor) — swapping the database after a
        CEM run would otherwise silently keep rendering the old meshes
        (ADVICE r4 #1)."""
        self.names = list(mesh_db.keys())
        self.__dict__.pop("_cem_exec_cache", None)
        self.__dict__.pop("_retr_exec_cache", None)
        self.Vs, self.Fs = pad_mesh_stack([mesh_db[n] for n in self.names])
        # precomputed per-face corners: keeps the V[F] gather out of the
        # per-dispatch path (see _face_corners)
        self.Cs = jnp.asarray(face_corner_stack(self.Vs, self.Fs))
        # per-instance executor with the mesh stack closed over as
        # compile-time constants: with Vs/Fs/Cs as traced args the
        # compiled kernel scan is ~4x slower on v5e (see _cem_fused_body)
        Vs, Fs, Cs, intr, tile = self.Vs, self.Fs, self.Cs, self.intr, \
            self.tile
        self._chunked_exec = jax.jit(
            lambda poses, mi: rasterize_depth_chunked_multi(
                Vs, Fs, poses, mi, intr, tile, Cs=Cs))

    def index(self, name: str) -> int:
        return self.names.index(name)

    def _poses(self, g_cm):
        g = jnp.asarray(g_cm, jnp.float32)
        if g.shape[-2:] == (4, 4):
            g = g[..., :3, :]
        return g.reshape(-1, 3, 4), g.shape[:-2]

    def render_depth(self, g_cm, mesh_idx) -> jnp.ndarray:
        """g_cm (...,3,4)/(...,4,4) model->camera; mesh_idx (...,) int —
        which database mesh each hypothesis renders. Returns (...,H,W)."""
        poses, batch = self._poses(g_cm)
        mi = jnp.asarray(mesh_idx, jnp.int32).reshape(-1)
        if mi.shape[0] == 1 and poses.shape[0] > 1:
            mi = jnp.broadcast_to(mi, (poses.shape[0],))
        if self.use_pallas and self.tile * self.tile % 128 == 0:
            out = self._chunked_exec(poses, mi)
        else:
            out = jax.vmap(
                lambda m, p: rasterize_depth(self.Vs[m], self.Fs[m], p,
                                             self.intr, self.tile,
                                             self.capacity))(mi, poses)
        return (out.reshape(*batch, self.intr.rows, self.intr.cols)
                if batch else out[0])

    def render_mask(self, g_cm, mesh_idx) -> jnp.ndarray:
        d = self.render_depth(g_cm, mesh_idx)
        return (jnp.isfinite(d) * 255).astype(jnp.uint8)

    def render_edge(self, g_cm, mesh_idx) -> jnp.ndarray:
        from visma_tpu.image.edges import depth_edge

        d = self.render_depth(g_cm, mesh_idx)
        return depth_edge(d)
