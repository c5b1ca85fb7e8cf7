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

    def __init__(self, intr: Intrinsics, tile: int = 32, capacity: int = 128):
        self.intr = intr
        self.tile = tile
        self.capacity = capacity
        self.V: Optional[jnp.ndarray] = None
        self.F: Optional[jnp.ndarray] = None

    def set_mesh(self, V, F):
        self.V = jnp.asarray(V, jnp.float32)
        self.F = jnp.asarray(F, jnp.int32)

    def _poses(self, g_cm):
        g = jnp.asarray(g_cm, jnp.float32)
        if g.shape[-2:] == (4, 4):
            g = g[..., :3, :]
        return g.reshape(-1, 3, 4), g.shape[:-2]

    def render_depth(self, g_cm) -> jnp.ndarray:
        """g_cm: (...,3,4) or (...,4,4) model->camera. Returns (...,H,W)."""
        poses, batch = self._poses(g_cm)
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
