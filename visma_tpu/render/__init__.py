"""Batched mesh renderer: depth / mask / edge without OpenGL
(reference parity: render/renderer.{h,cpp} + shaders)."""

from visma_tpu.render.camera import Intrinsics, to_gl_depth
from visma_tpu.render.raster import (
    Renderer, rasterize_depth, rasterize_depth_brute,
)

__all__ = [
    "Intrinsics", "to_gl_depth", "Renderer",
    "rasterize_depth", "rasterize_depth_brute",
]
