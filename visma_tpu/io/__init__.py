"""Dataset and asset I/O layer (reference parity: src/dataloader.cpp,
core/utils.{h,cpp} I/O helpers, include/dataloader.h)."""

from visma_tpu.io.glob import glob_by_timestamp
from visma_tpu.io.loader import VlslamDatasetLoader, FrameData, load_edgemap
from visma_tpu.io.mesh import load_mesh, save_obj, save_ply, load_obj, load_ply
from visma_tpu.io.json_io import (
    load_json, save_json, merge_json, matrix_from_json, matrix_to_json,
)
from visma_tpu.io.binary import save_mat, load_mat

__all__ = [
    "glob_by_timestamp", "VlslamDatasetLoader", "FrameData", "load_edgemap",
    "load_mesh", "save_obj", "save_ply", "load_obj", "load_ply",
    "load_json", "save_json", "merge_json", "matrix_from_json", "matrix_to_json",
    "save_mat", "load_mat",
]
