"""Auxiliary utilities (reference parity: core/utils.{h,cpp})."""

from visma_tpu.utils.timer import Timer
from visma_tpu.utils.term import TermColor
from visma_tpu.utils.misc import (any_nan, random_matrix, random_vector,
                                  generate_random_color_map, bilinear_sample)

__all__ = ["Timer", "TermColor", "any_nan", "random_matrix", "random_vector",
           "generate_random_color_map", "bilinear_sample"]
