"""Lie-group geometry layer (reference parity: core/rodrigues.h, core/se3.h)."""

from visma_tpu.geom.rotations import (
    hat,
    vee,
    dhat,
    dvee,
    dAt_dA,
    dAB_dA,
    dAB_dB,
    rodrigues,
    rodrigues_jac,
    invrodrigues,
    invrodrigues_jac,
    project_so3,
)
from visma_tpu.geom.lie import SO3, SE3

__all__ = [
    "hat", "vee", "dhat", "dvee", "dAt_dA", "dAB_dA", "dAB_dB",
    "rodrigues", "rodrigues_jac", "invrodrigues", "invrodrigues_jac",
    "project_so3", "SO3", "SE3",
]
