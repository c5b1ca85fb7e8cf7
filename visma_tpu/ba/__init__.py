"""Sliding-window bundle adjustment + pose-graph optimization.

New capability (BASELINE config 5): the reference consumes BA'd poses from
the closed-source upstream; here BA is a first-class TPU component with a
Schur-complement reduced camera system whose landmark axis shards across
device meshes (visma_tpu.dist).
"""

from visma_tpu.ba.problem import BaProblem, make_problem
from visma_tpu.ba.gauss_newton import ba_solve, ba_step
from visma_tpu.ba.pose_graph import pose_graph_solve

__all__ = ["BaProblem", "make_problem", "ba_solve", "ba_step",
           "pose_graph_solve"]
