"""Object-level scene registration (reference parity: evaluation.cpp:17-112).

`register_scenes` proposes a transform from every same-shape object pair
and keeps the proposal with maximal correspondence support (the reference's
RANSAC-like loop, evaluation.cpp:79-112); `optimize_alignment` is the IRLS
SE(3) averaging the reference left as a stub-that-throws
(evaluation.cpp:43-77) — implemented here using the SE(3) log/exp from
visma_tpu.geom.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from visma_tpu.geom import SE3
import jax.numpy as jnp


def find_correspondences(tgt: Dict[int, np.ndarray],
                         src: Dict[int, np.ndarray],
                         T_tgt_src: np.ndarray,
                         threshold: float = 0.5) -> List[Tuple[int, int]]:
    """Greedy NN matching of object poses under a proposed transform
    (evaluation.cpp:17-41). tgt/src map object id -> 4x4 model_to_scene.
    Returns [(src_id, tgt_id)]."""
    matches = []
    for sid, m1 in src.items():
        best, best_d = -1, threshold
        for tid, m2 in tgt.items():
            T_scene_model = T_tgt_src @ m1
            dT = np.linalg.inv(T_scene_model) @ m2
            d = float(np.linalg.norm(dT[:3, 3]))
            if d < best_d:
                best_d, best = d, tid
        if best >= 0:
            matches.append((sid, best))
    return matches


def register_scenes(tgt: Dict[int, dict], src: Dict[int, dict],
                    threshold: float = 0.5, refine: bool = True):
    """tgt/src: id -> {"name": str, "pose": 4x4 model_to_scene}.

    Returns (T_tgt_src 4x4, matches). Proposals come from same-name object
    pairs (evaluation.cpp:86-105); optional IRLS refinement over the final
    match set replaces the reference's stubbed OptimizeAlignment.
    """
    tgt_poses = {k: v["pose"] for k, v in tgt.items()}
    src_poses = {k: v["pose"] for k, v in src.items()}

    best_matches: List[Tuple[int, int]] = []
    best_T = np.eye(4)
    for sid, s in src.items():
        for tid, t in tgt.items():
            if s["name"] != t["name"]:
                continue
            T = t["pose"] @ np.linalg.inv(s["pose"])
            matches = find_correspondences(tgt_poses, src_poses, T, threshold)
            if len(matches) > len(best_matches):
                best_matches, best_T = matches, T

    if refine and len(best_matches) >= 2:
        best_T = optimize_alignment(tgt_poses, src_poses, best_matches,
                                    init=best_T)
    return best_T, best_matches


def optimize_alignment(tgt: Dict[int, np.ndarray], src: Dict[int, np.ndarray],
                       matches: List[Tuple[int, int]],
                       init: np.ndarray = None, iters: int = 50) -> np.ndarray:
    """IRLS SE(3) averaging of per-match alignments (the algorithm sketched
    in the reference's commented-out body, evaluation.cpp:49-76, made
    convergent: iterate T <- exp(sum w_k log(T_k T^-1)) T with weights
    1/max(eps, ||log||))."""
    if not matches:
        return np.eye(4) if init is None else init
    Ts = [SE3.from_matrix(jnp.asarray(tgt[t] @ np.linalg.inv(src[s]),
                                      jnp.float32))
          for s, t in matches]
    T = SE3.from_matrix(jnp.asarray(
        init if init is not None else np.asarray(Ts[0].matrix()), ))

    for _ in range(iters):
        logs = []
        ws = []
        for Tk in Ts:
            d = (Tk @ T.inv()).log()
            n = float(jnp.linalg.norm(d))
            w = 1.0 / max(1e-4, n)
            logs.append(np.asarray(d))
            ws.append(w)
        ws = np.asarray(ws)
        ws = ws / ws.sum()
        step = jnp.asarray((np.asarray(logs) * ws[:, None]).sum(0))
        if float(jnp.linalg.norm(step)) < 1e-7:
            break
        T = SE3.exp(step) @ T
    return np.asarray(T.matrix())
