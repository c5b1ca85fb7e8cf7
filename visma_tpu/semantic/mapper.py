"""Semantic mapper: per-object pose tracks from detections + edge evidence.

Workflow per frame (the papers' object-level mapping loop):
  1. new detections (BoundingBoxList with shape_id) spawn object tracks,
     initialized by back-projecting the bbox center at a depth prior and
     sweeping yaw (annotation-tool idiom);
  2. existing tracks refine their pose against the frame's edge map with
     CEM over batched render+score;
  3. tracks export as reference-compatible result.json packets
     (model_pose is model->WORLD, composed through the frame's gwc —
     matching MeshAlignment's "ALREADY IN CORVIS FRAME" convention,
     evaluation.cpp:194).
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from visma_tpu.render import Intrinsics, Renderer
from visma_tpu.semantic.cem import refine_pose_cem


@dataclass
class ObjectTrack:
    oid: int
    model_name: str
    pose_wm: np.ndarray              # (4,4) model -> world
    score: float = np.inf
    age: int = 0
    status: int = 2                  # reference result.json status int


class SemanticMapper:
    def __init__(self, intr: Intrinsics, mesh_db: Dict[str, tuple],
                 depth_prior: float = 2.0, cem_iters: int = 5,
                 cem_samples: int = 48, retrieval_yaws: int = 12,
                 azimuth_prior_weight: float = 1.0):
        """mesh_db: model_name -> (V, F).

        retrieval_yaws / azimuth_prior_weight control detection-driven
        shape retrieval (see retrieve_shape)."""
        self.intr = intr
        self.mesh_db = mesh_db
        self.depth_prior = depth_prior
        self.cem_iters = cem_iters
        self.cem_samples = cem_samples
        self.retrieval_yaws = retrieval_yaws
        self.azimuth_prior_weight = azimuth_prior_weight
        self.tracks: Dict[int, ObjectTrack] = {}
        self._renderers: Dict[str, Renderer] = {}
        self._next_id = 0
        self.history: List[List[dict]] = []

    def _renderer(self, name: str) -> Renderer:
        if name not in self._renderers:
            r = Renderer(self.intr, capacity=128)
            V, F = self.mesh_db[name]
            r.set_mesh(V, F)
            self._renderers[name] = r
        return self._renderers[name]

    def _init_pose_cm(self, bbox) -> np.ndarray:
        """Back-project the detection center at the depth prior."""
        cx = 0.5 * (bbox.top_left_x + bbox.bottom_right_x)
        cy = 0.5 * (bbox.top_left_y + bbox.bottom_right_y)
        z = self.depth_prior
        X_cam = np.array([(cx - self.intr.cx) / self.intr.fx * z,
                          (cy - self.intr.cy) / self.intr.fy * z, z])
        T_cm = np.eye(4)
        T_cm[:3, 3] = X_cam
        return T_cm

    def retrieve_shape(self, bbox, edge_map):
        """Detection-driven CAD retrieval (the papers' detector->shape
        step; the reference only ships its OUTPUT as BoundingBox.shape_id,
        vlslam.proto azimuth/shape fields). For a detection with no usable
        shape_id: score every candidate mesh (class-substring filtered)
        over a yaw sweep at the back-projected detection pose in ONE
        batched render per mesh, with the detection's azimuth distribution
        as a -log prior when present. Returns (name, pose_cm (4,4), score)
        or None if the database is empty."""
        import jax.numpy as jnp

        from visma_tpu.render.likelihood import (edge_distance_transform,
                                                 symmetric_edge_score)

        cls = (bbox.class_name or "").lower()
        cands = [n for n in self.mesh_db if cls and cls in n.lower()] \
            or list(self.mesh_db)
        if not cands:
            return None
        T0 = self._init_pose_cm(bbox)
        B = self.retrieval_yaws
        yaws = np.arange(B) * (2 * np.pi / B)
        # rotate about the model/camera Y axis (same convention as the
        # CEM's yaw_only mode): right-multiply = about the object center
        cs, sn = np.cos(yaws), np.sin(yaws)
        Ry = np.zeros((B, 4, 4))
        Ry[:, 0, 0] = cs
        Ry[:, 0, 2] = sn
        Ry[:, 2, 0] = -sn
        Ry[:, 2, 2] = cs
        Ry[:, 1, 1] = 1.0
        Ry[:, 3, 3] = 1.0
        hyps = np.einsum("ij,bjk->bik", T0, Ry)[:, :3, :4]

        prior = np.zeros(B, np.float32)
        ap = np.asarray(bbox.azimuth_prob, np.float32).ravel()
        if ap.size > 0 and self.azimuth_prior_weight > 0:
            p = ap / max(float(ap.sum()), 1e-6)
            bins = np.minimum((yaws / (2 * np.pi) * ap.size).astype(int),
                              ap.size - 1)
            prior = -self.azimuth_prior_weight * np.log(p[bins] + 1e-3)

        em = jnp.asarray(edge_map)
        dt = edge_distance_transform(em)
        best = None
        for name in cands:
            r = self._renderer(name)
            edges = r.render_edge(jnp.asarray(hyps, jnp.float32))
            scores = np.asarray(symmetric_edge_score(edges, dt, em)) + prior
            i = int(np.argmin(scores))
            if best is None or scores[i] < best[2]:
                T = np.eye(4)
                T[:3, :4] = hyps[i]
                best = (name, T, float(scores[i]))
        return best

    def _spawn(self, bbox, gwc: np.ndarray,
               edge_map=None) -> Optional[ObjectTrack]:
        name = bbox.shape_id or bbox.class_name
        if name in self.mesh_db:
            T_cm = self._init_pose_cm(bbox)
        elif edge_map is not None:
            got = self.retrieve_shape(bbox, edge_map)
            if got is None:
                return None
            name, T_cm, _ = got
        else:
            return None
        T_wm = np.eye(4)
        T_wm[:3, :4] = gwc @ T_cm
        tr = ObjectTrack(oid=self._next_id, model_name=name, pose_wm=T_wm)
        self._next_id += 1
        self.tracks[tr.oid] = tr
        return tr

    def step(self, gwc: np.ndarray, edge_map: np.ndarray,
             bboxes=None) -> None:
        """gwc (3,4) camera->world; edge_map (H,W) in [0,1]; bboxes
        optional BoundingBoxList for spawning.

        Edge maps may be stored at a different resolution than the camera
        (EdgeMap carries its own rows/cols, vlslam.proto:49-53); resample
        to the render resolution so scores compare pixels to pixels."""
        edge_map = np.asarray(edge_map, np.float32)
        H, W = self.intr.rows, self.intr.cols
        if edge_map.shape != (H, W):
            ri = (np.arange(H) * edge_map.shape[0] // H).astype(np.int64)
            ci = (np.arange(W) * edge_map.shape[1] // W).astype(np.int64)
            edge_map = edge_map[ri][:, ci]
        gwc = np.asarray(gwc, np.float64)
        G = np.eye(4)
        G[:3, :4] = gwc
        G_cw = np.linalg.inv(G)

        if bboxes is not None:
            for bb in bboxes.bounding_boxes:
                if not self._covered(bb, gwc):
                    self._spawn(bb, gwc, edge_map)

        import jax.numpy as jnp

        # occlusion-aware multi-object refinement: each track's hypotheses
        # are scored against the joint z-buffer of the OTHER tracks at
        # their current poses (front-to-back so near objects settle first)
        tracks = list(self.tracks.values())
        depths = {}
        for tr in tracks:
            pose_cm = (G_cw @ tr.pose_wm)[:3, :4]
            depths[tr.oid] = self._renderer(tr.model_name).render_depth(
                jnp.asarray(pose_cm, jnp.float32))
        tracks.sort(key=lambda tr: (G_cw @ tr.pose_wm)[2, 3])

        for tr in tracks:
            pose_cm = (G_cw @ tr.pose_wm)[:3, :4]
            occ = None
            if len(tracks) > 1:
                occ = jnp.min(jnp.stack(
                    [depths[o.oid] for o in tracks if o.oid != tr.oid]),
                    axis=0)
            refined, score = refine_pose_cem(
                self._renderer(tr.model_name), jnp.asarray(edge_map),
                pose_cm, iters=self.cem_iters, samples=self.cem_samples,
                seed=tr.age, occluder_depth=occ)
            T_cm = np.eye(4)
            T_cm[:3, :4] = refined
            tr.pose_wm = G @ T_cm
            tr.score = score
            tr.age += 1
            depths[tr.oid] = self._renderer(tr.model_name).render_depth(
                jnp.asarray(refined, jnp.float32))

        self.history.append(self.export_packet())

    def _covered(self, bbox, gwc: np.ndarray) -> bool:
        """Does an existing track project near this detection center?"""
        cx = 0.5 * (bbox.top_left_x + bbox.bottom_right_x)
        cy = 0.5 * (bbox.top_left_y + bbox.bottom_right_y)
        G = np.eye(4)
        G[:3, :4] = gwc
        G_cw = np.linalg.inv(G)
        for tr in self.tracks.values():
            c_w = tr.pose_wm[:3, 3]
            c_c = G_cw[:3, :3] @ c_w + G_cw[:3, 3]
            if c_c[2] <= 0.1:
                continue
            u = self.intr.fx * c_c[0] / c_c[2] + self.intr.cx
            v = self.intr.fy * c_c[1] / c_c[2] + self.intr.cy
            if abs(u - cx) < 80 and abs(v - cy) < 80:
                return True
        return False

    def export_packet(self) -> List[dict]:
        """One result.json packet (evaluation.cpp:163-198 layout)."""
        out = []
        for tr in self.tracks.values():
            out.append({
                "id": tr.oid,
                "model_name": tr.model_name,
                "status": tr.status,
                "model_pose": [float(x)
                               for x in tr.pose_wm[:3, :4].reshape(-1)],
            })
        return out

    def write_result_json(self, path: str) -> None:
        with open(path, "w") as fp:
            json.dump(self.history, fp, indent=1)
