"""Semantic mapper: per-object pose tracks from detections + edge evidence.

Workflow per frame (the papers' object-level mapping loop):
  1. new detections (BoundingBoxList with shape_id) spawn object tracks,
     initialized by back-projecting the bbox center at a depth prior and
     sweeping yaw (annotation-tool idiom);
  2. existing tracks refine their pose against the frame's edge map with
     CEM over batched render+score — ALL tracks jointly: one render+score
     dispatch per CEM iteration covers every track's hypothesis batch
     (render.raster.MultiMeshRenderer over the padded mesh stack), so the
     per-frame dispatch count is O(1) in the number of objects;
  3. tracks export as reference-compatible result.json packets
     (model_pose is model->WORLD, composed through the frame's gwc —
     matching MeshAlignment's "ALREADY IN CORVIS FRAME" convention,
     evaluation.cpp:194).

Occlusion handling: each track's hypotheses score against the joint
z-buffer of the OTHER tracks at their poses at the START of the frame
(one batched render). The r1 implementation instead settled tracks
sequentially front-to-back, updating occluders as it went — one dispatch
chain per object (~30 ms relay RTT each); the joint refinement converges
to the same poses over the 2-3 frames a track takes to settle while
keeping the frame cost flat in object count.
"""
from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from visma_tpu.render import Intrinsics
from visma_tpu.render.raster import MultiMeshRenderer
from visma_tpu.semantic.cem import refine_pose_cem_batched


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
                 azimuth_prior_weight: float = 1.0,
                 roi: Optional[tuple] = None):
        """mesh_db: model_name -> (V, F).

        retrieval_yaws / azimuth_prior_weight control detection-driven
        shape retrieval (see retrieve_shape). roi: optional (Hr, Wr)
        screen window for CEM render+score of SETTLED tracks (age >= 1;
        fresh spawns refine full-frame since their init error can exceed
        the window margin) — per-hypothesis cost drops from rows*cols to
        Hr*Wr pixels, exact while footprints stay inside the window."""
        self.intr = intr
        self.mesh_db = mesh_db
        self.depth_prior = depth_prior
        self.cem_iters = cem_iters
        self.cem_samples = cem_samples
        self.retrieval_yaws = retrieval_yaws
        self.azimuth_prior_weight = azimuth_prior_weight
        self.roi = None if roi is None else (int(roi[0]), int(roi[1]))
        self.tracks: Dict[int, ObjectTrack] = {}
        self.mrenderer = MultiMeshRenderer(intr, capacity=128)
        if mesh_db:
            self.mrenderer.set_meshes(mesh_db)
        self._next_id = 0
        self.history: List[List[dict]] = []

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
        batched render across ALL (mesh, yaw) pairs, with the detection's
        azimuth distribution as a -log prior when present. Returns
        (name, pose_cm (4,4), score) or None if the database is empty."""
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
        # one dispatch over all (mesh, yaw) hypotheses
        idxs = np.array([self.mrenderer.index(n) for n in cands], np.int32)
        Mc = len(cands)
        poses = np.tile(hyps, (Mc, 1, 1))                      # (Mc*B,3,4)
        mi = np.repeat(idxs, B)
        edges = self.mrenderer.render_edge(
            jnp.asarray(poses, jnp.float32), jnp.asarray(mi))
        scores = np.asarray(symmetric_edge_score(edges, dt, em)).reshape(
            Mc, B) + prior[None, :]
        m, b = np.unravel_index(int(np.argmin(scores)), scores.shape)
        T = np.eye(4)
        T[:3, :4] = hyps[b]
        return cands[m], T, float(scores[m, b])

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

        tracks = list(self.tracks.values())
        if tracks:
            import jax.numpy as jnp

            poses_cm = np.stack([(G_cw @ tr.pose_wm)[:3, :4]
                                 for tr in tracks]).astype(np.float32)
            mesh_idx = np.array(
                [self.mrenderer.index(tr.model_name) for tr in tracks],
                np.int32)

            occ = None
            if len(tracks) > 1:
                # one dispatch: all current depths + per-track exclusive
                # min over the others (occluder z-buffers)
                occ = _exclusive_min_depths(
                    self.mrenderer.Vs, self.mrenderer.Fs,
                    jnp.asarray(poses_cm), jnp.asarray(mesh_idx),
                    self.mrenderer.intr, self.mrenderer.tile,
                    self.mrenderer.capacity, self.mrenderer.use_pallas)

            roi = self.roi if all(tr.age >= 1 for tr in tracks) else None
            refined, scores = refine_pose_cem_batched(
                self.mrenderer, jnp.asarray(edge_map), poses_cm, mesh_idx,
                iters=self.cem_iters, samples=self.cem_samples,
                seed=min(tr.age for tr in tracks),
                occluder_depths=occ, roi=roi)
            for i, tr in enumerate(tracks):
                T_cm = np.eye(4)
                T_cm[:3, :4] = refined[i]
                tr.pose_wm = G @ T_cm
                tr.score = float(scores[i])
                tr.age += 1

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


def _exclusive_min_depths(Vs, Fs, poses, mesh_idx, intr, tile, capacity,
                          use_pallas):
    """Render all n tracks' current depths and return, per track, the min
    depth over the OTHER tracks (+inf background) — one dispatch."""
    import functools

    return _exclusive_min_depths_jit(
        Vs, Fs, poses, mesh_idx, intr=intr, tile=tile, capacity=capacity,
        use_pallas=use_pallas)


def _make_exclusive_min():
    import functools

    import jax
    import jax.numpy as jnp

    from visma_tpu.render.raster import (rasterize_depth,
                                         rasterize_depth_chunked_multi)

    @functools.partial(jax.jit, static_argnames=("intr", "tile", "capacity",
                                                 "use_pallas"))
    def run(Vs, Fs, poses, mesh_idx, intr, tile, capacity, use_pallas):
        if use_pallas:
            d = rasterize_depth_chunked_multi(Vs, Fs, poses, mesh_idx,
                                              intr, tile)
        else:
            d = jax.vmap(
                lambda m, p: rasterize_depth(Vs[m], Fs[m], p, intr, tile,
                                             capacity))(mesh_idx, poses)
        n = d.shape[0]
        mask = ~jnp.eye(n, dtype=bool)                       # (n,n)
        dd = jnp.where(mask[:, :, None, None], d[None], jnp.inf)
        return jnp.min(dd, axis=1)                           # (n,H,W)

    return run


_exclusive_min_depths_jit = _make_exclusive_min()
