"""Semantic mapper tests: CEM pose refinement recovers a perturbed object
pose from edge evidence; mapper exports evaluation-compatible result.json."""
import json

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from visma_tpu.proto import BoundingBox, BoundingBoxList
from visma_tpu.render import Intrinsics, Renderer
from visma_tpu.semantic import SemanticMapper, refine_pose_cem


def l_mesh():
    """Asymmetric L of two boxes (crisp, orientation-dependent edges)."""
    from tests.test_eval import cube_mesh

    V1, F1 = cube_mesh(1.0)
    V1 = V1 * np.array([0.25, 0.6, 0.25], np.float32)  # tall box
    V2, F2 = cube_mesh(1.0)
    V2 = V2 * np.array([0.45, 0.15, 0.2], np.float32) + \
        np.array([0.35, -0.2, 0.0], np.float32)        # foot
    Vall = np.concatenate([V1, V2]).astype(np.float32)
    Fall = np.concatenate([F1, F2 + len(V1)]).astype(np.int32)
    return Vall, Fall


INTR = Intrinsics(fx=150.0, fy=150.0, cx=79.5, cy=59.5, rows=120, cols=160,
                  z_near=0.05, z_far=10.0)


class TestCem:
    def test_recovers_perturbed_pose(self):
        V, F = l_mesh()
        r = Renderer(INTR, capacity=96)
        r.set_mesh(V, F)

        true_T = np.eye(4)
        true_T[:3, 3] = [0.05, -0.02, 2.0]
        observed = np.asarray(r.render_edge(
            jnp.asarray(true_T[:3, :4].astype(np.float32))))

        init = true_T.copy()
        init[:3, 3] += [0.12, -0.08, 0.15]
        init[:3, :3] = Rotation.from_euler("y", 0.4).as_matrix()

        refined, score = refine_pose_cem(r, jnp.asarray(observed),
                                         init[:3, :4], iters=10, samples=64,
                                         init_sigma=(0.25, 0.08),
                                         yaw_only=True, seed=2)
        r_err = Rotation.from_matrix(
            refined[:, :3] @ true_T[:3, :3].T).magnitude()
        init_lat = np.linalg.norm((init[:3, 3] - true_T[:3, 3])[:2])
        lat_err = np.linalg.norm((refined[:, 3] - true_T[:3, 3])[:2])
        # lateral position and yaw must tighten substantially; depth along
        # the view ray is weakly observable from edges (±0.05 rad is the
        # flat basin of the score at this resolution — measured)
        assert lat_err < 0.35 * init_lat, (lat_err, init_lat)
        assert r_err < 0.15, r_err
        assert score < 0.3, score


class TestMapper:
    def test_spawn_track_and_export(self, tmp_path):
        V, F = l_mesh()
        mapper = SemanticMapper(INTR, {"lchair": (V, F)}, depth_prior=2.0,
                                cem_iters=3, cem_samples=32)

        # ground truth object sits 2m ahead in the first camera frame
        gwc0 = np.hstack([np.eye(3), np.zeros((3, 1))])
        r = Renderer(INTR, capacity=96)
        r.set_mesh(V, F)
        true_T = np.eye(4)
        true_T[:3, 3] = [0.0, 0.0, 2.0]
        edges0 = np.asarray(r.render_edge(
            jnp.asarray(true_T[:3, :4].astype(np.float32))))

        # detection bbox roughly centered on the object
        bl = BoundingBoxList(bounding_boxes=[BoundingBox(
            top_left_x=50, top_left_y=30, bottom_right_x=110,
            bottom_right_y=90, shape_id="lchair")])

        mapper.step(gwc0, edges0, bl)
        assert len(mapper.tracks) == 1
        tr = next(iter(mapper.tracks.values()))
        # after one refinement the object should be near 2m ahead
        assert abs(tr.pose_wm[2, 3] - 2.0) < 0.4

        # second frame: no new detection spawned (covered), pose refines
        mapper.step(gwc0, edges0, bl)
        assert len(mapper.tracks) == 1

        out = tmp_path / "result.json"
        mapper.write_result_json(str(out))
        data = json.loads(out.read_text())
        assert len(data) == 2  # two packets
        obj = data[-1][0]
        assert obj["model_name"] == "lchair"
        assert len(obj["model_pose"]) == 12
        # reloadable through the eval-side reader
        from visma_tpu.io.json_io import matrix_from_json

        pose = matrix_from_json(obj, "model_pose", 3, 4)
        assert pose.shape == (3, 4)
