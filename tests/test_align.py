"""Alignment tests: Umeyama, NN, voxel downsample, ICP, scene registration,
yaw-enumeration annotation (reference parity: constrained_ICP.cpp,
evaluation.cpp, annotation.cpp)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from visma_tpu.align import (
    umeyama, umeyama_4dof, nearest_neighbors, voxel_downsample, icp,
    register_scenes, optimize_alignment, register_model_to_scene,
    find_plane_normal,
)


def rand_cloud(n=200, seed=0):
    return np.random.default_rng(seed).normal(size=(n, 3)).astype(np.float32)


def rand_T(seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    T = np.eye(4)
    T[:3, :3] = scale * Rotation.from_rotvec(rng.normal(size=3)).as_matrix()
    T[:3, 3] = rng.normal(size=3)
    return T


class TestUmeyama:
    def test_exact_recovery(self):
        src = rand_cloud()
        T = rand_T(1)
        dst = src @ T[:3, :3].T + T[:3, 3]
        T_est = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(T_est, T, atol=1e-4)

    def test_with_scale(self):
        src = rand_cloud()
        R = Rotation.from_rotvec([0.2, -0.4, 0.9]).as_matrix()
        dst = 1.7 * src @ R.T + np.array([1, 2, 3])
        T_est = np.asarray(umeyama(jnp.asarray(src),
                                   jnp.asarray(dst.astype(np.float32)),
                                   with_scaling=True))
        scale = np.linalg.norm(T_est[:3, 0])
        assert abs(scale - 1.7) < 1e-3
        np.testing.assert_allclose(T_est[:3, :3] / scale, R, atol=1e-4)

    def test_weighted_ignores_outliers(self):
        src = rand_cloud(100)
        T = rand_T(2)
        dst = src @ T[:3, :3].T + T[:3, 3]
        dst[:10] += 50.0  # corrupted
        w = np.ones(100, np.float32)
        w[:10] = 0.0
        T_est = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(dst),
                                   weights=jnp.asarray(w)))
        np.testing.assert_allclose(T_est, T, atol=1e-4)

    def test_4dof_yaw_only(self):
        src = rand_cloud()
        th = 0.8
        R = Rotation.from_euler("z", th).as_matrix()
        dst = src @ R.T + np.array([0.5, -0.2, 1.0])
        T_est = np.asarray(umeyama_4dof(jnp.asarray(src),
                                        jnp.asarray(dst.astype(np.float32))))
        np.testing.assert_allclose(T_est[:3, :3], R, atol=1e-4)
        # constrained: no tilt even for full-3D misalignment input
        R3 = Rotation.from_rotvec([0.3, 0.2, 0.5]).as_matrix()
        dst2 = src @ R3.T
        T2 = np.asarray(umeyama_4dof(jnp.asarray(src),
                                     jnp.asarray(dst2.astype(np.float32))))
        assert abs(T2[2, 0]) < 1e-6 and abs(T2[2, 1]) < 1e-6
        assert abs(T2[0, 2]) < 1e-6 and abs(T2[1, 2]) < 1e-6


class TestNN:
    def test_matches_kdtree(self):
        from scipy.spatial import cKDTree

        q = rand_cloud(500, 1)
        r = rand_cloud(300, 2)
        idx, d2 = nearest_neighbors(jnp.asarray(q), jnp.asarray(r))
        tree = cKDTree(r)
        d_ref, i_ref = tree.query(q)
        np.testing.assert_array_equal(np.asarray(idx), i_ref)
        np.testing.assert_allclose(np.sqrt(np.asarray(d2)), d_ref, atol=1e-4)

    def test_ref_valid_mask(self):
        q = np.zeros((1, 3), np.float32)
        r = np.array([[0.1, 0, 0], [5, 5, 5]], np.float32)
        mask = jnp.asarray([False, True])
        idx, d2 = nearest_neighbors(jnp.asarray(q), jnp.asarray(r), mask)
        assert int(idx[0]) == 1


class TestVoxel:
    def test_grid_counts(self):
        # 8 points in distinct voxels + 3 coincident-voxel points
        pts = np.array([[x, y, z] for x in (0.1, 1.1) for y in (0.1, 1.1)
                        for z in (0.1, 1.1)]
                       + [[0.12, 0.13, 0.11], [0.14, 0.12, 0.13],
                          [3.5, 3.5, 3.5]], np.float32)
        out, valid = voxel_downsample(jnp.asarray(pts), 1.0)
        assert int(valid.sum()) == 9
        # the voxel holding 3 points averages them
        got = np.asarray(out)[np.asarray(valid)]
        target = pts[[0, 8, 9]].mean(axis=0)
        d = np.min(np.linalg.norm(got - target, axis=1))
        assert d < 1e-5

    def test_reduces_density(self):
        pts = rand_cloud(2000, 3) * 0.5
        out, valid = voxel_downsample(jnp.asarray(pts), 0.25)
        assert 10 < int(valid.sum()) < 1500


class TestICP:
    def make_pair(self, seed=0, d=0.08):
        base = rand_cloud(400, seed)
        T = np.eye(4)
        T[:3, :3] = Rotation.from_rotvec([0.05, -0.04, 0.06]).as_matrix()
        T[:3, 3] = [d, -d / 2, d / 3]
        src = base
        dst = base @ T[:3, :3].T + T[:3, 3]
        return src, dst, T

    def test_point_to_point_converges(self):
        src, dst, T = self.make_pair()
        res = icp(src, dst, max_distance=0.3)
        np.testing.assert_allclose(res.transformation, T, atol=5e-3)
        assert res.fitness > 0.99
        assert res.inlier_rmse < 1e-2

    def test_point_to_plane_converges(self):
        # bumpy surface (curvature makes all 6 DOF observable)
        rng = np.random.default_rng(5)
        xy = rng.uniform(-1, 1, (600, 2))
        z = 0.1 * xy[:, 0] + 0.15 * np.sin(3 * xy[:, 0]) * np.sin(3 * xy[:, 1])
        src = np.column_stack([xy, z]).astype(np.float32)
        T = np.eye(4)
        T[:3, 3] = [0.02, -0.01, 0.05]
        dst = src + T[:3, 3]
        res = icp(src, dst, max_distance=0.3, point_to_plane=True,
                  max_iters=30)
        np.testing.assert_allclose(res.transformation[:3, 3], T[:3, 3],
                                   atol=8e-3)

    def test_fitness_zero_when_far(self):
        src = rand_cloud(100, 1)
        dst = rand_cloud(100, 2) + 100.0
        res = icp(src, dst, max_distance=0.05, max_iters=2)
        assert res.fitness == 0.0


class TestRegistration:
    def make_scene(self, T_scene, n_obj=3):
        rng = np.random.default_rng(7)
        objs = {}
        for i in range(n_obj):
            pose = np.eye(4)
            pose[:3, :3] = Rotation.from_euler("z", rng.uniform(0, 6)).as_matrix()
            pose[:3, 3] = rng.uniform(-2, 2, 3)
            objs[i] = {"name": f"chair{i % 2}", "pose": pose}
        moved = {i: {"name": o["name"], "pose": T_scene @ o["pose"]}
                 for i, o in objs.items()}
        return objs, moved

    def test_register_scenes_recovers_transform(self):
        T = rand_T(9)
        src, tgt = self.make_scene(T)  # tgt = T @ src
        T_est, matches = register_scenes(tgt, src)
        assert len(matches) == 3
        np.testing.assert_allclose(T_est, T, atol=1e-3)

    def test_optimize_alignment_averages_noise(self):
        T = rand_T(11)
        rng = np.random.default_rng(12)
        src, tgt = {}, {}
        for i in range(6):
            pose = np.eye(4)
            pose[:3, 3] = rng.uniform(-2, 2, 3)
            pose[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.5).as_matrix()
            src[i] = pose
            noise = np.eye(4)
            noise[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.01).as_matrix()
            noise[:3, 3] = rng.normal(size=3) * 0.01
            tgt[i] = noise @ T @ pose
        T_est = optimize_alignment(tgt, src, [(i, i) for i in range(6)])
        assert np.linalg.norm(T_est[:3, 3] - T[:3, 3]) < 0.02
        dR = Rotation.from_matrix(T_est[:3, :3].T @ T[:3, :3]).magnitude()
        assert dR < 0.02


class TestAnnotation:
    def test_plane_normal(self):
        rng = np.random.default_rng(3)
        pts = np.column_stack([rng.uniform(-1, 1, 500),
                               rng.uniform(-1, 1, 500),
                               rng.normal(0, 0.01, 500)])
        n = find_plane_normal(pts)
        assert abs(abs(n[2]) - 1.0) < 1e-3

    def test_yaw_enumeration_recovers_pose(self):
        """A yaw-rotated model must register despite ICP's local minima."""
        rng = np.random.default_rng(4)
        # asymmetric L-shaped cloud (so yaw is identifiable)
        a = rng.uniform([0, 0, 0], [1.0, 0.2, 0.5], (300, 3))
        b = rng.uniform([0, 0, 0], [0.2, 0.8, 0.5], (200, 3))
        model = np.concatenate([a, b]).astype(np.float32)
        yaw = 2.4
        R = Rotation.from_euler("z", yaw).as_matrix()
        scene = (model @ R.T + np.array([0.3, -0.2, 0.0])).astype(np.float32)

        T, res = register_model_to_scene(model, scene, num_yaw=24,
                                         max_distance=0.1, voxel=0.05)
        err = Rotation.from_matrix(T[:3, :3].T @ R).magnitude()
        assert err < 0.1, err
        assert res.fitness > 0.6


class TestEstimateNormals:
    def oracle(self, pts, k):
        """Dense numpy k-NN PCA normals (the pre-tiling implementation)."""
        d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        idx = np.argsort(d2, axis=1)[:, :k]
        normals = np.zeros_like(pts)
        for i in range(len(pts)):
            neigh = pts[idx[i]]
            mu = neigh.mean(axis=0)
            cov = (neigh - mu).T @ (neigh - mu)
            _, vecs = np.linalg.eigh(cov)
            normals[i] = vecs[:, 0]
        return normals

    def test_tiled_matches_dense_oracle(self):
        """chunk < N and N % chunk != 0: padding + tiling must not change
        the result vs a dense N^2 computation."""
        from visma_tpu.align.icp import _estimate_normals

        rng = np.random.default_rng(11)
        xy = rng.uniform(-1, 1, (301, 2))
        z = 0.2 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        pts = np.column_stack([xy, z]).astype(np.float32)
        got = np.asarray(_estimate_normals(
            jnp.asarray(pts), jnp.ones(len(pts), bool), k=12, chunk=128))
        want = self.oracle(pts, 12)
        dots = np.abs(np.sum(got * want, axis=1))
        assert np.mean(dots > 0.99) > 0.97, dots.min()

    def test_memory_bounded_at_scale(self):
        """Reference operating point scale check (downscaled 50k -> 20k but
        tiled identically): must run without materializing N^2."""
        from visma_tpu.align.icp import _estimate_normals

        rng = np.random.default_rng(12)
        pts = rng.uniform(-1, 1, (20000, 3)).astype(np.float32)
        n = _estimate_normals(jnp.asarray(pts), jnp.ones(len(pts), bool))
        n = np.asarray(n)
        assert n.shape == (20000, 3)
        assert np.all(np.isfinite(n))
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)
