"""Submap (keyframe-sharded) BA tests on the virtual 8-device mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from visma_tpu.align import umeyama
from visma_tpu.ba import ba_solve
from visma_tpu.ba.gauss_newton import total_cost
from visma_tpu.ba.problem import synthetic_ba_problem
from visma_tpu.dist import make_mesh
from visma_tpu.dist.submap_ba import split_into_chunks, submap_ba_solve


def sim3_ate(p_est, p_gt):
    T = np.asarray(umeyama(jnp.asarray(np.asarray(p_est, np.float32)),
                           jnp.asarray(np.asarray(p_gt, np.float32)),
                           with_scaling=True))
    p_al = np.asarray(p_est) @ T[:3, :3].T + T[:3, 3]
    return float(np.linalg.norm(p_al - p_gt, axis=1).max())


def test_split_covers_everything():
    prob, _ = synthetic_ba_problem(num_poses=16, num_landmarks=96, seed=1)
    chunks, info = split_into_chunks(prob, 4)
    # every pose owned by exactly one chunk interior
    owned = []
    for d in range(4):
        lo, hi = info["bounds"][d], info["bounds"][d + 1]
        owned.extend(range(lo, hi))
    assert sorted(owned) == list(range(16))
    # every landmark with >=2 obs in some chunk is OWNED exactly once
    # (duplication across chunks is allowed; landmarks whose observations
    # are spread 1-per-chunk are locally unconstrainable and stay unowned)
    li = info["land_idx"][info["land_owner"]]
    assert len(np.unique(li)) == len(li)
    mask_np = np.asarray(prob.mask)
    constrainable = set()
    for d in range(4):
        lo, hi = info["bounds"][d], min(info["bounds"][d + 1] + 1, 16)
        for l in range(96):
            if mask_np[l, lo:hi].sum() >= 2:
                constrainable.add(l)
    assert set(li.tolist()) == constrainable
    # chunk observation masks only reference in-chunk poses
    assert chunks.mask.shape[0] == 4


def test_submap_recovers_trajectory():
    prob, truth = synthetic_ba_problem(num_poses=16, num_landmarks=128,
                                       noise_px=0.5, pose_noise=0.03, seed=2)
    mesh = make_mesh(4)
    sol, info = submap_ba_solve(prob, mesh, iters=10)

    ate0 = sim3_ate(np.asarray(prob.p), truth["p"])
    ate = sim3_ate(np.asarray(sol.p), truth["p"])
    # 0.5px noise floor on this problem is ~3cm (global-12-iter reaches
    # 3.7cm; submap+polish 2.9cm — measured in test development)
    assert ate < 0.035, (ate0, ate)
    assert ate < ate0 * 0.5

    # global reprojection cost dropped
    assert float(total_cost(sol)) < 0.5 * float(total_cost(prob))


def test_submap_halo2_consensus():
    """Wider halo + landmark consensus: the two-frame boundary averaging
    stitches the 6-pose chunks well (halo-1 averages 0.058 sim3-ATE over
    seeds {2,3,4,7,11} on this problem family, halo-2 averages 0.040 —
    measured; individual seeds vary, so the test pins one)."""
    prob, truth = synthetic_ba_problem(num_poses=24, num_landmarks=128,
                                       noise_px=0.5, pose_noise=0.03, seed=4)
    mesh = make_mesh(4)
    sol2, info = submap_ba_solve(prob, mesh, iters=10, halo=2,
                                 consensus=True)
    assert info["halo"] == 2
    ate0 = sim3_ate(np.asarray(prob.p), truth["p"])
    ate2 = sim3_ate(np.asarray(sol2.p), truth["p"])
    assert ate2 < 0.35 * ate0, (ate2, ate0)
    assert float(total_cost(sol2)) < 0.5 * float(total_cost(prob))


def test_owner_writeback_still_works():
    prob, truth = synthetic_ba_problem(num_poses=16, num_landmarks=128,
                                       noise_px=0.5, pose_noise=0.03, seed=2)
    mesh = make_mesh(4)
    sol, _ = submap_ba_solve(prob, mesh, iters=10, consensus=False)
    ate0 = sim3_ate(np.asarray(prob.p), truth["p"])
    ate = sim3_ate(np.asarray(sol.p), truth["p"])
    assert ate < 0.5 * ate0


def test_submap_vs_global():
    """Submapping should get close to the global solve."""
    prob, truth = synthetic_ba_problem(num_poses=16, num_landmarks=128,
                                       noise_px=0.3, pose_noise=0.02, seed=3)
    mesh = make_mesh(4)
    sol_sub, _ = submap_ba_solve(prob, mesh, iters=10)
    sol_glb, _ = ba_solve(prob, iters=10)
    ate_sub = sim3_ate(np.asarray(sol_sub.p), truth["p"])
    ate_glb = sim3_ate(np.asarray(sol_glb.p), truth["p"])
    assert ate_sub < max(3.0 * ate_glb, 0.02), (ate_sub, ate_glb)
