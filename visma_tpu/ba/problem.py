"""BA problem container: fixed-shape masked observation tables."""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class BaProblem:
    """Poses: world<-camera (R (K,3,3), p (K,3)); landmarks X (L,3);
    observations obs (L,K,2) pixels with mask (L,K); intrinsics (fx,fy,cx,cy)
    as a (4,) array. Pose 0 is gauge-fixed."""

    R: jnp.ndarray
    p: jnp.ndarray
    X: jnp.ndarray
    obs: jnp.ndarray
    mask: jnp.ndarray
    intr: jnp.ndarray

    def tree_flatten(self):
        return (self.R, self.p, self.X, self.obs, self.mask, self.intr), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_poses(self):
        return self.R.shape[0]

    @property
    def num_landmarks(self):
        return self.X.shape[0]


def make_problem(R, p, X, obs, mask, fx, fy, cx, cy) -> BaProblem:
    return BaProblem(
        R=jnp.asarray(R, jnp.float32), p=jnp.asarray(p, jnp.float32),
        X=jnp.asarray(X, jnp.float32), obs=jnp.asarray(obs, jnp.float32),
        mask=jnp.asarray(mask, bool),
        intr=jnp.asarray([fx, fy, cx, cy], jnp.float32))


def synthetic_ba_problem(num_poses=8, num_landmarks=64, noise_px=1.0,
                         pose_noise=0.02, seed=0):
    """Perturbed synthetic problem + ground truth for tests/benches."""
    from visma_tpu.io.synthetic import SyntheticConfig, make_landmarks, \
        make_trajectory, project

    cfg = SyntheticConfig(num_frames=num_poses, num_landmarks=num_landmarks,
                          seed=seed)
    _, gwc = make_trajectory(cfg)
    X = make_landmarks(cfg)
    rng = np.random.default_rng(seed + 1)

    obs = np.zeros((num_landmarks, num_poses, 2), np.float32)
    mask = np.zeros((num_landmarks, num_poses), bool)
    for k in range(num_poses):
        xp, _, valid = project(gwc[k], X, cfg)
        obs[:, k] = xp + noise_px * rng.standard_normal((num_landmarks, 2))
        mask[:, k] = valid

    R_noisy = gwc[:, :, :3].copy()
    p_noisy = gwc[:, :, 3].copy()
    from scipy.spatial.transform import Rotation

    for k in range(1, num_poses):  # pose 0 = gauge
        R_noisy[k] = R_noisy[k] @ Rotation.from_rotvec(
            rng.normal(scale=pose_noise, size=3)).as_matrix()
        p_noisy[k] += rng.normal(scale=pose_noise, size=3)
    X_noisy = X + rng.normal(scale=pose_noise, size=X.shape)

    prob = make_problem(R_noisy, p_noisy, X_noisy, obs, mask,
                        cfg.fx, cfg.fy, cfg.cx, cfg.cy)
    truth = {"R": gwc[:, :, :3], "p": gwc[:, :, 3], "X": X}
    return prob, truth
