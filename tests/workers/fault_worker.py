"""Checkpointing worker for the kill-and-recover fault drill.

Runs `total_steps` sharded-BA LM iterations one at a time over the virtual
device mesh, checkpointing the full BaProblem after EVERY step and
touching a heartbeat file. On (re)start it resumes from the latest
snapshot — so a SIGKILL at any point costs at most one step of recompute.

argv: workdir total_steps [step_sleep_s]
The parent test kills this process mid-run by exact PID, then the Watchdog
respawns it; the final state must equal an uninterrupted run's.
"""
import os
import sys


def main():
    workdir, total_steps = sys.argv[1], int(sys.argv[2])
    step_sleep = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")

    import time

    import numpy as np

    from visma_tpu.ba.problem import BaProblem, synthetic_ba_problem
    from visma_tpu.dist import make_mesh
    from visma_tpu.dist.multihost import Heartbeat
    from visma_tpu.dist.sharded_ba import sharded_ba_step
    from visma_tpu.utils.checkpoint import (latest_step, load_state,
                                            save_state)

    ckpt = os.path.join(workdir, "ckpt")
    hb = Heartbeat(os.path.join(workdir, "heartbeat"), interval_s=0.0)

    # deterministic problem: every (re)start rebuilds the same template
    prob, _ = synthetic_ba_problem(num_poses=8, num_landmarks=64,
                                   noise_px=0.5, pose_noise=0.02)
    start = 0
    try:
        resumed = latest_step(ckpt)
    except (FileNotFoundError, OSError):
        resumed = 0
    if resumed > 0:
        prob = load_state(ckpt, prob, step=resumed)
        start = resumed
        print(f"fault_worker: resumed from step {resumed}")

    mesh = make_mesh(4)
    for step in range(start, total_steps):
        prob, cost = sharded_ba_step(prob, mesh, damping=1e-3)
        prob = BaProblem(*[np.asarray(x) for x in
                           (prob.R, prob.p, prob.X, prob.obs, prob.mask,
                            prob.intr)])
        save_state(ckpt, prob, step=step + 1)
        hb.touch(step + 1)
        if step_sleep:
            time.sleep(step_sleep)

    np.savez(os.path.join(workdir, "final.npz"),
             p=np.asarray(prob.p), X=np.asarray(prob.X))
    print(f"fault_worker: done at step {total_steps}")


if __name__ == "__main__":
    main()
