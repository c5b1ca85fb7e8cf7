"""Weak-scaling harness for distributed BA (SURVEY §7 P5 deliverable).

Measures the landmark-sharded BA step at growing mesh sizes with
proportionally growing landmark counts (constant work per device) and
reports weak-scaling efficiency. Run on a pod slice for real numbers; on
this single-chip/CPU environment it validates the harness and the
communication structure (set VISMA_TPU_PLATFORM=cpu XLA_FLAGS=...=8 to use
8 virtual devices).

Prints one JSON line per mesh size plus a summary.
"""
import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, nargs="+", default=None,
                    help="mesh sizes to test (default: 1,2,4,...,ndev)")
    ap.add_argument("--landmarks-per-device", type=int, default=512)
    ap.add_argument("--poses", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--solvers", nargs="+", default=["dense", "pcg"],
                    help="which distributed step to measure: dense psums "
                         "the (6K)^2 reduced system; pcg is the matrix-"
                         "free O(6K)-comm path (dist/pcg_ba.py)")
    ap.add_argument("--cg-iters", type=int, default=25)
    args = ap.parse_args()

    from visma_tpu.utils.platform import configure_platform

    configure_platform()

    import jax
    import numpy as np

    from visma_tpu.ba.problem import synthetic_ba_problem
    from visma_tpu.dist import make_mesh
    from visma_tpu.dist.sharded_ba import _jitted_step, _shard_problem
    from visma_tpu.utils.logging import MetricsWriter

    from visma_tpu.dist.pcg_ba import _pcg_step

    ndev = jax.device_count()
    sizes = args.devices or [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    mw = MetricsWriter()

    import functools

    import jax.numpy as jnp

    for solver in args.solvers:
        results = []
        for n in sizes:
            prob, _ = synthetic_ba_problem(
                num_poses=args.poses,
                num_landmarks=args.landmarks_per_device * n,
                noise_px=0.5, pose_noise=0.02)
            mesh = make_mesh(n)
            padded, L = _shard_problem(prob, mesh)
            if solver == "dense":
                step = _jitted_step(mesh)  # cached executable
            else:
                step = jax.jit(_pcg_step(mesh, args.cg_iters))

            lam = jnp.asarray(1e-3, jnp.float32)
            out = step(padded, lam)
            np.asarray(out[1])  # materialize
            t = time.time()
            for _ in range(args.reps):
                np.asarray(step(padded, lam)[1])
            dt = (time.time() - t) / args.reps
            results.append((n, dt))
            print(json.dumps({"solver": solver, "devices": n,
                              "landmarks": L,
                              "step_ms": round(dt * 1e3, 2)}))

        if len(results) > 1:
            t1 = results[0][1]
            for n, tn in results[1:]:
                eff = mw.scaling_efficiency(t_base=t1, t_scaled=tn,
                                            n_base=results[0][0], n_scaled=n)
            summary = {"metric": f"ba_weak_scaling_efficiency_{solver}",
                       "value": round(float(t1 / results[-1][1]), 4),
                       "devices": results[-1][0]}
            if jax.default_backend() == "cpu":
                # virtual CPU devices share one physical CPU: growing total
                # work with fixed silicon measures thread contention, not
                # ICI. Real weak-scaling numbers require a pod slice; the
                # dense psum payload is (6K)^2 floats per step, the pcg
                # payload 6K floats per CG iteration.
                summary["note"] = ("virtual-device run: harness validation "
                                   "only, not an ICI measurement")
            print(json.dumps(summary))


if __name__ == "__main__":
    main()
