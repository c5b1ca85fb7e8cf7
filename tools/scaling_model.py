"""Weak-scaling prediction: measured per-shard compute x modeled ICI.

The container has ONE v5e chip, so weak-scaling efficiency cannot be
measured end-to-end (virtual CPU devices share silicon and measure thread
contention — SCALING_r04's own note). What CAN be grounded in
measurement is the per-device compute time of one distributed-BA GN step
at the per-device shard size; what is modeled is only the collective,
whose payload is known exactly from the collectives the solvers issue
(bench_scaling.comm_floats_per_step) and whose cost on a v5e ICI ring is
a standard alpha-beta term. Predicted weak-scaling efficiency:

    eff(n) = t_compute / (t_compute + t_allreduce(n))
    t_allreduce(n) = 2*(n-1)*alpha + 2*P*(n-1)/n / W_ici

with alpha = per-hop latency, W_ici = per-direction link bandwidth, and
P the payload bytes (ring all-reduce: reduce-scatter + all-gather, each
(n-1) hops moving P/n per hop). PCG issues `cg_iters` DEPENDENT 6K-float
psums per GN step, so its latency term multiplies by cg_iters.

Writes one JSON with the measured compute points and the predicted
efficiency curves. Run on the real chip (default backend) for the
compute measurement; docs/SCALING_MODEL.md holds the derivation.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

# v5e public numbers (Google Cloud TPU v5e spec; "How to Scale Your
# Model" ch. 2): 1600 Gbps aggregate ICI per chip over 4 links ->
# ~50 GB/s per link per direction; per-hop latency ~1 us.
ICI_W_BYTES = 45e9          # conservative per-direction link bandwidth
ICI_ALPHA = 1e-6            # per-hop latency, s
DCN_W_BYTES = 25e9 / 8      # per-host DCN (v5e: 25 Gbps NICs x pooling);
DCN_ALPHA = 10e-6           # conservative cross-host latency


def allreduce_time(payload_bytes, n, alpha=ICI_ALPHA, W=ICI_W_BYTES,
                   rounds=1):
    """Ring all-reduce: reduce-scatter + all-gather = 2(n-1) hops, each
    moving payload/n. `rounds` = number of DEPENDENT all-reduces."""
    if n <= 1:
        return 0.0
    bw = 2.0 * payload_bytes * (n - 1) / n / W
    lat = 2.0 * (n - 1) * alpha
    return rounds * (lat + bw)


def measure_compute(poses, landmarks_per_device, cg_iters, submap_iters,
                    reps=10, amort=8):
    """Per-device GN-step compute time (s) for each solver at the
    per-device shard size, on THIS backend's single device (mesh size 1:
    collectives are self-copies, so this isolates compute).

    AMORTIZED: a single dispatch+sync includes the ~25-30 ms relay RTT
    (CLAUDE.md), which would swamp millisecond-scale steps and overstate
    the predicted efficiency. Each solver runs 1x and `amort`x chained
    in-dispatch; t_step = (t_amort - t_1) / (amort - 1)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from visma_tpu.ba.problem import synthetic_ba_problem
    from visma_tpu.dist import make_mesh
    from visma_tpu.dist.pcg_ba import _pcg_step
    from visma_tpu.dist.sharded_ba import _jitted_step, _shard_problem
    from visma_tpu.dist.submap_ba import _jitted_local_solver, \
        split_into_chunks

    mesh = make_mesh(1)
    out = {}
    prob, _ = synthetic_ba_problem(num_poses=poses,
                                   num_landmarks=landmarks_per_device,
                                   noise_px=0.5, pose_noise=0.02)
    padded, _ = _shard_problem(prob, mesh)
    lam = jnp.asarray(1e-3, jnp.float32)

    def best_of(fn, *args):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # warm
        best = float("inf")
        for _ in range(reps):
            t = time.time()
            np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
            best = min(best, time.time() - t)
        return best

    for name, step in (("dense", _jitted_step(mesh)),
                       ("pcg", jax.jit(_pcg_step(mesh, cg_iters)))):
        @functools.partial(jax.jit, static_argnames=("k",))
        def multi(p, lam, k):
            return jax.lax.fori_loop(
                0, k, lambda i, pr: step(pr, lam)[0], p)

        t1 = best_of(lambda: multi(padded, lam, 1))
        tN = best_of(lambda: multi(padded, lam, amort))
        out[name] = max((tN - t1) / (amort - 1), 1e-6)

    chunks, _ = split_into_chunks(prob, 1, halo=2)
    solver = _jitted_local_solver(mesh, submap_iters)

    @functools.partial(jax.jit, static_argnames=("k",))
    def multi_s(c, k):
        return jax.lax.fori_loop(0, k, lambda i, cc: solver(cc), c)

    t1 = best_of(lambda: multi_s(chunks, 1))
    tN = best_of(lambda: multi_s(chunks, amort))
    # submap comm happens once per SOLVE (submap_iters GN steps): report
    # per-GN-step compute for comparability
    out["submap"] = max((tN - t1) / (amort - 1), 1e-6) / submap_iters
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=16)
    ap.add_argument("--landmarks-per-device", type=int, default=512)
    ap.add_argument("--cg-iters", type=int, default=25)
    ap.add_argument("--submap-iters", type=int, default=4)
    ap.add_argument("--hosts", type=int, nargs="+",
                    default=[2, 4, 8, 16, 32, 64])
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import jax

    from bench_scaling import comm_floats_per_step

    backend = jax.default_backend()
    print(f"backend: {backend}", file=sys.stderr)
    comp = measure_compute(args.poses, args.landmarks_per_device,
                           args.cg_iters, args.submap_iters)

    curves = {}
    for solver, t_c in comp.items():
        pts = []
        for n in args.hosts:
            P = comm_floats_per_step(
                solver, args.poses * n if solver == "submap"
                else args.poses, n, args.cg_iters,
                args.landmarks_per_device) * 4
            if solver == "pcg":
                # cg_iters dependent 96-float psums + 2 setup psums
                t_ar = allreduce_time(6 * args.poses * 4, n,
                                      rounds=args.cg_iters + 2)
            elif solver == "submap":
                # one stitch all-gather per solve, amortized over the
                # local GN steps
                t_ar = allreduce_time(P, n) / args.submap_iters
            else:
                t_ar = allreduce_time(P, n)
            eff = t_c / (t_c + t_ar)
            pts.append({"hosts": n, "payload_bytes": int(P),
                        "t_allreduce_us": round(t_ar * 1e6, 2),
                        "efficiency": round(eff, 4)})
        curves[solver] = {
            "t_compute_ms": round(t_c * 1e3, 3),
            "compute_backend": backend,
            "points": pts,
        }
        print(json.dumps({"solver": solver, **curves[solver]}), flush=True)

    result = {
        "model": "eff(n) = t_compute / (t_compute + t_allreduce(n)); "
                 "ring all-reduce 2(n-1) hops",
        "assumptions": {"ici_link_bw_bytes": ICI_W_BYTES,
                        "ici_alpha_s": ICI_ALPHA},
        "operating_point": {"poses": args.poses,
                            "landmarks_per_device":
                                args.landmarks_per_device,
                            "cg_iters": args.cg_iters,
                            "submap_iters": args.submap_iters},
        "curves": curves,
    }
    if args.output:
        with open(args.output, "w") as fp:
            json.dump(result, fp, indent=1)
        print(f"wrote {args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
