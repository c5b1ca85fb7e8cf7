"""Diagnose the semantic bench: per-object error decomposition (along-ray
vs lateral), settled steady-state window timings, and pure-dispatch device
cost. Replicates bench.py::bench_semantic's scene exactly, with knobs.

Usage: python tools/diag_semantic.py [--frames 27] [--roi 256 256]
       [--iters 3] [--samples 24] [--window 8]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=27)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--window", type=int, default=8,
                    help="settled measurement window (frames per rep)")
    ap.add_argument("--roi", type=int, nargs=2, default=[256, 256])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--samples", type=int, default=24)
    ap.add_argument("--sigma", type=float, nargs=2, default=[0.05, 0.03])
    ap.add_argument("--async-frames", type=int, default=16)
    ap.add_argument("--radius", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy.spatial.transform import Rotation

    from visma_tpu.image.edges import depth_edge
    from visma_tpu.io.procedural import bench_mesh_db
    from visma_tpu.render import Intrinsics
    from visma_tpu.semantic import SemanticMapper
    from visma_tpu.semantic.mapper import ObjectTrack

    print("backend:", jax.default_backend(), file=sys.stderr)
    intr = Intrinsics(fx=486.405, fy=535.401, cx=469.199, cy=257.916,
                      rows=500, cols=960, z_near=0.05, z_far=8.0)
    db = bench_mesh_db()
    names = ["chair", "desk", "chair", "desk"]
    rng = np.random.default_rng(3)
    slots = [(-1.5, 2.75), (-0.65, 3.1), (0.65, 3.1), (1.5, 2.75)]
    T_gt = []
    for k in range(4):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_euler("y", rng.uniform(-0.6, 0.6)
                                        ).as_matrix()
        x, z = slots[k]
        T[:3, 3] = [x, rng.uniform(-0.1, 0.1), z]
        T_gt.append(T)

    mapper = SemanticMapper(intr, db, cem_iters=5, cem_samples=48,
                            roi=tuple(args.roi), settle_age=2,
                            settled_iters=args.iters,
                            settled_samples=args.samples,
                            settled_sigma=tuple(args.sigma),
                            async_frames=args.async_frames,
                            coverage_radius=args.radius)
    mesh_idx = np.array([mapper.mrenderer.index(n) for n in names],
                       np.int32)

    def gwc_at(i):
        return np.hstack([np.eye(3),
                          np.array([[0.015 * i], [0.0], [0.0]])])

    n_frames = args.frames
    t0 = time.time()
    all_poses = np.empty((n_frames, 4, 3, 4), np.float32)
    for i in range(n_frames):
        G = np.eye(4)
        G[:3, :4] = gwc_at(i)
        G_cw = np.linalg.inv(G)
        all_poses[i] = np.stack([(G_cw @ T)[:3, :4] for T in T_gt])
    mi = jnp.broadcast_to(jnp.asarray(mesh_idx), (n_frames, 4))
    d = mapper.mrenderer.render_depth(jnp.asarray(all_poses), mi)
    edge_frames = jax.vmap(lambda di: depth_edge(jnp.min(di, axis=0)))(d)
    jax.block_until_ready(edge_frames)
    print(f"GT edges: {time.time()-t0:.1f}s", file=sys.stderr)

    for k in range(4):
        T0 = T_gt[k].copy()
        T0[:3, 3] += rng.uniform(-0.08, 0.08, 3)
        T0[:3, :3] = T0[:3, :3] @ Rotation.from_euler(
            "y", rng.uniform(-0.12, 0.12)).as_matrix()
        mapper.tracks[k] = ObjectTrack(oid=k, model_name=names[k],
                                       pose_wm=T0)
    mapper._next_id = 4

    t0 = time.time()
    for i in range(args.warmup):
        mapper.step(gwc_at(i), edge_frames[i])
    print(f"warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    # settled steady state measured in windows of `window` frames, each
    # drained (finalize) so the timing is honest
    W = args.window
    i = args.warmup
    win_times = []
    while i + W <= n_frames:
        t0 = time.time()
        for j in range(i, i + W):
            mapper.step(gwc_at(j), edge_frames[j])
        mapper._sync_dev()
        win_times.append(time.time() - t0)
        i += W
    per_frame = [t / W * 1e3 for t in win_times]
    print(f"window ms/frame: {[round(x,1) for x in per_frame]} "
          f"(best {min(per_frame):.1f} -> {1e3/min(per_frame):.2f} fps)",
          file=sys.stderr)

    mapper.finalize()
    # error decomposition
    for k in range(4):
        T = mapper.tracks[k].pose_wm
        dt_w = T[:3, 3] - T_gt[k][:3, 3]
        # view ray at last frame
        G = np.eye(4)
        G[:3, :4] = gwc_at(i - 1)
        c_c = np.linalg.inv(G)[:3, :3] @ T_gt[k][:3, 3] \
            + np.linalg.inv(G)[:3, 3]
        ray_w = G[:3, :3] @ (c_c / np.linalg.norm(c_c))
        along = float(np.dot(dt_w, ray_w))
        lat = float(np.linalg.norm(dt_w - along * ray_w))
        rot = float(np.degrees(Rotation.from_matrix(
            T[:3, :3] @ T_gt[k][:3, :3].T).magnitude()))
        print(f"obj{k} {names[k]:5s} |t|={np.linalg.norm(dt_w):.4f} m "
              f"along-ray={along:+.4f} lateral={lat:.4f} rot={rot:.2f} deg",
              file=sys.stderr)


if __name__ == "__main__":
    main()
