"""Detection-driven spawn robustness sweep: N random 4-object scenes,
spawn from synthetic detections (retrieval + azimuth prior +
depth-from-height), settle, report per-scene retrieval accuracy and
final pose errors.

The bench measures ONE scene (seed 3); this sweep shows the spawn path's
behavior over randomized object placements, yaws, and mesh assignments at
the same 500x960 geometry. Writes a markdown table (--output).
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))


def run_scene(seed, n_frames=12):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy.spatial.transform import Rotation

    from visma_tpu.image.edges import depth_edge
    from visma_tpu.io.procedural import bench_mesh_db
    from visma_tpu.proto import BoundingBox, BoundingBoxList
    from visma_tpu.render import Intrinsics
    from visma_tpu.semantic import SemanticMapper

    intr = Intrinsics(fx=486.405, fy=535.401, cx=469.199, cy=257.916,
                      rows=500, cols=960, z_near=0.05, z_far=8.0)
    db = bench_mesh_db()
    rng = np.random.default_rng(seed)
    names = [("chair", "desk")[rng.integers(2)] for _ in range(4)]
    # randomized slots: x spread with jitter, alternating-ish depth
    xs = np.sort(rng.uniform(-1.7, 1.7, 4))
    T_gt, yaw_gt = [], []
    for k in range(4):
        yaw = rng.uniform(-0.7, 0.7)
        T = np.eye(4)
        T[:3, :3] = Rotation.from_euler("y", yaw).as_matrix()
        T[:3, 3] = [xs[k], rng.uniform(-0.12, 0.12),
                    rng.uniform(2.6, 3.3)]
        T_gt.append(T)
        yaw_gt.append(yaw)

    mapper = SemanticMapper(intr, db, cem_iters=5, cem_samples=48,
                            retrieval_yaws=24, roi=(256, 384),
                            settle_age=2, settled_iters=3,
                            settled_samples=24,
                            settled_sigma=(0.05, 0.03),
                            async_frames=16, roi_spawn=True)
    mi = np.array([mapper.mrenderer.index(n) for n in names], np.int32)

    def gwc_at(i):
        return np.hstack([np.eye(3),
                          np.array([[0.015 * i], [0.0], [0.0]])])

    all_poses = np.empty((n_frames, 4, 3, 4), np.float32)
    for i in range(n_frames):
        G = np.eye(4)
        G[:3, :4] = gwc_at(i)
        G_cw = np.linalg.inv(G)
        all_poses[i] = np.stack([(G_cw @ T)[:3, :4] for T in T_gt])
    d = mapper.mrenderer.render_depth(
        jnp.asarray(all_poses),
        jnp.broadcast_to(jnp.asarray(mi), (n_frames, 4)))
    edge_frames = jax.vmap(lambda di: depth_edge(jnp.min(di, axis=0)))(d)
    jax.block_until_ready(edge_frames)

    boxes = []
    for k in range(4):
        lo, hi = mapper._mesh_aabb[names[k]]
        corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                            for y in (lo[1], hi[1])
                            for z in (lo[2], hi[2])])
        pc = corners @ all_poses[0, k, :3, :3].T + all_poses[0, k, :3, 3]
        u = np.clip(intr.fx * pc[:, 0] / pc[:, 2] + intr.cx, 0, 959)
        v = np.clip(intr.fy * pc[:, 1] / pc[:, 2] + intr.cy, 0, 499)
        nb = 12
        tb = int(round(yaw_gt[k] / (2 * np.pi) * nb)) % nb
        ap = np.full(nb, 0.02)
        ap[tb] = 0.5
        ap[(tb + 1) % nb] = ap[(tb - 1) % nb] = 0.15
        boxes.append(BoundingBox(
            top_left_x=float(u.min()), top_left_y=float(v.min()),
            bottom_right_x=float(u.max()), bottom_right_y=float(v.max()),
            scores=np.array([0.9], np.float32), class_name="furniture",
            azimuth_prob=ap.astype(np.float32)))

    t0 = time.time()
    for i in range(n_frames):
        mapper.step(gwc_at(i), edge_frames[i],
                    bboxes=BoundingBoxList(bounding_boxes=boxes)
                    if i == 0 else None)
    mapper.finalize()
    wall = time.time() - t0

    # match each track to its NEAREST GT object (close detections can
    # dedup-merge, so track k need not correspond to object k)
    got, terr, rerr, matched = [], [], [], set()
    for oid in sorted(mapper.tracks):
        tr = mapper.tracks[oid]
        T = tr.pose_wm
        dists = [np.linalg.norm(T[:3, 3] - T_gt[k][:3, 3])
                 for k in range(4)]
        k = int(np.argmin(dists))
        matched.add(k)
        got.append((k, tr.model_name))
        terr.append(float(dists[k]))
        rerr.append(float(np.degrees(Rotation.from_matrix(
            T[:3, :3] @ T_gt[k][:3, :3].T).magnitude())))
    retrieval_ok = all(nm == names[k] for k, nm in got)
    return {"seed": seed, "names": names,
            "retrieved": [nm for _, nm in got],
            "retrieval_ok": retrieval_ok,
            "n_tracks": len(mapper.tracks),
            "gt_covered": len(matched),
            "trans": terr, "rot": rerr, "wall_s": round(wall, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--output", default="docs/SPAWN_SWEEP.md")
    args = ap.parse_args()

    rows = []
    for s in range(args.scenes):
        r = run_scene(100 + s, args.frames)
        rows.append(r)
        print(f"seed {r['seed']}: retrieval_ok={r['retrieval_ok']} "
              f"tracks={r['n_tracks']} gt_covered={r['gt_covered']} "
              f"trans={[round(x, 3) for x in r['trans']]} "
              f"rot={[round(x, 1) for x in r['rot']]} "
              f"({r['wall_s']}s)", file=sys.stderr, flush=True)

    import numpy as np

    ok = sum(r["retrieval_ok"] for r in rows)
    all_t = [x for r in rows for x in r["trans"]]
    all_r = [x for r in rows for x in r["rot"]]
    settled = sum(1 for r in rows if max(r["trans"]) < 0.075)
    lines = [
        "# Detection-driven spawn robustness sweep",
        "",
        f"{args.scenes} random 4-object scenes at 500x960 (seeds 100+; "
        "randomized slots, depths 2.6-3.3 m, yaws +-0.7 rad, mesh "
        "assignment), detections with class names matching no CAD model "
        "(full retrieval path: azimuth prior + depth-from-bbox-height), "
        f"{args.frames} frames each with the bench schedule "
        "(ROI 256x384, spawn 5x48 -> settled 3x24). Generated by "
        "tools/spawn_sweep.py on the real chip.",
        "",
        f"- retrieval picked the right mesh for all 4 objects in "
        f"**{ok}/{args.scenes} scenes**",
        f"- all objects within the 0.075 m reference ICP radius in "
        f"**{settled}/{args.scenes} scenes** after {args.frames} frames",
        f"- pooled trans err: mean {np.mean(all_t):.3f} m, "
        f"median {np.median(all_t):.3f}, max {np.max(all_t):.3f}",
        f"- pooled rot err: mean {np.mean(all_r):.2f} deg, "
        f"median {np.median(all_r):.2f}, max {np.max(all_r):.2f}",
        "",
        "| seed | meshes | retrieval ok | tracks/GT covered "
        "| trans err (m) | rot err (deg) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['seed']} | {'/'.join(n[0] for n in r['names'])} "
            f"| {'yes' if r['retrieval_ok'] else 'NO'} "
            f"| {r['n_tracks']}/{r['gt_covered']} "
            f"| {', '.join(f'{x:.3f}' for x in r['trans'])} "
            f"| {', '.join(f'{x:.1f}' for x in r['rot'])} |")
    with open(args.output, "w") as fp:
        fp.write("\n".join(lines) + "\n")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
