"""Visualize a sequence: camera trajectory + INSTATE point cloud +
optional result.json objects (reference parity: VisualizeResult,
src/visualization.cpp:226-313 — Open3D window replaced by a saved
matplotlib figure, suited to headless TPU hosts)."""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataroot")
    ap.add_argument("--result-index", type=int, default=-1,
                    help="which result.json packet to overlay (default last)")
    ap.add_argument("--cad-root", default=None)
    ap.add_argument("--output", default="scene.png")
    ap.add_argument("--model-samples", type=int, default=2000)
    args = ap.parse_args(argv)

    from visma_tpu.utils.platform import configure_platform

    configure_platform()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from visma_tpu.io import VlslamDatasetLoader
    from visma_tpu.proto import FeatureStatus

    loader = VlslamDatasetLoader(args.dataroot)
    traj = np.stack([loader.pose(i)[:, 3] for i in range(len(loader))])

    # INSTATE/GOODDROP world points over the sequence
    pts = {}
    for i in range(len(loader)):
        for f in loader.dataset.packets[i].features:
            if f.status in (FeatureStatus.INSTATE, FeatureStatus.GOODDROP) \
                    and len(f.xw) >= 3:
                pts[f.id] = f.xw[:3]
    cloud = np.asarray(list(pts.values())) if pts else np.zeros((0, 3))

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")
    ax.plot(traj[:, 0], traj[:, 1], traj[:, 2], "b-", lw=2,
            label=f"trajectory ({len(traj)} frames)")
    ax.scatter(traj[0, 0], traj[0, 1], traj[0, 2], c="g", s=60,
               label="start")
    if len(cloud):
        ax.scatter(cloud[:, 0], cloud[:, 1], cloud[:, 2], s=2, c="gray",
                   alpha=0.5, label=f"{len(cloud)} map points")

    result_path = os.path.join(args.dataroot, "result.json")
    if args.cad_root and os.path.exists(result_path):
        from visma_tpu.eval import sample_mesh
        from visma_tpu.io import load_json, load_mesh
        from visma_tpu.io.json_io import matrix_from_json

        packet = load_json(result_path)[args.result_index]
        for obj in packet:
            pose34 = matrix_from_json(obj, "model_pose", 3, 4)
            V, F = load_mesh(os.path.join(args.cad_root,
                                          obj["model_name"] + ".obj"))
            s = sample_mesh(V, F, args.model_samples)
            s = s @ pose34[:, :3].T + pose34[:, 3]
            ax.scatter(s[:, 0], s[:, 1], s[:, 2], s=1,
                       label=f"{obj['model_name']}#{obj['id']}")

    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    ax.legend(loc="upper left", fontsize=8)
    plt.tight_layout()
    plt.savefig(args.output, dpi=110)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
