"""FULL-SYSTEM integration: the reference's complete workflow on one
synthetic scene, crossing every seam through the real wire formats.

    images + IMU
      --(run_vio --images: pyramid/KLT/detect/MSCKF)-->
    ESTIMATED-trajectory vlslam dataset (real drift, not GT)
      + .edge / .bbox side files + a CAD .obj database
      --(run_semantic: spawn/retrieval + fused joint CEM)-->
    result.json object poses (evaluation.cpp:163-198 layout),
    gated against the scene's ground-truth object pose.

This is the chain the reference repo documents as its usage workflow
(README.md:99-123): a VIO front produces dataset gwc (dataloader.cpp),
the semantic mapper consumes it with per-frame edge maps + detections,
and evaluation ingests result.json. Every artifact here passes through
the on-disk formats — nothing is handed over in memory.
"""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from visma_tpu.image.edges import depth_edge
from visma_tpu.io.mesh import save_obj
from visma_tpu.io.synthetic import SyntheticConfig, make_dataset, make_imu
from visma_tpu.io.synthetic_images import render_adversarial_frames
from visma_tpu.proto import BoundingBox, BoundingBoxList, EdgeMap
from visma_tpu.render import Intrinsics, Renderer


def _stamp(ts: float) -> str:
    """VISMA-style microsecond filename stamp (loader sorts by these)."""
    return f"{1520535100000000 + int(round(ts * 1e6)):d}"


def test_images_to_result_json(tmp_path, capsys):
    cv2 = pytest.importorskip("cv2")

    from visma_tpu.cli import run_semantic, run_vio
    from visma_tpu.cli.run_semantic import _demo_meshes

    cfg = SyntheticConfig(num_frames=24, rows=120, cols=160,
                          fx=150.0, fy=150.0, cx=79.5, cy=59.5,
                          num_landmarks=150, seed=5)
    # adversarial imagery (sensor noise, textured background, photometric
    # drift, one occluder sweep): the VIO feeding the semantic stage has
    # honest error, not an idealized zero-drift trajectory
    frames, gwc, _ = render_adversarial_frames(cfg, occluders=1)
    ts = np.arange(cfg.num_frames) / cfg.fps

    # ---- plant a CAD object in the world: the asymmetric L-mesh near the
    # scene center, facing the frame-0 camera (the pose regime the bbox
    # depth-prior spawn covers; wilder orientations go through the
    # retrieval yaw sweep, tested in test_semantic.py)
    db = _demo_meshes()
    V, F = db["lchair"]
    intr = Intrinsics(fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy,
                      rows=cfg.rows, cols=cfg.cols, z_near=0.05,
                      z_far=10.0)
    rend = Renderer(intr, capacity=96)
    rend.set_mesh(V, F)
    T_wm = np.eye(4)
    T_wm[:3, :3] = gwc[0][:, :3]
    T_wm[:3, 3] = [0.0, 0.0, 0.3]  # near the orbit's look-target

    dataroot = tmp_path / "seq"
    dataroot.mkdir()
    edges_by_frame = []
    for i in range(cfg.num_frames):
        G = np.eye(4)
        G[:3, :4] = gwc[i]
        pose_cm = (np.linalg.inv(G) @ T_wm)[:3, :4].astype(np.float32)
        d = rend.render_depth(jnp.asarray(pose_cm))
        mask = np.isfinite(np.asarray(d))
        assert mask.any(), f"object out of view at frame {i}"
        img = frames[i].copy()
        img[mask] = 210.0  # matte silhouette: occludes blobs behind it
        cv2.imwrite(str(dataroot / (_stamp(ts[i]) + ".png")),
                    np.clip(img, 0, 255).astype(np.uint8))
        edges_by_frame.append(np.asarray(depth_edge(d), np.float32))

    ds = make_dataset(cfg)
    (dataroot / "dataset").write_bytes(ds.encode())
    imu = make_imu(cfg)
    np.savez(tmp_path / "imu.npz", ts=imu["ts"], gyro=imu["gyro"],
             accel=imu["accel"], v0=imu["v0"])

    # ---- stage 1: images + IMU -> VIO -> estimated-trajectory dataset
    est = tmp_path / "est"
    run_vio.main(["--dataroot", str(dataroot),
                  "--imu", str(tmp_path / "imu.npz"),
                  "--images", "--output", str(est)])
    out_lines = [ln for ln in capsys.readouterr().out.strip().splitlines()
                 if ln.startswith("{")]
    report = json.loads(out_lines[0])
    assert report["ate_rmse_m"] < 0.05, report  # the fed dataset is REAL VIO

    # ---- stage 2: side files for the semantic pass, NEXT TO the
    # ESTIMATED dataset (packets cover frames 1..N-1; the loader pairs
    # side files to packets by sorted index)
    from visma_tpu.io import VlslamDatasetLoader

    for i in range(1, cfg.num_frames):
        e = edges_by_frame[i]
        em = EdgeMap(rows=e.shape[0], cols=e.shape[1], data=e.ravel())
        (est / (_stamp(ts[i]) + ".edge")).write_bytes(em.encode())

    # detector output at the first semantic frame: bbox of the TRUE
    # projected object center, shape id from the (tested) retrieval stage
    G1 = np.eye(4)
    G1[:3, :4] = gwc[1]
    c_c = (np.linalg.inv(G1) @ T_wm)[:3, 3]
    u = cfg.fx * c_c[0] / c_c[2] + cfg.cx
    v = cfg.fy * c_c[1] / c_c[2] + cfg.cy
    assert 20 < u < cfg.cols - 20 and 20 < v < cfg.rows - 20
    # detector imprecision: bbox center a few px off, like a real detector
    u, v = u + 4.0, v - 3.0
    bl = BoundingBoxList(bounding_boxes=[BoundingBox(
        top_left_x=float(u - 24), top_left_y=float(v - 24),
        bottom_right_x=float(u + 24), bottom_right_y=float(v + 24),
        scores=np.array([0.9], np.float32), class_name="chair",
        shape_id="lchair")])
    (est / (_stamp(ts[1]) + ".bbox")).write_bytes(bl.encode())

    models = tmp_path / "models"
    models.mkdir()
    for name, (Vm, Fm) in db.items():
        save_obj(str(models / f"{name}.obj"), Vm, Fm)

    # ---- stage 3: semantic mapping over the ESTIMATED trajectory
    result = tmp_path / "result.json"
    run_semantic.main(["--dataroot", str(est), "--models", str(models),
                       "--output", str(result),
                       "--depth-prior", f"{float(c_c[2]) * 1.06:.3f}",
                       "--cem-iters", "4", "--cem-samples", "32"])
    sem_report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sem_report["tracks"] == 1, sem_report

    # ---- stage 4: result.json carries the reference layout and the
    # recovered model->world pose matches the planted ground truth
    packets = json.loads(result.read_text())
    assert len(packets) == cfg.num_frames - 1
    objs = packets[-1]
    assert len(objs) == 1 and objs[0]["model_name"] == "lchair"
    pose = np.asarray(objs[0]["model_pose"], np.float64).reshape(3, 4)

    t_err = float(np.linalg.norm(pose[:, 3] - T_wm[:3, 3]))
    cosang = (np.trace(pose[:, :3] @ T_wm[:3, :3].T) - 1.0) / 2.0
    r_err = float(np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0))))
    assert t_err < 0.08, (t_err, r_err)
    assert r_err < 8.0, (t_err, r_err)

    # the estimated dataset itself must remain loader-consumable with the
    # side files attached (reference Grab semantics, dataloader.cpp:92-134)
    loader = VlslamDatasetLoader(str(est))
    fr = loader.grab(0, load_image=False)
    assert fr.edgemap is not None and fr.bboxlist is not None
    assert fr.edgemap.shape == (cfg.rows, cfg.cols)
