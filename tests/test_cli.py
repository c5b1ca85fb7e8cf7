"""In-process CLI smoke tests (mains called with argv; CPU via conftest)."""
import json
import os
import pathlib

import numpy as np
import pytest

from visma_tpu.io.synthetic import SyntheticConfig, write_sequence


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliseq")
    write_sequence(str(root), SyntheticConfig(num_frames=6, num_landmarks=40),
                   write_images=True)
    return str(root)


def test_example_load(seq, capsys, tmp_path):
    from visma_tpu.cli.example_load import main

    main([seq, "--max-frames", "2", "--save-vis", str(tmp_path / "vis")])
    out = capsys.readouterr().out
    assert "sequence: 6 frames" in out and "gwc=" in out
    assert os.path.exists(tmp_path / "vis" / "000000.jpg")


def test_example_dump(seq, tmp_path):
    from visma_tpu.cli.example_dump import main

    out = str(tmp_path / "dump")
    main([seq, out])
    K = np.loadtxt(os.path.join(out, "K.txt"))
    assert K.shape == (3, 3) and K[0, 0] == 400
    G = np.loadtxt(os.path.join(out, "pose", "000003.txt"))
    assert G.shape == (4, 4)
    assert os.path.getsize(os.path.join(out, "depth", "000003.txt")) > 0


def test_render_depth(tmp_path):
    from visma_tpu.cli.render_depth import main
    from visma_tpu.io import load_mat, save_obj

    V = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    save_obj(str(tmp_path / "quad.obj"), V, F)
    cfg = {"image_height": 48, "image_width": 64, "fx": 40, "fy": 40,
           "cx": 32, "cy": 24, "z_far": 10, "mesh": str(tmp_path / "quad.obj"),
           "translation": [0, 0, 2], "save": True,
           "output_path": str(tmp_path), "mask": True}
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))
    main([str(tmp_path / "cfg.json")])
    d = load_mat(str(tmp_path / "depthmap.bin"))
    assert d.shape == (48, 64)
    assert abs(d[24, 32] - 2.0) < 1e-2
    m = load_mat(str(tmp_path / "mask.bin"))
    assert m[24, 32] == 255


def test_run_vio_synthetic(tmp_path, capsys):
    from visma_tpu.cli.run_vio import main

    main(["--synthetic", "24", "--output", str(tmp_path / "est")])
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[0])
    assert rec["frames"] == 24
    assert rec["ate_rmse_m"] < 0.05
    assert os.path.exists(tmp_path / "est" / "dataset")


def test_run_semantic_synthetic(tmp_path, capsys):
    """The papers' main loop as a tool: demo scene -> retrieval ->
    CEM refinement -> reference-compatible result.json."""
    from visma_tpu.cli.run_semantic import main

    out = tmp_path / "result.json"
    main(["--synthetic", "4", "--output", str(out), "--cem-iters", "3",
          "--cem-samples", "32"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert rec["tracks"] == 1
    assert rec["model"] == "lchair"       # retrieved, bbox had no shape_id
    assert rec["pos_err_m"] < 0.15
    data = json.loads(out.read_text())
    assert len(data) == 4                 # one packet per frame
    obj = data[-1][0]
    from visma_tpu.io.json_io import matrix_from_json

    assert matrix_from_json(obj, "model_pose", 3, 4).shape == (3, 4)


def test_run_semantic_dataroot(tmp_path, capsys):
    """Real-sequence mode over a written synthetic sequence directory with
    a CAD database on disk (shape_id path)."""
    from visma_tpu.cli.run_semantic import _demo_meshes, main
    from visma_tpu.io.synthetic import SyntheticConfig, write_sequence

    root = tmp_path / "seq"
    write_sequence(str(root), SyntheticConfig(num_frames=3, rows=120,
                                              cols=160))
    models = tmp_path / "models"
    models.mkdir()
    # the synthetic bboxes carry shape_id "chair_0001" — provide that mesh
    V, F = _demo_meshes()["lchair"]
    with open(models / "chair_0001.obj", "w") as fp:
        for v in V:
            fp.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in F:
            fp.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")

    out = tmp_path / "result.json"
    main(["--dataroot", str(root), "--models", str(models),
          "--output", str(out), "--cem-iters", "2", "--cem-samples", "24",
          "--max-frames", "2"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert rec["frames"] == 2
    assert os.path.exists(out)


def test_run_vio_no_imu(capsys):
    """Vision-only fallback from the CLI: sim-aligned ATE stays bounded."""
    from visma_tpu.cli.run_vio import main

    main(["--synthetic", "24", "--no-imu"])
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[0])
    assert rec["frames"] == 24
    assert rec["ate_sim_aligned_m"] < 0.1


def test_show_2dmap(tmp_path):
    from visma_tpu.cli.show_2dmap import main
    from visma_tpu.io import save_mat

    save_mat(str(tmp_path / "m.bin"),
             np.random.default_rng(0).random((8, 10)).astype(np.float32))
    main([str(tmp_path / "m.bin"), "--output", str(tmp_path / "m.png")])
    assert os.path.exists(tmp_path / "m.png")


def test_prepare_sfmlearner(seq, tmp_path):
    from visma_tpu.cli.prepare_sfmlearner import main

    out = str(tmp_path / "sfm")
    main([seq, out])
    files = os.listdir(out)
    assert any(f.endswith(".jpg") for f in files)
    assert any(f.endswith(".pkl") for f in files)


def test_visualize(seq, tmp_path):
    from visma_tpu.cli.visualize import main

    main([seq, "--output", str(tmp_path / "scene.png")])
    assert os.path.exists(tmp_path / "scene.png")


def test_visualize_animate(seq, tmp_path):
    """--animate exports per-frame overlay renders through the repo's own
    rasterizer (the headless replacement for VisualizeResult's live
    window, visualization.cpp:226-313): object edges at per-frame camera
    poses + feature dots, one PNG per frame."""
    import cv2
    import numpy as np

    from visma_tpu.cli.visualize import main
    from tests.test_eval import cube_mesh

    # CAD database: one cube written as OBJ
    cad = tmp_path / "cad"
    cad.mkdir()
    V, F = cube_mesh(0.6)
    with open(cad / "cube.obj", "w") as fp:
        for v in V:
            fp.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in F:
            fp.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")

    # result.json: the cube 2.5 m ahead of the first camera
    from visma_tpu.io import VlslamDatasetLoader

    loader = VlslamDatasetLoader(seq)
    G = np.eye(4)
    G[:3, :4] = loader.pose(0)
    T_wm = G @ np.array([[1.0, 0, 0, 0], [0, 1, 0, 0],
                         [0, 0, 1, 2.5], [0, 0, 0, 1]])
    packet = [{"id": 0, "model_name": "cube", "status": 2,
               "model_pose": [float(x) for x in T_wm[:3, :4].ravel()]}]
    (pathlib.Path(seq) / "result.json").write_text(json.dumps([packet]))

    out = tmp_path / "anim"
    main([seq, "--cad-root", str(cad), "--output",
          str(tmp_path / "scene.png"), "--animate", str(out),
          "--max-frames", "3"])
    pngs = sorted(out.glob("overlay_*.png"))
    assert len(pngs) == 3
    img = cv2.imread(str(pngs[0]))
    assert img is not None and img.shape[2] == 3
    # the object's rendered edges must have painted colored pixels
    # (overlay color differs across channels; the gray base image doesn't)
    colored = (np.abs(img.astype(int)[:, :, 2] - img.astype(int)[:, :, 0])
               > 40).sum()
    assert colored > 50, colored


def test_load_mesh_database(tmp_path):
    from visma_tpu.io.loader import load_mesh_database

    (tmp_path / "chairs.json").write_text(
        json.dumps({"entries": ["a", "b", "c"]}))
    assert load_mesh_database(str(tmp_path), "chairs.json") == ["a", "b", "c"]
