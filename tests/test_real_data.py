"""Opt-in validation on REAL VISMA sequences (VERDICT r3 item 9).

The container ships no dataset (zero egress), so these tests SKIP unless
`VISMA_DATA_ROOT` points at a directory of downloaded VISMA sequences
(the layout README.md:99-123 of the reference describes — e.g.
$VISMA_DATA_ROOT/clutter1/{dataset,*.png,*.edge,*.bbox}). Optionally set
`VISMA_MODEL_ROOT` to a directory of CAD .obj/.ply meshes to also run the
semantic mapper. With data present, the ENTIRE BASELINE config list runs
from this one environment variable:

    VISMA_DATA_ROOT=/data/visma python -m pytest tests/test_real_data.py -v

Covers: example_load parity (config 1), the image-frontend VIO in
vision-only mode (configs 2+3; the distribution ships no raw IMU,
SURVEY §0), and — with models — the semantic mapper producing a
reference-consumable result.json (config 4 input).
"""
import json
import os

import numpy as np
import pytest

DATA_ROOT = os.environ.get("VISMA_DATA_ROOT")
MODEL_ROOT = os.environ.get("VISMA_MODEL_ROOT")

pytestmark = pytest.mark.skipif(
    not DATA_ROOT, reason="VISMA_DATA_ROOT not set (real data is opt-in)")


def _sequences():
    if not DATA_ROOT:
        return []
    out = []
    for name in sorted(os.listdir(DATA_ROOT)):
        seq = os.path.join(DATA_ROOT, name)
        if os.path.isfile(os.path.join(seq, "dataset")):
            out.append(seq)
    # the dataroot may itself be a single sequence
    if not out and os.path.isfile(os.path.join(DATA_ROOT, "dataset")):
        out = [DATA_ROOT]
    return out


def _first_sequence():
    seqs = _sequences()
    if not seqs:
        pytest.skip(f"no sequence with a 'dataset' file under {DATA_ROOT}")
    return seqs[0]


def test_example_load_parity():
    """Reference Grab semantics on a real sequence (dataloader.cpp:92-133):
    poses finite, Rg from wg, edge maps decodable, per-frame side files
    aligned by timestamp."""
    from visma_tpu.io import VlslamDatasetLoader

    seq = _first_sequence()
    loader = VlslamDatasetLoader(seq)
    assert len(loader) > 10, f"suspiciously short sequence: {len(loader)}"
    for i in (0, len(loader) // 2, len(loader) - 1):
        fr = loader.grab(i, load_image=bool(loader.png_files))
        gwc = fr.gwc
        assert gwc.shape == (3, 4) and np.isfinite(gwc).all()
        # rotation part is orthonormal to float tolerance
        RtR = gwc[:, :3].T @ gwc[:, :3]
        assert np.abs(RtR - np.eye(3)).max() < 1e-3
        Rg = loader.gravity_rotation(i)
        assert np.abs(Rg @ Rg.T - np.eye(3)).max() < 1e-5
        if loader.edge_files:
            assert fr.edgemap is not None and fr.edgemap.ndim == 2
        if loader.png_files:
            assert fr.image is not None and fr.image.shape[0] > 100
    # features carry the Corvis lifecycle; the point-cloud filter returns
    # world points for INSTATE|GOODDROP (dataloader.cpp:136-164)
    statuses = {f.status for pk in loader.dataset.packets[:50]
                for f in pk.features}
    assert statuses, "no features in the first 50 packets"
    cloud = loader.grab_pointcloud(min(30, len(loader) - 1))
    for xyz_bgr in cloud.values():
        assert np.isfinite(xyz_bgr[:3]).all()


def test_run_vio_images_no_imu(tmp_path):
    """The image-frontend pipeline runs on the sequence's real PNGs in
    vision-only mode and stays finite; ATE vs the dataset's Corvis poses
    is reported (BASELINE: <= 1.05x reference ATE — the reference poses
    ARE the reference here, so we gate on sim-aligned sanity, not on
    beating them frame-for-frame)."""
    from visma_tpu.cli.run_vio import main
    from visma_tpu.io import VlslamDatasetLoader

    seq = _first_sequence()
    if not VlslamDatasetLoader(seq).png_files:
        pytest.skip("sequence has no PNG frames")
    out = tmp_path / "est"
    import io as _io
    from contextlib import redirect_stdout

    buf = _io.StringIO()
    with redirect_stdout(buf):
        main(["--dataroot", seq, "--no-imu", "--images",
              "--output", str(out)])
    report = json.loads(buf.getvalue().splitlines()[0])
    assert report["frames"] > 10
    assert np.isfinite(report["ate_sim_aligned_m"])
    # a working monocular pipeline on indoor sequences lands decimeters
    # from the Corvis trajectory after similarity alignment
    assert report["ate_sim_aligned_m"] < 1.0, report
    assert (out / "dataset").is_file()


def test_semantic_mapper_real(tmp_path):
    """Semantic mapping over a real sequence's edge maps + bboxes with a
    CAD database -> reference-consumable result.json
    (evaluation.cpp:163-198 layout)."""
    if not MODEL_ROOT:
        pytest.skip("VISMA_MODEL_ROOT not set")
    from visma_tpu.cli.run_semantic import main

    seq = _first_sequence()
    out = tmp_path / "result.json"
    main(["--dataroot", seq, "--models", MODEL_ROOT,
          "--output", str(out), "--max-frames", "60",
          "--roi", "256", "256"])
    packets = json.loads(out.read_text())
    assert isinstance(packets, list) and packets
    last = packets[-1]
    for obj in last:
        assert set(obj) >= {"id", "model_name", "status", "model_pose"}
        assert len(obj["model_pose"]) == 12
        assert np.isfinite(np.asarray(obj["model_pose"])).all()
