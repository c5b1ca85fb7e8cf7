"""Wire-compatibility tests for the hand-rolled vlslam codec.

Cross-validates against the google.protobuf runtime: the reference schema
(/root/reference/protocols/vlslam.proto) is compiled with protoc into a
temp dir at test time and used as the oracle in both directions
(our-encode -> protoc-decode, protoc-encode -> our-decode).
"""
import importlib.util
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from visma_tpu.proto import (
    CameraInfo, Feature, FeatureStatus, Packet, Track, Dataset,
    EdgeMap, BoundingBox, BoundingBoxList,
)

REF_PROTO = pathlib.Path("/root/reference/protocols/vlslam.proto")


@pytest.fixture(scope="module")
def pb2(tmp_path_factory):
    if not REF_PROTO.exists():
        pytest.skip("reference proto not available")
    out = tmp_path_factory.mktemp("pb2")
    subprocess.run(
        ["protoc", f"-I{REF_PROTO.parent}", f"--python_out={out}", REF_PROTO.name],
        check=True,
    )
    spec = importlib.util.spec_from_file_location("vlslam_pb2", out / "vlslam_pb2.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["vlslam_pb2"] = mod
    spec.loader.exec_module(mod)
    return mod


def make_dataset() -> Dataset:
    rng = np.random.default_rng(0)
    packets = []
    for i in range(3):
        feats = [
            Feature(
                id=100 * i + j,
                status=FeatureStatus((j % 6) + 1),
                xp=rng.uniform(0, 500, 2),
                xw=rng.normal(size=3),
            )
            for j in range(4)
        ]
        packets.append(
            Packet(ts=1000.0 + i * 0.033, gwc=rng.normal(size=12), features=feats,
                   wg=rng.normal(size=2))
        )
    tracks = [Track(ts=1000.0, tracklets=[Feature(id=7, status=FeatureStatus.KEEP,
                                                  xp=np.array([1.0, 2.0]))])]
    cam = CameraInfo(rows=480, cols=640,
                     parameters=np.array([400.0, 400.0, 320.0, 240.0, 0.9]))
    return Dataset(description="synthetic", camera=cam, packets=packets, tracks=tracks)


class TestRoundTrip:
    def test_dataset_self_roundtrip(self):
        ds = make_dataset()
        ds2 = Dataset.decode(ds.encode())
        assert ds2.description == ds.description
        assert ds2.camera.rows == 480 and ds2.camera.cols == 640
        np.testing.assert_allclose(ds2.camera.parameters, ds.camera.parameters)
        assert len(ds2.packets) == 3
        for p, q in zip(ds.packets, ds2.packets):
            assert p.ts == q.ts
            np.testing.assert_allclose(p.gwc, q.gwc)
            np.testing.assert_allclose(p.wg, q.wg)
            for a, b in zip(p.features, q.features):
                assert a.id == b.id and a.status == b.status
                np.testing.assert_allclose(a.xp, b.xp)
                np.testing.assert_allclose(a.xw, b.xw)

    def test_edgemap_roundtrip(self):
        em = EdgeMap(rows=4, cols=5, data=np.arange(20, dtype=np.float32) / 20)
        em2 = EdgeMap.decode(em.encode())
        np.testing.assert_allclose(em2.as_image(), em.as_image())

    def test_bboxlist_roundtrip(self):
        bl = BoundingBoxList(
            description="dets",
            bounding_boxes=[
                BoundingBox(1.0, 2.0, 30.0, 40.0, scores=np.array([0.9, 0.1], np.float32),
                            class_name="chair", label=3, azimuth=1.5, shape_id="chair_0001",
                            azimuth_prob=np.array([0.2, 0.8], np.float32)),
                BoundingBox(5.0, 6.0, 7.0, 8.0),
            ],
        )
        bl2 = BoundingBoxList.decode(bl.encode())
        assert bl2.description == "dets"
        b = bl2.bounding_boxes[0]
        assert b.class_name == "chair" and b.label == 3 and b.shape_id == "chair_0001"
        np.testing.assert_allclose(b.scores, [0.9, 0.1], atol=1e-6)
        assert bl2.bounding_boxes[1].azimuth is None


class TestCrossProtobuf:
    """Oracle cross-checks against protoc-generated bindings of the
    reference schema (wire compatibility in both directions)."""

    def test_ours_decodable_by_protobuf(self, pb2):
        ds = make_dataset()
        ref = pb2.Dataset()
        ref.ParseFromString(ds.encode())
        assert ref.description == "synthetic"
        assert ref.camera.rows == 480
        assert len(ref.packets) == 3
        p0 = ref.packets[0]
        np.testing.assert_allclose(np.array(p0.gwc), ds.packets[0].gwc)
        assert p0.features[1].status == int(ds.packets[0].features[1].status)
        np.testing.assert_allclose(np.array(p0.features[2].xw), ds.packets[0].features[2].xw)
        np.testing.assert_allclose(np.array(p0.wg), ds.packets[0].wg)

    def test_protobuf_decodable_by_ours(self, pb2):
        ref = pb2.Dataset()
        ref.description = "from-protobuf"
        ref.camera.rows, ref.camera.cols = 600, 960
        ref.camera.parameters.extend([0.56, 0.89, 0.5, 0.5, 0.7])
        for i in range(2):
            p = ref.packets.add()
            p.ts = 5.5 + i
            p.gwc.extend(np.arange(12, dtype=np.float64) + i)
            p.wg.extend([0.01 * i, -0.02])
            f = p.features.add()
            f.id = 42 + i
            f.status = pb2.Feature.INSTATE
            f.xp.extend([10.5, 20.5])
            f.xw.extend([1.0, 2.0, 3.0])
        ds = Dataset.decode(ref.SerializeToString())
        assert ds.description == "from-protobuf"
        assert ds.camera.rows == 600 and ds.camera.cols == 960
        assert len(ds.packets) == 2
        np.testing.assert_allclose(ds.packets[1].gwc, np.arange(12.0) + 1)
        assert ds.packets[0].features[0].status == FeatureStatus.INSTATE
        np.testing.assert_allclose(ds.packets[0].features[0].xw, [1.0, 2.0, 3.0])

    def test_edgemap_cross(self, pb2):
        ref = pb2.EdgeMap()
        ref.rows, ref.cols = 3, 4
        ref.data.extend(np.linspace(0, 1, 12).astype(np.float32))
        em = EdgeMap.decode(ref.SerializeToString())
        assert em.as_image().shape == (3, 4)

        back = pb2.EdgeMap()
        back.ParseFromString(em.encode())
        np.testing.assert_allclose(np.array(back.data), np.array(ref.data))

    def test_bbox_cross(self, pb2):
        ref = pb2.BoundingBoxList()
        bb = ref.bounding_boxes.add()
        bb.top_left_x, bb.top_left_y = 1.0, 2.0
        bb.bottom_right_x, bb.bottom_right_y = 3.0, 4.0
        bb.class_name = "sofa"
        bb.azimuth = 0.7
        ours = BoundingBoxList.decode(ref.SerializeToString())
        assert ours.bounding_boxes[0].class_name == "sofa"
        assert abs(ours.bounding_boxes[0].azimuth - 0.7) < 1e-6

        back = pb2.BoundingBoxList()
        back.ParseFromString(ours.encode())
        assert back.bounding_boxes[0].class_name == "sofa"

    def test_negative_label_cross(self, pb2):
        ref = pb2.BoundingBoxList()
        bb = ref.bounding_boxes.add()
        bb.top_left_x = bb.top_left_y = bb.bottom_right_x = bb.bottom_right_y = 0.0
        bb.label = -5
        ours = BoundingBoxList.decode(ref.SerializeToString())
        assert ours.bounding_boxes[0].label == -5
        back = pb2.BoundingBoxList()
        back.ParseFromString(ours.encode())
        assert back.bounding_boxes[0].label == -5
