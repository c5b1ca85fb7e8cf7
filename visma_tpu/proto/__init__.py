"""vlslam wire-format data model (reference parity: protocols/vlslam.proto).

Hand-rolled protobuf wire codec — no protoc codegen, no generated classes.
Wire compatibility with the reference schema is asserted in
tests/test_proto.py by cross-decoding against the google.protobuf runtime.
"""

from visma_tpu.proto.vlslam import (
    FeatureStatus,
    CameraInfo,
    Feature,
    Packet,
    Track,
    Dataset,
    EdgeMap,
    BoundingBox,
    BoundingBoxList,
)

__all__ = [
    "FeatureStatus", "CameraInfo", "Feature", "Packet", "Track",
    "Dataset", "EdgeMap", "BoundingBox", "BoundingBoxList",
]
