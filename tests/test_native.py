"""Native C++ decoder tests: builds the .so, cross-checks against the
Python codec, and measures the speedup on a large sequence."""
import time

import numpy as np
import pytest

from visma_tpu.io.loader import VlslamDatasetLoader
from visma_tpu.io.native_loader import (available, load_edgemap_native,
                                        packed_packets_native)
from visma_tpu.io.synthetic import SyntheticConfig, make_dataset
from visma_tpu.proto import EdgeMap


pytestmark = pytest.mark.skipif(not available(),
                                reason="native decoder not built")


def test_dataset_matches_python_codec(tmp_path):
    cfg = SyntheticConfig(num_frames=20, num_landmarks=80, seed=9)
    ds = make_dataset(cfg)
    data = ds.encode()

    native = packed_packets_native(data, max_features=128)

    (tmp_path / "dataset").write_bytes(data)
    loader = VlslamDatasetLoader(str(tmp_path))
    py = loader.packed_packets(max_features=128)

    np.testing.assert_allclose(native["ts"], py["ts"])
    np.testing.assert_allclose(native["gwc"], py["gwc"], atol=1e-6)
    np.testing.assert_allclose(native["wg"], py["wg"], atol=1e-6)
    np.testing.assert_array_equal(native["feat_id"], py["feat_id"])
    np.testing.assert_array_equal(native["feat_status"], py["feat_status"])
    np.testing.assert_allclose(native["feat_xp"], py["feat_xp"], atol=1e-5)
    np.testing.assert_allclose(native["feat_xw"], py["feat_xw"], atol=1e-5)


def test_edgemap_native():
    em = EdgeMap(rows=48, cols=64,
                 data=np.linspace(0, 1, 48 * 64).astype(np.float32))
    out = load_edgemap_native(em.encode())
    np.testing.assert_allclose(out, em.as_image(), atol=1e-7)


def test_native_is_faster():
    cfg = SyntheticConfig(num_frames=120, num_landmarks=200, seed=10)
    ds = make_dataset(cfg)
    data = ds.encode()

    t = time.perf_counter()
    packed_packets_native(data, max_features=256)
    t_native = time.perf_counter() - t

    from visma_tpu.proto import Dataset

    t = time.perf_counter()
    Dataset.decode(data)
    t_python = time.perf_counter() - t

    print(f"native {t_native*1e3:.1f} ms vs python {t_python*1e3:.1f} ms")
    assert t_native < t_python, (t_native, t_python)


def test_malformed_buffer_rejected():
    with pytest.raises(ValueError):
        packed_packets_native(b"\x1a\xffgarbage_that_is_not_proto")
