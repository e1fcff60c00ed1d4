"""Manifest schema round-trip + size-validation tests (SURVEY Phase 0)."""

import numpy as np
import pytest

from dlq_tpu.manifest import Manifest, QuantMeta


def test_roundtrip(tmp_path):
    m = Manifest(str(tmp_path / "export"), model="resnet18",
                 meta={"preprocess": {"size": 224, "mean": [0.485, 0.456, 0.406]}})
    w = np.arange(3 * 3 * 4 * 8, dtype=np.float32).reshape(3, 3, 4, 8)
    m.add("stem.conv", w, layout="HWIO", kind="conv_weight")
    b = np.arange(8, dtype=np.float32)
    m.add("stem.bias", b, layout="O", kind="bias")
    m.save()

    m2 = Manifest.load(str(tmp_path / "export"))
    assert m2.model == "resnet18"
    assert m2.meta["preprocess"]["size"] == 224
    assert set(m2.names()) == {"stem.conv", "stem.bias"}
    np.testing.assert_array_equal(m2.read("stem.conv"), w)
    np.testing.assert_array_equal(m2.read("stem.bias"), b)
    tm = m2.tensors["stem.conv"]
    assert tm.layout == "HWIO" and tm.kind == "conv_weight" and tm.dtype == "float32"


def test_quant_block_roundtrip(tmp_path):
    m = Manifest(str(tmp_path / "q"), model="mlp")
    q = np.random.default_rng(0).integers(-127, 128, (256, 10)).astype(np.int8)
    s = np.random.default_rng(1).random((10,)).astype(np.float32)
    m.add("fc.w", q, layout="IO", kind="dense_weight",
          quant=QuantMeta(scheme="symmetric", axis=1, scale="fc.w.scale"))
    m.add("fc.w.scale", s, kind="scale")
    m.save()

    m2 = Manifest.load(str(tmp_path / "q"))
    tm = m2.tensors["fc.w"]
    assert tm.quant is not None and tm.quant.axis == 1 and tm.quant.scale == "fc.w.scale"
    np.testing.assert_array_equal(m2.read("fc.w"), q)
    np.testing.assert_array_equal(m2.read("fc.w.scale"), s)


def test_int4_packed_storage(tmp_path):
    m = Manifest(str(tmp_path / "i4"))
    packed = np.random.default_rng(0).integers(0, 256, (64, 10)).astype(np.uint8)
    m.add("w4", packed, dtype="int4", logical_shape=(128, 10), kind="dense_weight")
    m.save()
    m2 = Manifest.load(str(tmp_path / "i4"))
    assert m2.tensors["w4"].shape == (128, 10)
    assert m2.read("w4").shape == (64, 10)


def test_size_validation(tmp_path):
    m = Manifest(str(tmp_path / "bad"))
    m.add("t", np.zeros((4, 4), np.float32))
    m.save()
    # corrupt: truncate the file
    with open(tmp_path / "bad" / "t.bin", "wb") as f:
        f.write(b"\0" * 8)
    m2 = Manifest.load(str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="expected"):
        m2.read("t")
