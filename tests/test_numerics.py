import numpy as np
import pytest

from dlq_tpu import numerics


def test_diff_identical():
    x = np.random.default_rng(0).random((100,))
    d = numerics.diff(x, x)
    assert d.max_abs == 0 and d.mean_abs == 0
    assert d.cosine == pytest.approx(1.0)


def test_diff_known():
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([1.0, 2.5, 2.0])
    d = numerics.diff(a, b)
    assert d.max_abs == pytest.approx(1.0)
    assert d.mean_abs == pytest.approx(0.5)


def test_check_gate():
    a = np.zeros(10)
    b = np.zeros(10)
    b[3] = 2e-4
    with pytest.raises(AssertionError, match="FAIL"):
        numerics.check(a, b, atol=1e-4, what="stem")
    numerics.check(a, b, atol=1e-3)


def test_top1_agreement():
    a = np.array([[9, 2, 3], [5, 1, 0], [0, 9, 1]], float)
    b = np.array([[1, 2, 9], [5, 1, 0], [0, 9, 1]], float)
    assert numerics.top1_agreement(a, b) == pytest.approx(2 / 3)
    assert numerics.top1_agreement(a[0], a[0]) == 1.0


def test_topk_agreement():
    a = np.array([[5, 4, 0, 0]], float)
    b = np.array([[0, 9, 0, 0]], float)  # ref argmax=1, in top-2 of a
    assert numerics.topk_agreement(a, b, k=2) == 1.0
    assert numerics.topk_agreement(a, b, k=1) == 0.0


def test_stage_report():
    r = numerics.StageReport()
    r.add("stem", np.zeros(4), np.zeros(4))
    r.add("layer1", np.zeros(4), np.full(4, 1e-3))
    assert r.worst() == "layer1"
    j = r.to_json()
    assert j["layer1"]["max_abs"] == pytest.approx(1e-3)
    assert "stem" in str(r)
