"""Unit tests for the thresholded prediction core (reference semantics:
``sykepic/compute/prediction.py:49-71``)."""

import numpy as np
import pandas as pd
import pytest

from sykepic_tpu.compute import prediction

PROB_CSV = "tests/data/prob/D20180712T065600_IFCB114.prob.csv"
THRESHOLDS = "tests/model/thresholds-2021.txt"


def test_threshold_dictionary():
    d = prediction.threshold_dictionary(THRESHOLDS)
    assert len(d) == 50
    assert d["Beads"] == pytest.approx(0.90)
    assert d["Chaetoceros_sp_single"] == pytest.approx(0.11)


def test_threshold_dictionary_default(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("A 0.5\nB\n")
    with pytest.raises(ValueError):
        prediction.threshold_dictionary(p)
    d = prediction.threshold_dictionary(p, default=0.25)
    assert d == {"A": 0.5, "B": 0.25}


def test_scalar_threshold_strict_greater():
    df = pd.DataFrame({"a": [0.5, 0.2], "b": [0.5, 0.8]})
    # Scalar: argmax with strict > (reference :57-59); ties -> first column
    out = prediction.prediction_dataframe(df.copy(), thresholds=0.5)
    assert list(out["prediction"]) == ["a", "b"]
    assert list(out["classified"]) == [False, True]


def test_dict_threshold_highest_qualifying():
    # 'b' has the max but fails its threshold; 'a' qualifies and wins
    df = pd.DataFrame({"a": [0.4], "b": [0.6], "c": [0.0]})
    out = prediction.prediction_dataframe(
        df.copy(), thresholds={"a": 0.3, "b": 0.7, "c": 0.0}
    )
    assert out["prediction"].iloc[0] == "a"
    assert bool(out["classified"].iloc[0]) is True


def test_dict_threshold_fallback_argmax_unclassified():
    df = pd.DataFrame({"a": [0.4], "b": [0.6]})
    out = prediction.prediction_dataframe(df.copy(), thresholds={"a": 0.5, "b": 0.7})
    assert out["prediction"].iloc[0] == "b"
    assert bool(out["classified"].iloc[0]) is False


def test_dict_threshold_inclusive():
    # Dict thresholds use >= (reference :66)
    df = pd.DataFrame({"a": [0.5]})
    out = prediction.prediction_dataframe(df.copy(), thresholds={"a": 0.5})
    assert bool(out["classified"].iloc[0]) is True


def test_class_absent_from_thresholds_never_classified():
    df = pd.DataFrame({"a": [0.9], "b": [0.1]})
    out = prediction.prediction_dataframe(df.copy(), thresholds={"b": 0.05})
    assert out["prediction"].iloc[0] == "b"
    assert bool(out["classified"].iloc[0]) is True


def test_prediction_dataframe_csv_and_multiindex():
    out = prediction.prediction_dataframe(PROB_CSV, THRESHOLDS)
    assert out.index.name == "roi"
    assert list(out.columns[:2]) == ["prediction", "classified"]
    assert out["prediction"].dtype == "category"
    multi = prediction.prediction_dataframe([PROB_CSV, PROB_CSV], THRESHOLDS)
    assert multi.index.names == ["sample", "roi"]
    assert len(multi) == 2 * len(out)


def test_row_prediction_matches_vectorized():
    rng = np.random.default_rng(0)
    classes = [f"c{i}" for i in range(8)]
    probs = rng.dirichlet(np.ones(8), size=64)
    thr = {c: float(t) for c, t in zip(classes, rng.uniform(0, 0.5, 8))}
    df = pd.DataFrame(probs, columns=classes)
    pred_idx, classified = prediction.predict(probs, classes, thr)
    for i in range(len(df)):
        name, ok = prediction.row_prediction(df.iloc[i], thr)
        assert name == classes[pred_idx[i]]
        assert ok == bool(classified[i])
