"""Tests for the analyze layer: evaluation (threshold logic + grid search),
frequency time series and plots."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from sykepic_tpu.analyze import evaluation, frequency, plot

PROB = Path("tests/data/prob/D20180712T065600_IFCB114.prob.csv")
SAMPLE = "D20180712T065600_IFCB114"


@pytest.fixture
def eval_tree(tmp_path):
    """Evaluation file naming the fixture's true classes + a prediction
    tree with the fixture prob CSV."""
    pred_dir = tmp_path / "preds" / "2018" / "07" / "12"
    pred_dir.mkdir(parents=True)
    (pred_dir / PROB.name).write_text(PROB.read_text())
    # fixture ROIs: 2 -> Uroglenopsis_sp, 3 -> Licmophora_sp (argmax classes)
    eval_file = tmp_path / f"{SAMPLE}.select.csv"
    eval_file.write_text("2,Uroglenopsis_sp\n3,unclassifiable\n")
    return tmp_path


def test_parse_evaluations_fixed_thresholds(eval_tree):
    # ROI 2 (conf 0.46 >= 0.3) predicted+labeled Uroglenopsis -> tp;
    # ROI 3 labeled empty, conf 0.23 >= 0.2 -> fp for Licmophora
    df = evaluation.parse_evaluations(
        [eval_tree / f"{SAMPLE}.select.csv"],
        eval_tree / "preds",
        thresholds={"Uroglenopsis_sp": 0.3, "Licmophora_sp": 0.2,
                    "unclassifiable": 0.0},
    )
    assert df.loc["Uroglenopsis_sp", "tp"] == 1
    assert df.loc["Licmophora_sp", "fp"] == 1
    assert df.loc["Uroglenopsis_sp", "precision"] == 1.0
    assert set(["threshold", "precision", "recall", "F1", "support",
                "specificity"]) <= set(df.columns)

    # With a 0.5 Licmophora threshold ROI 3 falls to the empty class:
    # empty==empty counts as its tp (reported as tn) and the combined
    # 'all' row appears (reference evaluation.py:139-151)
    df = evaluation.parse_evaluations(
        [eval_tree / f"{SAMPLE}.select.csv"],
        eval_tree / "preds",
        thresholds={"Uroglenopsis_sp": 0.3, "Licmophora_sp": 0.5,
                    "unclassifiable": 0.0},
    )
    assert "all" in df.index
    assert df.index[0] == "all"
    assert df.loc["all", "tn"] == 1
    assert df.loc["all", "tp"] == 1
    assert df.loc["all", "specificity"] == 1.0


def test_threshold_search_and_best(eval_tree):
    df = evaluation.parse_evaluations(
        [eval_tree / f"{SAMPLE}.select.csv"],
        eval_tree / "preds",
        threshold_search=True,
        search_precision=0.1,
    )
    assert "specificity" not in df.columns
    # multi-index (class, threshold)
    assert df.index.nlevels == 2
    uro = df.loc["Uroglenopsis_sp"]
    # ROI 2's Uroglenopsis confidence is ~0.9x: tp until conf, fn after
    assert uro.iloc[0]["tp"] == 1
    assert uro.iloc[-1]["tp"] == 0 and uro.iloc[-1]["fn"] == 1
    best = evaluation.best_thresholds(df)
    assert best.loc[("Uroglenopsis_sp",), :]["F1"].iloc[0] == 1.0


def test_classification_result_cases():
    cr = evaluation.classification_result
    assert cr("A", "A", "empty") == (("A", "tp"),)
    assert cr("A", "empty", "empty") == (("A", "fp"),)
    assert cr("empty", "A", "empty") == (("A", "fn"),)
    assert cr("A", "B", "empty") == (("A", "fp"), ("B", "fn"))


def test_classification_scores():
    p, r, f1, support, spec = evaluation.classification_scores(8, 0, 2, 2)
    assert p == pytest.approx(0.8)
    assert r == pytest.approx(0.8)
    assert f1 == pytest.approx(0.8)
    assert support == 12
    assert np.isnan(spec)


def test_frequency_df(tmp_path):
    pred_dir = tmp_path / "2018" / "07" / "12"
    pred_dir.mkdir(parents=True)
    (pred_dir / PROB.name).write_text(PROB.read_text())
    df = frequency.frequency_df(tmp_path, thresholds=0.0)
    assert len(df) == 1  # one sample timestamp
    row = df.iloc[0]
    assert row.sum() == 2
    assert row["Uroglenopsis_sp"] == 1
    # date filters
    assert frequency.frequency_df(tmp_path, start="2019-01-01 00:00") is None
    assert len(frequency.filter_csv_by_date(tmp_path, hour_window="06:00-07:00")) == 1
    assert len(frequency.filter_csv_by_date(tmp_path, hour_window="10:00-11:00")) == 0


def test_filter_df():
    df = pd.DataFrame({"A": [5, 5], "B": [1, 1], "C": [3, 3]})
    top2 = frequency.filter_df(df, top=2)
    assert list(top2.columns) == ["A", "C"]
    only_b = frequency.filter_df(df, prediction=["B"])
    assert list(only_b.columns) == ["B"]


def test_plot_stats_and_distribution(tmp_path):
    plot.plot_stats([0.5, 0.8], [1.0, 0.4], [0.4, 0.7], [1.1, 0.5],
                    outfile=tmp_path / "stats.png")
    assert (tmp_path / "stats.png").is_file()

    class FakeData:
        distribution = {"A": [10, 6, 4], "B": [4, 2, 2]}

    plot.dataset_distribution(FakeData(), save=tmp_path / "dist.png")
    assert (tmp_path / "dist.png").is_file()


def test_view_batch(tmp_path):
    imgs = np.random.default_rng(0).uniform(0, 1, (4, 8, 8, 1))
    out = plot.view_batch(imgs, h=2, w=2, save=tmp_path / "collage.png")
    assert out.is_file()


def test_class_plot(tmp_path):
    csv = tmp_path / "classes.csv"
    csv.write_text(
        "Time,Aphanizomenon flosaquae,Total\n"
        "2018-07-12T06:56:00+00:00,1.5,2.0\n"
        "2018-07-13T06:56:00+00:00,2.5,3.0\n"
    )
    out = plot.class_plot(csv, ["Aphanizomenon flosaquae"])
    assert out.is_file()


def test_frequency_tolerates_zero_roi_samples(tmp_path):
    """A header-only prob CSV (an IFCB sample with zero ROIs) must not
    crash the frequency pipeline: prediction_dataframe skips inserting
    the verdict columns on an empty frame (regression: explicit column
    selection raised KeyError)."""
    from sykepic_tpu.analyze import frequency

    d = tmp_path / "2018/07/12"
    d.mkdir(parents=True)
    (d / "D20180712T065600_IFCB114.prob.csv").write_text(
        "roi,A,B\n1,0.9,0.1\n2,0.2,0.8\n"
    )
    (d / "D20180712T070000_IFCB114.prob.csv").write_text("roi,A,B\n")
    df = frequency.frequency_df(tmp_path, thresholds=0.0)
    assert df.shape == (1, 2) and int(df.sum().sum()) == 2
    # every sample empty: a well-formed empty result, not a crash
    empty_root = tmp_path / "empty"
    d2 = empty_root / "2018/07/12"
    d2.mkdir(parents=True)
    (d2 / "D20180712T070000_IFCB114.prob.csv").write_text("roi,A,B\n")
    df2 = frequency.frequency_df(empty_root, thresholds=0.0)
    assert df2 is not None and len(df2) == 0
