"""Tests for abundance / class_stats / features_per_prediction over the
golden prob+feat fixtures (reference has no tests for these modules; the
assertions here are derived from the fixture data by hand)."""

from collections import namedtuple

from pytest import approx

from sykepic_tpu.compute import abundance, class_stats, features_per_prediction

PROBS = "tests/data/prob/"
FEATS = "tests/data/feat/"
ZERO = "tests/model/thresholds-zero.txt"
T2021 = "tests/model/thresholds-2021.txt"

AbundanceArgs = namedtuple(
    "AbundanceArgs",
    "probabilities feat thresholds out value_column append force exclusion_list",
)
StatsArgs = namedtuple(
    "StatsArgs", "probabilities feat thresholds out classes append force"
)
FppArgs = namedtuple("FppArgs", "probabilities feat thresholds out append force")


def test_abundance(tmp_path):
    out_file = tmp_path / "out.csv"
    abundance.main(
        AbundanceArgs(PROBS, FEATS, ZERO, out_file, "biomass_ugl", False, False, None)
    )
    with open(out_file) as fh:
        lines = fh.readlines()
    assert len(lines) == 2
    header = lines[0].strip().split(",")
    assert header[0] == "Time"
    assert header[-1] == "Total"
    assert len(header) == 52  # Time + 50 classes + Total
    row = lines[1].strip().split(",")
    # Both fixture ROIs are classified under zero thresholds
    assert row[-1] == "2"
    counts = {name: int(v) for name, v in zip(header[1:], row[1:])}
    assert sum(v for k, v in counts.items() if k != "Total") == 2


def test_class_stats(tmp_path):
    out_file = tmp_path / "out.csv"
    class_stats.main(StatsArgs(PROBS, FEATS, ZERO, out_file, None, False, False))
    import pandas as pd

    df = pd.read_csv(out_file, index_col=0)
    assert "sample" in df.columns
    # 4 features x 4 stats + sample column
    assert len(df.columns) == 17
    assert len(df) == 2  # two classified ROIs in two distinct classes
    assert df["biovolume_um3_mean"].sum() == approx(33.716 + 1722.738, rel=1e-3)
    # min == max == mean for single-ROI classes
    assert (df["area_min"] == df["area_max"]).all()


def test_class_stats_class_filter(tmp_path):
    out_file = tmp_path / "out.csv"
    class_stats.main(
        StatsArgs(PROBS, FEATS, ZERO, out_file, ["Dinophyceae"], False, False)
    )
    import pandas as pd

    df = pd.read_csv(out_file, index_col=0)
    assert set(df.index) <= {"Dinophyceae"}


def test_features_per_prediction(tmp_path):
    out_file = tmp_path / "out.csv"
    features_per_prediction.main(
        FppArgs(PROBS, FEATS, ZERO, out_file, False, False)
    )
    # Single month of data -> one numbered chunk
    chunk = tmp_path / "out1.csv"
    assert chunk.is_file()
    import pandas as pd

    df = pd.read_csv(chunk, index_col=0)
    # Fixture ROIs are not filamentous cyanobacteria -> header-only output
    assert set(df.columns) == {
        "sample",
        "prediction",
        "biovolume_um3",
        "biomass_ugl",
        "area",
        "major_axis_length",
        "minor_axis_length",
    }
    assert (df["prediction"].isin(features_per_prediction.FILAMENT_LABELS)).all()
