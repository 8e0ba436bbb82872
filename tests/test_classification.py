"""Golden parity tests for classification aggregation, mirroring reference
``tests/test_classification.py`` assertions (52-column layout, merged
Dolichospermum pair, Total biomass ~1.782)."""

from collections import namedtuple
from pathlib import Path

from pytest import approx

from sykepic_tpu.compute import classification

Args = namedtuple(
    "Args",
    "probabilities feat thresholds divisions out value_column append force "
    "exclusion_list",
)


def test_main(tmp_path):
    out_file = tmp_path / "out.csv"
    arguments = Args(
        probabilities="tests/data/prob/",
        feat="tests/data/feat/",
        thresholds="tests/model/thresholds-2021.txt",
        divisions=None,
        out=out_file,
        value_column="biomass_ugl",
        append=False,
        force=False,
        exclusion_list=None,
    )
    classification.main(arguments)
    assert out_file.is_file()
    with open(out_file) as fh:
        lines = fh.readlines()
    assert len(lines) == 2
    header = lines[0].split(",")
    # 49 classes remain: Dolichospermum-Anabaenopsis(-coiled) merged into one
    assert len(header) == 52
    assert header[0] == "Time"
    first_result = list(filter(None, lines[1].split(",")))
    assert len(first_result) == len(header)
    assert float(first_result[-1]) == approx(1.782, rel=1e-3)


def test_without_feat(tmp_path):
    out_file = tmp_path / "out.csv"
    arguments = Args(
        probabilities="tests/data/prob/",
        feat=None,
        thresholds="tests/model/thresholds-zero.txt",
        divisions=None,
        out=out_file,
        value_column=None,
        append=False,
        force=False,
        exclusion_list=None,
    )
    classification.main(arguments)
    assert out_file.is_file()
    with open(out_file) as fh:
        lines = fh.readlines()
    assert len(lines) == 2
    header = lines[0].split(",")
    assert len(header) == 52
    assert header[0] == "Time"
    first_result = list(filter(None, lines[1].split(",")))
    assert len(first_result) == len(header)
    assert header[49] == "Uroglenopsis sp"
    assert int(first_result[49]) == 1
    assert int(first_result[-1]) == 2


def test_divisions(tmp_path):
    # Correct binning into under/band/over division columns
    divisions_file = tmp_path / "divisions.txt"
    divisions_file.write_text("Aphanizomenon_flosaquae 5000 9000\n")
    divisions = classification.read_divisions(divisions_file)
    assert divisions == {"Aphanizomenon_flosaquae": [5000, 9000]}
    names = classification.names_of_divisions(divisions)
    assert set(names) == {
        "Aphanizomenon_flosaquae_under_5000",
        "Aphanizomenon_flosaquae_5000_9000",
        "Aphanizomenon_flosaquae_over_9000",
    }
    import numpy as np

    preds = np.array(["Aphanizomenon_flosaquae"] * 4 + ["Beads"], dtype=object)
    values = np.array([100.0, 5000.0, 8000.0, 20000.0, 1.0])
    out = classification.divide_predictions(preds, values, divisions)
    assert list(out) == [
        "Aphanizomenon_flosaquae_under_5000",
        "Aphanizomenon_flosaquae_5000_9000",
        "Aphanizomenon_flosaquae_5000_9000",
        "Aphanizomenon_flosaquae_over_9000",
        "Beads",
    ]


def test_duplicate_sample_stems_keep_one_row_each(tmp_path):
    """Two CSVs with the same sample stem (e.g. a re-run merged under two
    date dirs) must produce two rows, matching the reference's
    one-row-per-CSV behavior."""
    import shutil

    from sykepic_tpu.compute import classification

    probs = sorted(Path("tests/data/prob").glob("**/*.csv"))
    feats = sorted(Path("tests/data/feat").glob("**/*.csv"))
    p2 = tmp_path / "dup.prob.csv"
    f2 = tmp_path / "dup.feat.csv"
    shutil.copy(probs[0], p2)
    shutil.copy(feats[0], f2)
    # same stem listed twice
    df = classification.class_df(
        [probs[0], probs[0]], [feats[0], feats[0]],
        thresholds_file="tests/model/thresholds-2021.txt",
    )
    assert len(df) == 2
    assert (df.iloc[0] == df.iloc[1]).all()
