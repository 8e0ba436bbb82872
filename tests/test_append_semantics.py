"""Output-file semantics shared by the post-processing CLIs:
exists -> error without --append/--force; --append concatenates without a
second header (reference ``classification.py:29-34,158-161``)."""

from collections import namedtuple

import pytest

from sykepic_tpu.compute import classification

Args = namedtuple(
    "Args",
    "probabilities feat thresholds divisions out value_column append force "
    "exclusion_list",
)


def make_args(out, append=False, force=False):
    return Args(
        probabilities="tests/data/prob/",
        feat="tests/data/feat/",
        thresholds="tests/model/thresholds-2021.txt",
        divisions=None,
        out=out,
        value_column="biomass_ugl",
        append=append,
        force=force,
        exclusion_list=None,
    )


def test_exists_requires_append_or_force(tmp_path):
    out = tmp_path / "out.csv"
    classification.main(make_args(out))
    with pytest.raises(FileExistsError):
        classification.main(make_args(out))


def test_append_adds_rows_without_header(tmp_path):
    out = tmp_path / "out.csv"
    classification.main(make_args(out))
    first = out.read_text().splitlines()
    classification.main(make_args(out, append=True))
    both = out.read_text().splitlines()
    assert len(both) == 2 * len(first) - 1  # one header only
    assert both[0].startswith("Time,")
    assert both[1] == both[2]


def test_force_overwrites(tmp_path):
    out = tmp_path / "out.csv"
    classification.main(make_args(out))
    first = out.read_text()
    classification.main(make_args(out, force=True))
    assert out.read_text() == first


def test_requires_csv_suffix(tmp_path):
    with pytest.raises(ValueError):
        classification.main(make_args(tmp_path / "out.txt"))
