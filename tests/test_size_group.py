"""Golden parity tests for size-group binning, mirroring reference
``tests/test_size_group.py``."""

from collections import namedtuple

from pytest import approx

from sykepic_tpu.compute import size_group

Args = namedtuple(
    "Args",
    (
        "features groups size_column value_column out "
        "append force pixels_to_um3 volume quiet exclusion_list"
    ),
)


def test_main(tmp_path):
    out_file = tmp_path / "out.csv"
    arguments = Args(
        features="tests/data/feat/",
        groups="tests/model/size-groups.txt",
        size_column="biovolume_um3",
        value_column="biomass_ugl",
        out=out_file,
        append=False,
        force=False,
        pixels_to_um3=False,
        volume=True,
        quiet=True,
        exclusion_list=None,
    )
    size_group.call(arguments)
    assert out_file.is_file()
    with open(out_file) as fh:
        lines = fh.readlines()
    assert len(lines) == 2
    header = lines[0].split(",")
    assert len(header) == 5
    assert header[0] == "time"
    assert header[1] == "small"
    assert header[2] == "large"
    assert header[3] == "total"
    assert header[-1].strip() == "volume_ml"
    first_result = list(filter(None, lines[1].split(",")))
    assert len(first_result) == len(header)
    assert float(first_result[1]) == approx(0.0342, rel=1e-3)
    assert float(first_result[2]) == approx(1.748, rel=1e-3)
    assert float(first_result[3]) == approx(1.748 + 0.034, rel=1e-3)
    assert float(first_result[4]) == approx(0.985, rel=1e-3)


def test_main_no_value_column(tmp_path):
    out_file = tmp_path / "out.csv"
    arguments = Args(
        features="tests/data/feat/",
        groups="tests/model/size-groups.txt",
        size_column="biovolume_um3",
        value_column=None,
        out=out_file,
        append=False,
        force=False,
        pixels_to_um3=False,
        volume=False,
        quiet=True,
        exclusion_list=None,
    )
    size_group.call(arguments)
    with open(out_file) as fh:
        lines = fh.readlines()
    assert len(lines) == 2
    header = lines[0].split(",")
    assert len(header) == 4
    assert header[:3] == ["time", "small", "large"]
    assert header[-1].strip() == "total"
    first_result = list(filter(None, lines[1].split(",")))
    assert float(first_result[1]) == approx(33.716, rel=1e-3)
    assert float(first_result[2]) == approx(1722.738, rel=1e-3)
    assert float(first_result[3]) == approx(1722.738 + 33.716, rel=1e-3)


def test_abundance_value_column(tmp_path):
    out_file = tmp_path / "out.csv"
    arguments = Args(
        features="tests/data/feat/",
        groups="tests/model/size-groups.txt",
        size_column="biovolume_um3",
        value_column="abundance",
        out=out_file,
        append=False,
        force=False,
        pixels_to_um3=False,
        volume=False,
        quiet=True,
        exclusion_list=None,
    )
    size_group.call(arguments)
    with open(out_file) as fh:
        lines = fh.readlines()
    first_result = lines[1].strip().split(",")
    # One ROI in each group, two total
    assert first_result[1:] == ["1.0", "1.0", "2.0"]


def test_get_group():
    groups = size_group.read_size_groups("tests/model/size-groups.txt")
    assert groups == [("large", 1500.0), ("small", 0.0)]
    assert size_group.get_group(2000.0, groups) == "large"
    assert size_group.get_group(10.0, groups) == "small"
    assert size_group.get_group(-1.0, groups) == "small"
