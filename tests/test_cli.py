"""CLI argument-surface tests: every sub-command drives end-to-end through
``sykepic_tpu.__main__.main(argv)`` exactly as a shell invocation would."""

import shutil
from pathlib import Path

import pytest

from sykepic_tpu.__main__ import main

PROBS = "tests/data/prob"
FEATS = "tests/data/feat"
RAW = "tests/data/raw/valid"
T2021 = "tests/model/thresholds-2021.txt"
ZERO = "tests/model/thresholds-zero.txt"
GROUPS = "tests/model/size-groups.txt"


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from sykepic_tpu.models import checkpoint
    from sykepic_tpu.models.registry import init_variables
    from sykepic_tpu.train import config as tcfg

    src = Path("tests/model/resnet18_ref")
    d = tmp_path_factory.mktemp("model") / "resnet18_tpu"
    d.mkdir()
    shutil.copy(src / "config.ini", d / "config.ini")
    shutil.copy(src / "class_names.txt", d / "class_names.txt")
    config = tcfg.read_config(d / "config.ini")
    model, _ = tcfg.get_network(config, 50)
    shape = tcfg.get_img_shape(config)
    checkpoint.save_variables(
        d / "best_state.msgpack",
        init_variables(model, (shape[1], shape[2], shape[0]), seed=0),
    )
    return d


def test_prob_cli(tmp_path, model_dir):
    main(["prob", "-r", RAW, "-m", str(model_dir), "-o", str(tmp_path), "-b", "4"])
    assert len(list(tmp_path.glob("**/*.prob.csv"))) == 1


def test_feat_cli(tmp_path):
    main(["feat", "-r", RAW, "-o", str(tmp_path)])
    assert len(list(tmp_path.glob("**/*.feat.csv"))) == 1


def test_pipeline_cli(tmp_path, model_dir):
    main(["pipeline", "-r", RAW, "-m", str(model_dir), "-o", str(tmp_path),
          "-b", "4"])
    assert len(list(tmp_path.glob("**/*.prob.csv"))) == 1
    assert len(list(tmp_path.glob("**/*.feat.csv"))) == 1


def test_class_cli(tmp_path):
    out = tmp_path / "classes.csv"
    main(["class", PROBS, "--feat", FEATS, "-t", T2021, "-o", str(out)])
    assert out.is_file()


def test_size_cli(tmp_path):
    out = tmp_path / "sizes.csv"
    main(["size", FEATS, "-g", GROUPS, "-s", "biovolume_um3", "-o", str(out),
          "-q"])
    assert out.is_file()


def test_abundance_cli(tmp_path):
    out = tmp_path / "abundance.csv"
    main(["abundance", PROBS, "--feat", FEATS, "-t", ZERO, "-o", str(out)])
    assert out.is_file()


def test_class_stats_cli(tmp_path):
    out = tmp_path / "stats.csv"
    main(["class_stats", PROBS, "--feat", FEATS, "-t", ZERO, "-o", str(out),
          "--classes", "Licmophora_sp,Uroglenopsis_sp"])
    assert out.is_file()


def test_features_per_prediction_cli(tmp_path):
    out = tmp_path / "fpp.csv"
    main(["features_per_prediction", PROBS, "--feat", FEATS, "-t", ZERO,
          "-o", str(out)])
    assert (tmp_path / "fpp1.csv").is_file()


def test_missing_subcommand_errors():
    with pytest.raises(SystemExit):
        main([])
    with pytest.raises(SystemExit):
        main(["nonsense"])


def test_evaluate_cli(tmp_path):
    sample = "D20180712T065600_IFCB114"
    select = tmp_path / f"{sample}.select.csv"
    select.write_text("2,Uroglenopsis_sp\n3,unclassifiable\n")
    out = tmp_path / "scores.csv"
    best = tmp_path / "thresholds.txt"
    main(["evaluate", str(select), PROBS, "--search", "-p", "0.1",
          "-o", str(out), "--best-out", str(best)])
    assert out.is_file()
    import pandas as pd

    df = pd.read_csv(out)
    assert {"tp", "fp", "fn", "precision", "recall", "F1"} <= set(df.columns)
    # the thresholds file round-trips through the standard parser
    from sykepic_tpu.compute.prediction import threshold_dictionary

    thr = threshold_dictionary(best)
    assert thr and all(0.0 <= v <= 1.0 for v in thr.values())

    # fixed-threshold scoring mode
    out2 = tmp_path / "scores_fixed.csv"
    main(["evaluate", str(select), PROBS, "-t", ZERO, "-o", str(out2)])
    assert out2.is_file()


def test_frequency_cli(tmp_path):
    out = tmp_path / "freq.csv"
    main(["frequency", PROBS, "-t", ZERO, "-o", str(out)])
    assert out.is_file()
    import pandas as pd

    df = pd.read_csv(out, index_col=0)
    assert len(df) == 1  # one fixture sample timestamp
    assert df.sum().sum() == 2  # two classified ROIs

    # classes filter + top
    out2 = tmp_path / "freq_top.csv"
    main(["frequency", PROBS, "-o", str(out2), "--top", "1"])
    df2 = pd.read_csv(out2, index_col=0)
    assert df2.shape[1] == 1

    # empty date range exits nonzero
    import pytest

    with pytest.raises(SystemExit):
        main(["frequency", PROBS, "-o", str(tmp_path / "x.csv"),
              "--start", "2030-01-01 00:00"])
