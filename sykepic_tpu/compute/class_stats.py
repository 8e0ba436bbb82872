"""Per-class feature statistics (reference ``sykepic/compute/class_stats.py``).

Joins predictions and features per sample, filters to requested classes and
aggregates mean/median/min/max of biovolume_um3 / area / major and minor
axis lengths per predicted class; the column MultiIndex is flattened with
``_`` (reference ``class_stats.py:79-115``).
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
from tqdm import tqdm

from ..utils import logger
from .classification import join_sample, match_prob_feat
from .prediction import threshold_dictionary

log = logger.get_logger("class_stats")

STAT_FEATURES = ["biovolume_um3", "area", "major_axis_length", "minor_axis_length"]
STATS = ["mean", "median", "min", "max"]


def main(args):
    """CLI adapter (reference ``class_stats.py:10-30``)."""
    probs = sorted(Path(args.probabilities).glob("**/*.csv"))
    classes = args.classes
    out_file = Path(args.out)
    if out_file.suffix != ".csv":
        raise ValueError("Make sure output file ends with .csv")
    if out_file.is_file():
        if not (args.append or args.force):
            raise FileExistsError(f"{args.out} exists, --append or --force not used")
    if not args.feat:
        raise ValueError("class_stats requires --feat")
    feats = sorted(Path(args.feat).glob("**/*.csv"))
    df = class_df(
        probs,
        feats,
        classes,
        thresholds_file=args.thresholds,
        progress_bar=True,
    )
    df_to_csv(df, out_file, args.append)


def class_df(probs, feats, classes, thresholds_file, progress_bar=False):
    """Concatenated per-sample stats frames (reference ``:32-72``)."""
    thresholds = threshold_dictionary(thresholds_file)
    df_rows = []
    iterator = match_prob_feat(probs, feats)
    if progress_bar:
        iterator = tqdm(iterator, desc=f"Processing {len(feats)} samples")

    for prob_csv, feat_csv in iterator:
        if prob_csv.with_suffix("").stem != feat_csv.with_suffix("").stem:
            raise ValueError(f"CSV mismatch: {prob_csv.name} & {feat_csv.name}")
        sample = prob_csv.with_suffix("").stem
        try:
            sample_df = process_sample(prob_csv, feat_csv, thresholds, sample, classes)
        except KeyError:
            log.exception(prob_csv.with_suffix("").stem)
            continue
        df_rows.append(sample_df)

    return pd.concat(df_rows)


def df_to_csv(df, out_file, append=False):
    append = append and Path(out_file).is_file()
    mode = "a" if append else "w"
    df.to_csv(out_file, mode=mode, header=not append)


def process_sample(prob_csv, feat_csv, thresholds, sample, classes):
    """Stats over classified ROIs of one sample (reference ``:79-115``)."""
    df = join_sample(prob_csv, feat_csv, thresholds)
    df = df[df["classified"]]
    df_stats = df[["prediction", "classified"] + STAT_FEATURES]
    if classes:
        df_stats = df_stats[df_stats["prediction"].isin(classes)]
    stats = df_stats.groupby("prediction", observed=False).agg(
        {feature: STATS for feature in STAT_FEATURES}
    )
    stats.columns = stats.columns.map("_".join)
    stats = stats.dropna()
    stats.index.name = "class"
    stats.insert(0, "sample", sample)
    return stats
