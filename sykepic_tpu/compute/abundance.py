"""Count classified ROIs per class per sample (reference
``sykepic/compute/abundance.py``).

The Total column is the number of ROIs in the sample (classified or not).
The reference accumulates totals in a module-level global list appended per
sample (``abundance.py:86,105,121-124``), which silently misaligns when a
sample yields an empty frame; here the total is carried per sample.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
from tqdm import tqdm

from ..ingest.ifcb import filter_out_quality_flagged_samples
from ..utils import logger
from ..utils.timefmt import sample_to_datetime
from .classification import join_sample, match_prob_feat
from .prediction import threshold_dictionary

log = logger.get_logger("abundance")


def main(args):
    """CLI adapter (reference ``abundance.py:12-38``)."""
    all_probs = sorted(Path(args.probabilities).glob("**/*.csv"))
    if args.exclusion_list:
        probs = filter_out_quality_flagged_samples(all_probs, Path(args.exclusion_list))
    else:
        probs = all_probs

    out_file = Path(args.out)
    if out_file.suffix != ".csv":
        raise ValueError("Make sure output file ends with .csv")
    if out_file.is_file():
        if not (args.append or args.force):
            raise FileExistsError(f"{args.out} exists, --append or --force not used")
    if not args.feat:
        raise ValueError("abundance requires --feat")
    feats = sorted(Path(args.feat).glob("**/*.csv"))
    df = class_df(
        probs,
        feats,
        thresholds_file=args.thresholds,
        summary_feature=args.value_column,
        progress_bar=True,
    )
    df = swell_df(df)
    df_to_csv(df, out_file, args.append)


def class_df(
    probs,
    feats,
    thresholds_file,
    summary_feature="biomass_ugl",
    progress_bar=False,
):
    """Per-sample counts of classified ROIs per class (reference ``:40-89``)."""
    thresholds = threshold_dictionary(thresholds_file)
    df_rows = []
    totals = []
    iterator = match_prob_feat(probs, feats)
    if progress_bar:
        iterator = tqdm(iterator, desc=f"Processing {len(feats)} samples")

    for prob_csv, feat_csv in iterator:
        if prob_csv.with_suffix("").stem != feat_csv.with_suffix("").stem:
            raise ValueError(f"CSV mismatch: {prob_csv.name} & {feat_csv.name}")
        sample = prob_csv.with_suffix("").stem
        try:
            sample_df, total = process_sample(prob_csv, feat_csv, thresholds)
        except KeyError:
            log.exception(prob_csv.with_suffix("").stem)
            continue
        sample_column = sample_df[summary_feature]
        sample_column.name = sample
        df_rows.append(sample_column)
        totals.append(total)

    classes = sorted(thresholds.keys())
    classes.append("Total")
    df = pd.DataFrame(df_rows, columns=classes)
    df["Total"] = totals
    df.index.name = "sample"
    df.fillna(0, inplace=True)
    return df


def swell_df(df):
    """ISO timestamps, underscores to spaces (reference ``:91-97``)."""
    df = df.copy()
    df.index = df.index.map(lambda x: sample_to_datetime(x, isoformat=True))
    df.index.name = "Time"
    df.columns = df.columns.str.replace("_", " ")
    return df


def df_to_csv(df, out_file, append=False):
    df = df.astype(int)
    append = append and Path(out_file).is_file()
    mode = "a" if append else "w"
    df.to_csv(out_file, mode=mode, header=not append)


def process_sample(prob_csv, feat_csv, thresholds):
    """Counts per predicted class; returns ``(counts_df, total_rois)``
    (reference ``:106-131``)."""
    df = join_sample(prob_csv, feat_csv, thresholds)
    total = len(df.index)
    df = df[df["classified"]]
    abundances = df.groupby("prediction", observed=False).count()
    abundances.index.name = "class"
    return abundances, total
