"""Per-ROI feature rows for the filamentous cyanobacteria classes, chunked
into one output CSV per calendar month (reference
``sykepic/compute/features_per_prediction.py``).

The month key is ``sample[5:7]`` (reference ``:80``). Output files are
numbered ``<stem>1.csv``, ``<stem>2.csv``, ... — the reference's numbering
mutates the path variable in place so names accumulate digits
(``out1``, ``out12``, ...; reference ``:31-36``); here each chunk gets a
clean single suffix.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
from tqdm import tqdm

from ..utils import logger
from .classification import join_sample, match_prob_feat
from .prediction import threshold_dictionary

log = logger.get_logger("features_per_prediction")

FILAMENT_LABELS = [
    "Dolichospermum-Anabaenopsis",
    "Dolichospermum-Anabaenopsis_coiled",
    "Dolichospermum-Anabaenopsis-coiled",
    "Nodularia_spumigena",
    "Nodularia_spumigena-coiled",
    "Aphanizomenon_flosaquae",
]

FPP_FEATURES = [
    "prediction",
    "biovolume_um3",
    "biomass_ugl",
    "area",
    "major_axis_length",
    "minor_axis_length",
]


def main(args):
    """CLI adapter (reference ``features_per_prediction.py:12-37``)."""
    probs = sorted(Path(args.probabilities).glob("**/*.csv"))
    out_file = Path(args.out)
    if out_file.suffix != ".csv":
        raise ValueError("Make sure output file ends with .csv")
    if out_file.is_file():
        if not (args.append or args.force):
            raise FileExistsError(f"{args.out} exists, --append or --force not used")
    if not args.feat:
        raise ValueError("features_per_prediction requires --feat")
    feats = sorted(Path(args.feat).glob("**/*.csv"))
    df_list = class_df(probs, feats, thresholds_file=args.thresholds, progress_bar=True)

    for identifier, df in enumerate(df_list, start=1):
        chunk_path = out_file.with_name(f"{out_file.stem}{identifier}{out_file.suffix}")
        df_to_csv(df, chunk_path, args.append)


def class_df(probs, feats, thresholds_file, progress_bar=False):
    """List of month-chunk frames in sample order (reference ``:39-105``)."""
    thresholds = threshold_dictionary(thresholds_file)
    iterator = match_prob_feat(probs, feats)
    if progress_bar:
        iterator = tqdm(iterator, desc=f"Processing {len(feats)} samples")

    chunks: list[pd.DataFrame] = []
    chunk_rows: list[pd.DataFrame] = []
    current_month = None
    for prob_csv, feat_csv in iterator:
        if prob_csv.with_suffix("").stem != feat_csv.with_suffix("").stem:
            raise ValueError(f"CSV mismatch: {prob_csv.name} & {feat_csv.name}")
        sample = prob_csv.with_suffix("").stem
        sample_month = sample[5:7]
        try:
            sample_df = process_sample(prob_csv, feat_csv, thresholds, sample)
        except KeyError:
            log.exception(sample)
            continue
        if current_month is None:
            current_month = sample_month
        if sample_month != current_month:
            chunks.append(pd.concat(chunk_rows))
            chunk_rows = []
            current_month = sample_month
        chunk_rows.append(sample_df)
    if chunk_rows:
        chunks.append(pd.concat(chunk_rows))
    return chunks


def df_to_csv(df, out_file, append=False):
    append = append and Path(out_file).is_file()
    mode = "a" if append else "w"
    df.to_csv(out_file, mode=mode, header=not append)


def process_sample(prob_csv, feat_csv, thresholds, sample):
    """Per-ROI rows of the filamentous classes (reference ``:110-132``)."""
    df = join_sample(prob_csv, feat_csv, thresholds)
    df = df[df["classified"]]
    df_stats = df[FPP_FEATURES]
    filaments = df_stats[df_stats["prediction"].isin(FILAMENT_LABELS)].copy()
    filaments.insert(0, "sample", sample)
    return filaments
