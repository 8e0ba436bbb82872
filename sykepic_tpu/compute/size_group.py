"""Size-group binning of a feature column (reference
``sykepic/compute/size_group.py``).

Contract: a ``name lower_bound`` groups file; each ROI's ``size_column``
value picks the group with the largest ``lower_bound <= size`` (values below
every bound land in the smallest group, reference ``:144-149``); the
``value_column`` (or a count of 1 for ``abundance``) accumulates into that
group. Output columns smallest-group first, plus ``total`` and optional
``volume_ml``; index is ISO time (reference ``:55-57,93-102``).

What changed (performance): the reference parses every CSV line in a Python
loop (``:105-149``). Here each feature CSV is read once with pandas and
binned with ``np.searchsorted`` + ``np.bincount`` — identical results,
vectorized.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from tqdm import tqdm

from ..ingest.ifcb import filter_out_quality_flagged_samples
from ..utils.timefmt import sample_to_datetime
from .classification import read_volume_ml
from .units import pixels_to_um3


def call(args):
    """CLI adapter (reference ``size_group.py:10-37``)."""
    all_feats = sorted(Path(args.features).glob("**/*.csv"))
    if args.exclusion_list:
        feats = filter_out_quality_flagged_samples(all_feats, Path(args.exclusion_list))
    else:
        feats = all_feats

    out_file = Path(args.out)
    if out_file.suffix != ".csv":
        raise ValueError("Make sure output file ends with .csv")
    if out_file.is_file():
        if not (args.append or args.force):
            raise FileExistsError(f"{out_file} exists, --append or --force not used")
    value_column = args.value_column if args.value_column else args.size_column
    main(
        feats=feats,
        groups_file=args.groups,
        size_column=args.size_column,
        value_column=value_column,
        out_csv=args.out,
        append=args.append,
        verbose=not args.quiet,
        px_to_um3=args.pixels_to_um3,
        volume_info=args.volume,
        sample_as_time=True,
    )


def main(
    feats,
    groups_file,
    size_column,
    value_column,
    out_csv,
    append,
    verbose=False,
    px_to_um3=False,
    volume_info=False,
    sample_as_time=True,
):
    groups = read_size_groups(groups_file)
    df = size_df(
        feats, groups, size_column, value_column, verbose, px_to_um3, volume_info
    )
    if sample_as_time:
        df.index = df.index.map(lambda x: sample_to_datetime(x, isoformat=True))
        df.index.name = "time"
    df_to_csv(df, out_csv, append)


def read_size_groups(path):
    """``name lower_bound`` lines, sorted descending by bound
    (reference ``:61-66``)."""
    with open(path) as fh:
        lines = (line.strip().split() for line in fh.readlines())
        groups = {name: float(size) for name, size in lines if name}
    return sorted(groups.items(), key=lambda x: x[1], reverse=True)


def size_df(
    feats,
    groups,
    size_column,
    value_column,
    verbose=False,
    px_to_um3=False,
    volume_info=False,
):
    rows = []
    volumes = []
    if verbose:
        feats = tqdm(feats, desc=f"Processing {len(feats)} samples")
    for csv in feats:
        sample = Path(csv).with_suffix("").stem
        if sample.endswith("_biovol"):
            sample = sample.split("_")[0]
        result_dict, volume_ml = process_sample(
            csv, groups, size_column, value_column, px_to_um3
        )
        result_dict["sample"] = sample
        rows.append(result_dict)
        if volume_info:
            volumes.append(volume_ml)
    df = pd.DataFrame(rows)
    df.set_index("sample", inplace=True)
    # Reverse column order so the smallest group is first (reference :93-96)
    df = df.iloc[:, ::-1]
    df["total"] = df.sum(axis=1)
    if volume_info:
        df["volume_ml"] = volumes
    df.sort_index(inplace=True)
    return df


def process_sample(csv, groups, size_column, value_column, px_to_um3=False):
    """Vectorized binning of one feature CSV (reference ``:105-149``)."""
    volume_ml = read_volume_ml(csv)
    df = pd.read_csv(csv, comment="#")
    if size_column not in df.columns:
        raise ValueError(f"Column '{size_column}' not found in header")
    if value_column == "abundance":
        values = np.ones(len(df))
    else:
        if value_column not in df.columns:
            raise ValueError(f"Column '{value_column}' not found in header")
        values = df[value_column].to_numpy(dtype=float)
    sizes = df[size_column].to_numpy(dtype=float)
    if px_to_um3:
        sizes = pixels_to_um3(sizes)

    # groups are descending; bin against ascending bounds. searchsorted
    # index 0 = below every bound, which also belongs to the smallest group
    # (reference get_group fallback, :144-149)
    names = [name for name, _ in groups]           # biggest..smallest
    bounds = np.array([b for _, b in groups])[::-1]  # ascending
    bin_idx = np.searchsorted(bounds, sizes, side="right")  # 0..n
    bin_idx = np.maximum(bin_idx - 1, 0)  # 0 = smallest group
    sums = np.bincount(bin_idx, weights=values, minlength=len(names))
    # sums[i] is for ascending group i -> map back to descending name order
    result_dict = {name: sums[len(names) - 1 - i] for i, name in enumerate(names)}
    return result_dict, volume_ml


def get_group(size, groups):
    """Single-value API kept for parity (reference ``:144-149``)."""
    for name, lower_bound in groups:
        if size >= lower_bound:
            return name
    return groups[-1][0]


def df_to_csv(df, out_file, append=False):
    append = append and Path(out_file).is_file()
    mode = "a" if append else "w"
    df.to_csv(out_file, mode=mode, header=not append, na_rep=0.0)
