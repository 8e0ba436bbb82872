"""Class-frequency time series from probability CSV trees
(reference ``sykepic/analyze/frequency.py``).

Known reference bug intentionally NOT replicated: the reference's
``start``/``end`` filter crashes at HEAD (``frequency.py:109`` compares
the sample's timezone-AWARE datetime against naive ``strptime`` values
-> TypeError). We compare in naive local terms (``filter_csv_by_date``
strips tzinfo), matching the docstring'd intent; the crash and our fix
are pinned in ``tests/test_oracle_postprocess.py::test_frequency_matches``.
"""

from __future__ import annotations

import datetime
from pathlib import Path

import pandas as pd

from ..compute.prediction import prediction_dataframe
from ..utils.timefmt import sample_to_datetime


def frequency_df(
    pred_dir,
    thresholds=0.0,
    start=None,
    end=None,
    hour_window=None,
    date_format="%Y-%m-%d %H:%M",
):
    """Frequency of each predicted class per sample timestamp
    (reference ``frequency.py:10-65``): rows are sample datetimes, columns
    class names, cells classification counts (NaN when absent)."""
    csv_date_list = filter_csv_by_date(pred_dir, start, end, hour_window, date_format)
    if not csv_date_list:
        print("[INFO] No sample predictions match this time restraint.")
        return None
    print(f"[INFO] Using predictions from {len(csv_date_list)} samples")
    df = csv_to_df(csv_date_list, thresholds)
    df = df[df["classified"]].drop("classified", axis=1)
    return group_predictions(df)


def filter_df(freq_df, prediction=None, top=None):
    """Column filter: explicit classes and/or the ``top`` most frequent
    (reference ``frequency.py:68-89``)."""
    if prediction:
        freq_df = freq_df.loc[:, prediction]
    if top:
        freq_df = freq_df[freq_df.sum().nlargest(top).index]
    return freq_df


def filter_csv_by_date(
    pred_dir, start=None, end=None, hour_window=None, date_format="%Y-%m-%d %H:%M"
):
    """(csv, datetime) pairs within the date range / hour-of-day window
    (reference ``frequency.py:93-115``)."""
    pred_dir = Path(pred_dir)
    if not pred_dir.is_dir():
        raise FileNotFoundError(f"'{pred_dir}' is not a directory")
    start = datetime.datetime.strptime(start, date_format) if start else None
    end = datetime.datetime.strptime(end, date_format) if end else None
    if hour_window:
        time_format = "%H:%M"
        hour_start, hour_end = hour_window.split("-")
        hour_start = datetime.datetime.strptime(hour_start.strip(), time_format)
        hour_end = datetime.datetime.strptime(hour_end.strip(), time_format)
    csv_date_list = []
    for csv in sorted(pred_dir.glob("**/*.csv")):
        date = sample_to_datetime(csv.with_suffix("").name)
        # reference compares naive datetimes; ours are UTC-aware
        naive = date.replace(tzinfo=None)
        if (start and naive < start) or (end and naive > end):
            continue
        if hour_window and not (hour_start.time() <= naive.time() <= hour_end.time()):
            continue
        csv_date_list.append((csv, date))
    return csv_date_list


def csv_to_df(csv_date_list, thresholds):
    """Concat per-sample prediction frames with a timestamp column
    (reference ``frequency.py:118-136``)."""
    df_list = []
    for csv, date in csv_date_list:
        sample_df = prediction_dataframe(csv, thresholds)
        sample_df = sample_df.drop(sample_df.columns[2:], axis=1)
        sample_df.insert(0, "timestamp", date)
        df_list.append(sample_df)
    df = pd.concat(df_list)
    df["prediction"] = df["prediction"].astype("category")
    return df


def group_predictions(df):
    """timestamp x prediction counts (reference ``frequency.py:138-142``)."""
    df = df.groupby("timestamp", observed=False).prediction.value_counts().unstack()
    df.columns.name = ""
    df.index.name = ""
    return df
