"""Threshold evaluation and per-class threshold search
(reference ``sykepic/analyze/evaluation.py``).

Semantics preserved exactly:

- evaluation files are ``<sample>.select.csv`` with ``roi,actual`` rows
  (``evaluation.py:73-95``),
- classification result logic: tp on match (tn == tp for the ``empty``
  class), fp to the predicted class when actual is ``empty``, fn to the
  actual class when prediction is ``empty``, and BOTH fp+fn on a wrong real
  class (``:168-184``); support intentionally double-counts those rows
  (``:187-208`` comment),
- threshold grid search over ``arange(0, 1+p, p)`` with confidence-vs-
  threshold masking (``:53-61,109-120``), ``best_thresholds`` picks the
  criteria-maximizing row per class (``:215-220``),
- non-search mode adds the combined ``all`` row and a ``threshold`` column;
  search mode drops ``specificity``.

What changed (performance): the reference loops rows x thresholds in
Python. Here each row contributes step functions of the threshold, so the
grid search accumulates range-sums per class in O(rows + classes x grid).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from ..compute.prediction import prediction_dataframe, threshold_dictionary


def parse_evaluations(
    evaluations,
    pred_dir,
    thresholds=None,
    threshold_search=False,
    search_precision=0.01,
    empty="unclassifiable",
    ignore=None,
):
    """Evaluation files + prediction CSVs -> per-class score frame
    (reference ``evaluation.py:9-70``)."""
    eval_df, samples = read_evaluations(evaluations)
    predictions = []
    for sample in samples:
        try:
            predictions.append(next(Path(pred_dir).rglob(f"{sample}.prob.csv")))
        except StopIteration:
            print(f"[ERROR] Cannot find prediction files for {sample}")
            raise
    if threshold_search:
        thresholds = 0.0
    elif not thresholds:
        raise ValueError("Thresholds not provided")
    if isinstance(thresholds, (str, Path)):
        thresholds = threshold_dictionary(thresholds)
    pred_df = prediction_dataframe(predictions, thresholds)
    search_range = np.arange(0, 1 + search_precision, search_precision)
    if not isinstance(ignore, list):
        ignore = [ignore]
    result_df = results_as_df(
        eval_df, pred_df, thresholds, threshold_search, search_range, empty, ignore
    )
    if threshold_search:
        result_df.drop("specificity", axis=1, inplace=True)
    return result_df


def read_evaluations(evaluations):
    """``*.select.csv`` files -> (multi-indexed frame, sample names)
    (reference ``:73-95``)."""
    if isinstance(evaluations, (str, Path)):
        evaluations = Path(evaluations)
        if evaluations.is_dir():
            evaluations = list(evaluations.rglob("*.select.csv"))
        else:
            evaluations = [evaluations]
    if not evaluations:
        raise FileNotFoundError("[ERROR] No evaluation files found")
    df_list = []
    samples = []
    for file in evaluations:
        sample = Path(file).with_suffix("").with_suffix("").name
        samples.append(sample)
        df = pd.read_csv(file, header=None, names=["roi", "actual"])
        df.insert(0, "sample", sample)
        df.set_index(["sample", "roi"], inplace=True)
        df_list.append(df)
    return pd.concat(df_list), samples


def results_as_df(
    eval_df, pred_df, thres_dict, threshold_search, search_range, empty, ignore
):
    """tp/tn/fp/fn (+scores) per class (and per threshold in search mode)."""
    rows = eval_df.join(pred_df, how="inner")
    preds = rows["prediction"].astype(str).to_numpy()
    actual = rows["actual"].astype(str).to_numpy()
    # per-row confidence = probability of the predicted class: one take
    # along the class axis instead of O(rows) pandas .iloc lookups
    col_index = {c: i for i, c in enumerate(rows.columns)}
    pred_cols = np.array([col_index[p] for p in preds], dtype=np.int64)
    conf = rows.to_numpy()[np.arange(len(rows)), pred_cols].astype(np.float64)
    keep = ~(np.isin(preds, [i for i in ignore if i is not None])
             | np.isin(actual, [i for i in ignore if i is not None]))
    preds, actual, conf = preds[keep], actual[keep], conf[keep]

    if threshold_search:
        grid = np.asarray(search_range)
    else:
        grid = None

    counts: dict[tuple, dict] = {}

    def bump(name, thres, key):
        c = counts.setdefault((name, thres), {"tp": 0, "tn": 0, "fp": 0, "fn": 0})
        c[key] += 1

    if grid is None:
        # single threshold per class: prediction already thresholded
        # upstream. A plain-argmax fallback prediction can name a class
        # absent from the thresholds file; treat it as threshold 0 instead
        # of crashing (the reference raises KeyError here).
        for p, a, cf in zip(preds, actual, conf):
            t = thres_dict.get(p, 0.0) if isinstance(thres_dict, dict) else thres_dict
            pred_eff = p if cf >= t else empty
            for name, result in classification_result(pred_eff, a, empty):
                bump(name, t, result)
        result_df = pd.DataFrame.from_dict(
            {k: v for k, v in counts.items()}, orient="index"
        ).sort_index()
        result_df = result_df.groupby(level=0).sum()
        if empty in result_df.index:
            tn = result_df.loc[empty, "tp"].sum()
            result_df.drop(index=empty, inplace=True)
            result_df.loc["all"] = [
                result_df.tp.sum(), tn, result_df.fp.sum(), result_df.fn.sum(),
            ]
            result_df = pd.concat(
                [result_df.loc[["all"], :], result_df.drop("all")]
            )
        result_df.insert(
            0,
            "threshold",
            result_df.apply(
                lambda row: thres_dict.get(row.name, np.nan)
                if isinstance(thres_dict, dict)
                else thres_dict,
                axis=1,
            ),
        )
    else:
        # vectorized grid search: each row's contribution is a step function
        # of the threshold with the switch at its confidence
        classes = sorted(set(preds) | set(actual))
        t_count = len(grid)
        idx = {c: i for i, c in enumerate(classes)}
        tp = np.zeros((len(classes), t_count), np.int64)
        fp = np.zeros_like(tp)
        fn = np.zeros_like(tp)
        for p, a, cf in zip(preds, actual, conf):
            k = int(np.searchsorted(grid, cf, side="right"))  # grid[:k] <= cf
            if p == a:
                tp[idx[p], :k] += 1
                fn[idx[a], k:] += 1
            elif a == empty:
                fp[idx[p], :k] += 1
                tp[idx[a], k:] += 1  # empty==empty counts as its tp/tn
            else:
                fp[idx[p], :k] += 1
                fn[idx[a], :] += 1
        data = {}
        for c in classes:
            for j, t in enumerate(grid):
                data[(c, float(t))] = {
                    "tp": int(tp[idx[c], j]),
                    "tn": 0,
                    "fp": int(fp[idx[c], j]),
                    "fn": int(fn[idx[c], j]),
                }
        result_df = pd.DataFrame.from_dict(data, orient="index").sort_index()
        if empty in {c for c, _ in result_df.index}:
            result_df.drop(index=empty, level=0, inplace=True)

    score_df = result_df.apply(
        lambda row: classification_scores(row.tp, row.tn, row.fp, row.fn),
        axis=1,
        result_type="expand",
    )
    score_df.columns = ("precision", "recall", "F1", "support", "specificity")
    score_df["support"] = score_df["support"].astype(int)
    return pd.concat((result_df, score_df), axis=1)


def classification_result(predicted, actual, empty):
    """(class, tp/fp/fn) contributions of one ROI (reference ``:168-184``)."""
    if predicted == actual:
        return ((predicted, "tp"),)
    elif actual == empty:
        return ((predicted, "fp"),)
    elif predicted == empty:
        return ((actual, "fn"),)
    return ((predicted, "fp"), (actual, "fn"))


def classification_scores(tp, tn, fp, fn):
    """precision/recall/F1/support/specificity (reference ``:187-208``)."""
    if tp > 0:
        precision = tp / (tp + fp)
        recall = tp / (tp + fn)
        F1 = F_score(precision, recall, beta=1)
    else:
        precision = 0
        recall = 0
        F1 = 0
    support = tp + fp + fn
    if tn:
        specificity = tn / (tn + fp)
        support += tn
    else:
        specificity = np.nan
    return (precision, recall, F1, support, specificity)


def F_score(precision, recall, beta=1):
    return (1 + beta**2) * precision * recall / (beta**2 * precision + recall)


def best_thresholds(result_df, criteria="F1"):
    """Rows maximizing ``criteria`` per class (reference ``:215-220``)."""
    g0 = result_df.groupby(level=0)
    best_idx = g0.apply(lambda name: name[criteria].idxmax())
    return result_df.loc[best_idx]
