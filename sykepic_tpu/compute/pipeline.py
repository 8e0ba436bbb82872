"""Fused classify+features: one pass over raw IFCB data produces BOTH
``.prob.csv`` and ``.feat.csv`` per sample (BASELINE.json config #5).

The reference runs ``sykepic prob`` and ``sykepic feat`` as separate batch
jobs, decoding every sample twice and (for prob) writing PNGs to disk in
between. Here each sample is decoded once; its ROIs stream through the TPU
classification engine while geometry features for the same ROIs are computed
concurrently on host CPU threads — the TPU and the host work on the same
decode simultaneously, so the fused pass costs barely more wall-clock than
classification alone.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from ..ingest import ifcb
from ..utils import files, logger
from . import feature_native, probability
from .engine import Classifier

log = logger.get_logger("pipeline")


def call(args):
    """CLI adapter for the ``pipeline`` sub-command."""
    if args.raw:
        sample_paths = files.list_sample_paths(args.raw)
    else:
        sample_paths = [Path(p) for p in args.samples]
    filtered = []
    for sample_path in sample_paths:
        if sample_path.with_suffix(".roi").stat().st_size <= probability.MAX_ROI_BYTES:
            filtered.append(sample_path)
        else:
            log.warning(f"{sample_path.name} is over 1G, skipping")
    clf = probability.prepare_model(args.model, batch_size=args.batch_size)
    return main(
        filtered,
        clf,
        args.out,
        feat_out_dir=args.feat_out or args.out,
        force=args.force,
        feature_threads=args.num_workers,
        device_features=getattr(args, "device_features", False),
    )


def main(
    sample_paths,
    clf: Classifier,
    prob_out_dir,
    feat_out_dir=None,
    force: bool = False,
    feature_threads: int = 8,
    device_features: bool = False,
):
    """Single pass: decode once -> TPU classify + features.

    ``device_features=False`` (default): geometry features run on host CPU
    threads concurrently with TPU classification, producing the host
    reference values (``# version=tpu-v1``).
    ``device_features=True``: features compute ON DEVICE in the same batch
    stream as classification (``sykepic_tpu.ops.features_device``) — the
    sample -> probabilities + features pass never leaves the chip. Values
    carry ``# version=tpu-dev-v1`` (chamfer-EDT biovolume, whole-mask axes;
    see the module docstring for the documented deviations).

    Returns the set of sample names fully processed.
    """
    if device_features:
        return _main_device_features(
            sample_paths, clf, prob_out_dir, feat_out_dir or prob_out_dir,
            force,
        )
    feat_out_dir = feat_out_dir or prob_out_dir
    decoded = []
    prob_csvs = {}
    feat_jobs = []
    for idx, sample_path in enumerate(Path(p) for p in sample_paths):
        prob_csv = files.sample_csv_path(sample_path, prob_out_dir,
                                         probability.FILE_SUFFIX)
        feat_csv = files.sample_csv_path(sample_path, feat_out_dir,
                                         feature_native.FILE_SUFFIX)
        if prob_csv.is_file() and feat_csv.is_file() and not force:
            log.warning(f"{sample_path.name} outputs exist, skipping")
            continue
        try:
            rois = ifcb.read_sample(sample_path)
            volume_ml = ifcb.sample_volume(sample_path.with_suffix(".hdr"))
        except ValueError:
            log.exception(f"Faulty raw data for {sample_path.name}")
            continue
        except Exception as e:
            log.exception(f"Unexpected error for {sample_path.name}:", e)
            continue
        decoded.append((idx, sample_path, rois, volume_ml))
        prob_csvs[idx] = prob_csv
        feat_jobs.append((idx, sample_path, rois, volume_ml, feat_csv))

    results: dict[int, list] = {idx: [] for idx, *_ in decoded}

    def feature_worker(job):
        idx, sample_path, rois, volume_ml, feat_csv = job
        roi_features = []
        for roi_id, img in rois.images():
            from .features import compute_features

            _, feats = compute_features(img)
            feats = dict(feats)
            biovol_px = feats["Biovolume"]
            biovol_um3 = feature_native.pixels_to_um3(biovol_px)
            from .units import biovolume_to_biomass

            roi_features.append(
                (
                    roi_id,
                    biovol_px,
                    biovol_um3,
                    biovolume_to_biomass(biovol_um3, volume_ml),
                    feats["Area"],
                    feats["MajorAxisLength"],
                    feats["MinorAxisLength"],
                )
            )
        feature_native.features_to_csv(volume_ml, roi_features, feat_csv)
        return sample_path.name

    def roi_stream():
        for idx, _, rois, _ in decoded:
            for rid, img in rois.images():
                yield idx, rid, img

    # TPU classification streams in the foreground; features ride the pool
    with ThreadPoolExecutor(max_workers=max(feature_threads, 1)) as pool:
        feat_futures = [pool.submit(feature_worker, job) for job in feat_jobs]
        for idx, rid, probs in clf.classify_rois(roi_stream()):
            results[idx].append((rid, probs))
        feat_done = {f.result() for f in feat_futures}

    names = {idx: sample_path.name for idx, sample_path, _, _ in decoded}
    written = set()
    for idx, rows in results.items():
        probability.probabilities_to_csv(sorted(rows), clf.classes,
                                         prob_csvs[idx])
        written.add(names[idx])
    if feat_done != written:
        log.warning(f"feature/probability sample mismatch: {feat_done ^ written}")
    return written


def _main_device_features(sample_paths, clf, prob_out_dir, feat_out_dir,
                          force):
    """Fused on-chip pass: one ROI stream, two device programs per batch."""
    decoded = []
    prob_csvs = {}
    feat_csvs = {}
    volumes = {}
    for idx, sample_path in enumerate(Path(p) for p in sample_paths):
        prob_csv = files.sample_csv_path(sample_path, prob_out_dir,
                                         probability.FILE_SUFFIX)
        feat_csv = files.sample_csv_path(sample_path, feat_out_dir,
                                         feature_native.FILE_SUFFIX)
        if prob_csv.is_file() and feat_csv.is_file() and not force:
            log.warning(f"{sample_path.name} outputs exist, skipping")
            continue
        try:
            rois = ifcb.read_sample(sample_path)
            volumes[idx] = ifcb.sample_volume(sample_path.with_suffix(".hdr"))
        except ValueError:
            log.exception(f"Faulty raw data for {sample_path.name}")
            continue
        except Exception as e:
            log.exception(f"Unexpected error for {sample_path.name}:", e)
            continue
        decoded.append((idx, sample_path, rois))
        prob_csvs[idx] = prob_csv
        feat_csvs[idx] = feat_csv

    prob_rows: dict[int, list] = {idx: [] for idx, *_ in decoded}
    feat_rows: dict[int, list] = {idx: [] for idx, *_ in decoded}

    def roi_stream():
        for idx, _, rois in decoded:
            for rid, img in rois.images():
                yield idx, rid, img

    from .units import biovolume_to_biomass

    for idx, rid, probs, feats in clf.classify_and_feature_rois(roi_stream()):
        prob_rows[idx].append((rid, probs))
        area, biovol_px, major, minor = feats
        biovol_um3 = feature_native.pixels_to_um3(biovol_px)
        feat_rows[idx].append(
            (
                rid, biovol_px, biovol_um3,
                biovolume_to_biomass(biovol_um3, volumes[idx]),
                int(area), major, minor,
            )
        )

    written = set()
    for idx, sample_path, _ in decoded:
        probability.probabilities_to_csv(
            sorted(prob_rows[idx]), clf.classes, prob_csvs[idx]
        )
        csv_path = Path(feat_csvs[idx])
        csv_path.parent.mkdir(parents=True, exist_ok=True)
        lines = [
            "# version=tpu-dev-v1",
            f"# volume_ml={volumes[idx]}",
            feature_native.CSV_COLUMNS,
        ]
        lines.extend(
            ",".join(map(str, row)) for row in sorted(feat_rows[idx])
        )
        csv_path.write_text("\n".join(lines) + "\n")
        written.add(sample_path.name)
    return written
